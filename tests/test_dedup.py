"""Dedup operators: planted duplicates must be found; survivors are
deterministic (SURVEY.md §7 M6 / BASELINE.json north star)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    normalized_text,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        Row(doc_id=1, text=BASE, lang="en", source="s1"),
        # exact dup modulo case/whitespace of 1
        Row(doc_id=2, text="  The QUICK  brown fox jumps over the lazy dog while the cat watches from the warm windowsill and the birds sing in the garden outside ", lang="en", source="s1"),
        # near dup of 1: one word changed
        Row(doc_id=3, text=BASE.replace("garden", "meadow"), lang="en", source="s1"),
        # unrelated
        Row(doc_id=4, text="completely different content about spark shuffle partitions and adaptive query execution plans running at scale", lang="en", source="s1"),
        # different block
        Row(doc_id=5, text=BASE, lang="de", source="s1"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_keeps_lowest_id(spark, planted_docs):
    out = exact_dedup(planted_docs, F.md5(normalized_text()), "doc_id", ["doc_id"])
    ids = {r["doc_id"] for r in out.collect()}
    # 2 (case/ws duplicate of 1) and 5 (byte-identical text, different lang
    # — exact dedup keys on text alone) are dropped; lowest id survives
    assert ids == {1, 3, 4}


def test_ngram_jaccard_finds_near_dup_within_block(spark, planted_docs):
    pairs = ngram_jaccard_pairs(planted_docs, ["lang", "source"], n=2, threshold=0.5)
    got = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0  # identical after normalize
    assert (1, 3) in got and 0.8 < got[(1, 3)] < 1.0  # one word differs
    # doc 5 is another block (lang=de): never paired with 1 despite same text
    assert not any(5 in p for p in got)
    assert not any(4 in p for p in got)


def test_ngram_jaccard_caps_hot_blocks(spark, planted_docs):
    """A pathological single hot block must not go quadratic unbounded:
    blocks over max_block are excluded (VERDICT r1 #5), small blocks are
    untouched."""
    hot = spark.createDataFrame(
        [Row(doc_id=100 + i, text=BASE, lang="xx", source="hot") for i in range(20)]
    )
    docs = planted_docs.unionByName(hot)
    pairs = ngram_jaccard_pairs(docs, ["lang", "source"], n=2, threshold=0.5, max_block=10)
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs.collect()}
    # 20 identical docs would have yielded 190 pairs; the capped block yields none
    assert not any(a >= 100 for a, _ in got)
    # the small (en, s1) block still produces its pairs
    assert (1, 2) in got and (1, 3) in got
    # and with a cap that accommodates the block, the pairs come back
    uncapped = ngram_jaccard_pairs(docs, ["lang", "source"], n=2, threshold=0.5, max_block=100)
    assert uncapped.filter((F.col("doc_id_a") >= 100)).count() == 190


def test_minhash_candidates_contain_near_dups(spark, planted_docs):
    pairs = minhash_candidate_pairs(planted_docs.select("doc_id", "text"), n=3)
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical signature
    assert (1, 3) in got  # high-jaccard near dup
    assert (1, 5) in got  # minhash is blind to blocks — same text matches
    assert not any(4 in p for p in got)


def test_minhash_verified_pipeline(spark, planted_docs):
    """Candidates from LSH, exact Jaccard verify on candidates only —
    planted near-dups survive with their true similarity, unrelated docs
    never reach the verify stage."""
    from priority_data_pipeline_postgres_db_spark.operators.dedup import minhash_verified_pairs

    out = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in minhash_verified_pairs(
            planted_docs.select("doc_id", "text"), n=3, threshold=0.5
        ).collect()
    }
    assert out[(1, 2)] == 1.0  # identical after normalization
    assert out[(2, 5)] == 1.0 and out[(1, 5)] == 1.0  # same text, no blocking here
    assert 0.8 < out[(1, 3)] < 1.0  # one word changed
    assert not any(4 in p for p in out)  # unrelated doc filtered by LSH


def test_simhash_identical_and_near(spark, planted_docs):
    pairs = simhash_pairs(planted_docs.select("doc_id", "text"), max_hamming=10)
    got = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"] for r in pairs.collect()}
    # identical token sets → identical simhash → hamming 0, guaranteed to
    # band together (the ≤3 capture guarantee covers 0)
    assert got[(1, 2)] == 0
    assert got[(1, 5)] == 0
    assert got[(2, 5)] == 0
    assert (1, 4) not in got
    # (1,3) is one word swapped — CAPTURE is only guaranteed at hamming ≤ 3
    # (4×16-bit banding); if present it must carry the true small distance
    if (1, 3) in got:
        assert 0 < got[(1, 3)] <= 10


def test_embedding_near_dup_quantized_cosine(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.999, 0.04, 0.0, 0.0]),  # ~cos 0.999
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0, 0.0]),  # orthogonal to 1
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows)
    pairs = embedding_near_dup_pairs(emb, threshold=0.95)
    got = {(r["vec_id_a"], r["vec_id_b"]): r["cosine"] for r in pairs.collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] > 0.99


def test_embedding_near_dup_no_driver_collect(spark, monkeypatch):
    """The blocked grid must never collect the corpus to the driver
    (VERDICT r1 #2): poison toPandas/collect and run the operator."""
    from pyspark.sql import DataFrame

    rows = [
        Row(vec_id=i, embedding=[1.0 if j == (i % 3) else 0.02 * i for j in range(4)])
        for i in range(1, 30)
    ]
    emb = spark.createDataFrame(rows)
    expected = embedding_near_dup_pairs(emb, threshold=0.9, n_blocks=4).count()
    assert expected > 0

    def boom(self, *a, **kw):
        raise AssertionError("corpus must not be collected to the driver")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    pairs = embedding_near_dup_pairs(emb, threshold=0.9, n_blocks=4)
    assert pairs.count() == expected
    # pair coverage is independent of the grid granularity
    monkeypatch.undo()
    assert embedding_near_dup_pairs(emb, threshold=0.9, n_blocks=1).count() == expected


def test_incremental_minhash_equals_full_minus_old_old(spark, sf_dir):
    """The incremental candidate set must be EXACTLY the full self-join's
    pairs minus the old×old ones (caps judged over the union)."""
    import pyspark.sql.functions as F
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_candidate_pairs,
    )
    from priority_data_pipeline_postgres_db_spark.plans.tables import load

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in incremental_minhash_pairs(old, new).collect()
    }
    full = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_candidate_pairs(docs).collect()
    }
    want = {p for p in full if not (p[0] % 10 < 8 and p[1] % 10 < 8)}
    assert got == want and len(want) > 0


def test_quadratic_guard_fires_above_limit(spark, planted_docs):
    from priority_data_pipeline_postgres_db_spark.operators.dedup import QuadraticScaleError

    with pytest.raises(QuadraticScaleError, match="minhash_verified_pairs"):
        ngram_jaccard_pairs(planted_docs, ["lang"], n=1, max_rows=3)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[0.1 * i, 0.2]) for i in range(5)]
    )
    with pytest.raises(QuadraticScaleError, match="semantic_pairs"):
        embedding_near_dup_pairs(emb, max_rows=4)
    # None opts out (bounded candidate subsets), limit >= n passes
    assert embedding_near_dup_pairs(emb, threshold=1.5, max_rows=None).count() == 0
    assert ngram_jaccard_pairs(planted_docs, ["lang"], n=1, max_rows=5, threshold=1.1).count() == 0


def test_containment_catches_embedded_doc(spark):
    """A doc quoted inside a larger doc has low Jaccard but containment
    ≈ 1 from the small side; containment_pairs must surface it while
    plain verified-Jaccard at the same bar misses it."""
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        containment_pairs,
        minhash_verified_pairs,
    )

    # moderate size delta: jaccard ≈ 0.7 (inside LSH band recall, below
    # the 0.8 bar) while containment from the small side ≈ 1 — the zone
    # where the two measures disagree.  The docstring's recall caveat
    # (extreme size skew escapes jaccard-banded candidates) is by design.
    small = BASE
    big = BASE + " closing remarks adding several extra unrelated tokens afterwards"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=small), Row(doc_id=2, text=big),
         Row(doc_id=3, text="unrelated corpus text about completely other topics entirely")]
    )
    got = {(r["doc_id_a"], r["doc_id_b"]): r for r in containment_pairs(docs, n=3, threshold=0.8).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["containment_a"] >= 0.95  # small side almost fully contained
    assert r["containment_b"] < 0.8
    # symmetric Jaccard at the same bar does NOT flag the pair
    jac = {(r["doc_id_a"], r["doc_id_b"]) for r in minhash_verified_pairs(docs, n=3, threshold=0.8).collect()}
    assert (1, 2) not in jac


def test_substring_pairs_find_shared_window(spark):
    """Two docs sharing a verbatim 15-token span pair up with the right
    shared-window count; boilerplate windows (present in more docs than
    the DF cap) are excluded."""
    from priority_data_pipeline_postgres_db_spark.operators.dedup import substring_dup_pairs

    span = " ".join(f"tok{i}" for i in range(15))
    rows = [
        Row(doc_id=1, text=f"prefix one {span} suffix alpha"),
        Row(doc_id=2, text=f"other intro {span} different tail words"),
        Row(doc_id=3, text="entirely unrelated content with no overlap at all " * 2),
    ]
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["n_shared_windows"]
        for r in substring_dup_pairs(spark.createDataFrame(rows)).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 1
    assert not any(3 in pair for pair in got)
    # a window in EVERY doc of a 5-doc corpus is boilerplate under df cap 3
    common = [Row(doc_id=i, text=f"lead{i} {span} trail{i}") for i in range(5)]
    capped = substring_dup_pairs(
        spark.createDataFrame(common), max_window_df=3
    ).collect()
    assert capped == []


def test_lsh_recall_report_ground_truth(spark, sf_dir):
    """The report's ground truth and recall agree with an independently
    computed exact pair set on the same hash sample; verified pairs are a
    subset of ground truth."""
    import hashlib

    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        _auto_mod,
        dedup_lsh_recall_report,
    )

    row = dedup_lsh_recall_report(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    mod = _auto_mod(len(docs))
    sample = [
        r
        for r in docs
        if int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) % mod
        == 0
    ]
    assert row["n_sample_docs"] == len(sample)

    def grams(text):
        toks = [t for t in text.lower().split() if t]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    gs = {r["doc_id"]: grams(r["text"]) for r in sample}
    gs = {k: v for k, v in gs.items() if v}
    ids = sorted(gs)
    n_exact = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(gs[a] & gs[b])
            if inter and inter / (len(gs[a]) + len(gs[b]) - inter) >= 0.5:
                n_exact += 1
    assert row["n_exact_pairs"] == n_exact
    assert 0 <= row["n_lsh_found"] <= n_exact
    expect_recall = 1.0 if n_exact == 0 else row["n_lsh_found"] / n_exact
    assert row["recall"] == expect_recall


def test_jaccard_prefix_equals_bruteforce(spark):
    """Prefix filtering loses nothing: on a planted corpus the prefix-
    pruned join returns exactly the brute-force Jaccard >= 0.6 pairs."""
    from itertools import combinations

    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over a lazy dog",     # near-dup of 1
        3: "the quick brown fox leaps over the lazy dog",   # near-dup of 1
        4: "entirely different words live in this one here",
        5: "entirely different words live in this one too",  # near-dup of 4
        6: "quick dog",                                     # small set
    }
    rows = [Row(doc_id=k, lang="en", source="s", text=v) for k, v in texts.items()]
    got = {
        (r["doc_id_a"], r["doc_id_b"]): (r["inter"], r["uni"])
        for r in jaccard_prefix_pairs(spark.createDataFrame(rows)).collect()
    }
    expect = {}
    sets = {k: set(v.split()) for k, v in texts.items()}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if 5 * inter >= 3 * uni:
            expect[(a, b)] = (inter, uni)
    assert got == expect
    assert (1, 2) in got and (4, 5) in got and (1, 6) not in got


def test_jaccard_prefix_fullpath_lowdensity(spark):
    """Full-corpus parity at REALISTIC density (VERDICT r7 #2): on the
    hash-random low-density fixture (planted ~1% twins, cross-doc
    Jaccard ≈ 0 otherwise) the UNSAMPLED production path must equal
    brute force exactly, find every planted twin, and generate
    candidates ≪ n²/2 (the prefix-theorem payoff the dense synthetic
    corpus can never demonstrate)."""
    import os
    import sys
    from itertools import combinations

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.stress_scale import lowdensity_docs

    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        jaccard_prefix_candidates,
        jaccard_prefix_pairs,
    )

    n = 400
    docs = lowdensity_docs(spark, n)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): (r["inter"], r["uni"])
        for r in jaccard_prefix_pairs(docs).collect()
    }
    sets = {
        r["doc_id"]: set(r["text"].split()) for r in docs.collect()
    }
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if 5 * inter >= 3 * uni:
            expect[(a, b)] = (inter, uni)
    assert got == expect
    # every planted twin found (i-1, i) for i % 100 == 1
    planted = {(i - 1, i) for i in range(1, n, 100)}
    assert planted <= set(got)
    # pruning payoff: candidates well under the quadratic pair space
    n_cand = jaccard_prefix_candidates(docs).count()
    assert n_cand < 0.05 * n * (n - 1) / 2, n_cand


def test_plan_minhash_laws():
    """plan_minhash codifies the S-curve 1-(1-s^r)^b (VERDICT r10 #2):
    largest r whose n_hashes//r bands still reach the recall target at
    the threshold — the most candidate-suppressing geometry that meets
    the floor; r monotone in the threshold; unreachable targets flagged,
    never silently under-planned."""
    import pytest

    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        _BAND_ROWS,
        _MINHASH_GATE_PLAN,
        _N_HASHES,
        lsh_candidate_prob,
        plan_minhash,
    )

    p = plan_minhash(0.8, 0.95)
    assert (p.band_rows, p.n_bands) == (6, 10)
    assert p.achievable and p.predicted_recall >= 0.95
    # the gate entry executes exactly this plan
    assert (p.band_rows, p.n_bands) == (
        _MINHASH_GATE_PLAN.band_rows,
        _MINHASH_GATE_PLAN.n_bands,
    )

    # r grows with the threshold (tighter dedup -> more selective bands)
    rs = [plan_minhash(t, 0.9).band_rows for t in (0.3, 0.5, 0.7, 0.9)]
    assert rs == sorted(rs) and rs[0] < rs[-1]

    # the hand-tuned default constant is what the law derives for the
    # 0.5-threshold gate regime at a moderate floor (its measured-recall
    # operating point); a 0.99 floor at the same threshold widens to r=2
    assert plan_minhash(0.5, 0.6).band_rows == _BAND_ROWS
    assert plan_minhash(0.5, 0.99).band_rows == 2

    # unreachable even at r=1 (64 one-row bands): honest flag, r=1 plan
    u = plan_minhash(0.05, 0.99)
    assert not u.achievable and (u.band_rows, u.n_bands) == (1, _N_HASHES)
    assert u.predicted_recall == lsh_candidate_prob(0.05, 1, _N_HASHES)

    with pytest.raises(ValueError):
        plan_minhash(1.0, 0.9)
    with pytest.raises(ValueError):
        plan_minhash(0.5, 0.0)


def test_plan_minhash_prediction_pinned_against_measured(spark, sf_dir):
    """The planner's S-curve prediction must track the MEASURED candidate
    recall of the planned geometry.  The gate corpus is bimodal (its 28
    planted near-dups all sit at ~0.95+ Jaccard, where every geometry
    reads ~1.0), so the pin runs on a GRADED corpus: token-prefix-shared
    pairs at exact similarity levels spanning the S-curve's mid-region
    (unique-token construction makes per-pair Jaccard exact by design and
    cross-pair similarity zero).  Ground truth is the construction; the
    prediction for a set of pairs is the MEAN of 1-(1-s_i^r)^b over their
    actual similarities.  max_bucket is lifted so the pin isolates the
    banding law from the hot-bucket cap policy (the gate entry keeps the
    cap; its oracle applies the same cap, so that stays
    engine-identical)."""
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        _MINHASH_GATE_PLAN,
        lsh_candidate_prob,
        minhash_candidate_pairs,
        plan_minhash,
    )

    # m=62 tokens -> 60 shingles/doc; a shared prefix of c tokens gives
    # exactly (c-2)/(120-(c-2)) Jaccard.  7 levels x 60 pairs.
    M, LEVELS, REPL = 62, (42, 47, 51, 54, 56, 57, 59), 60
    rows, truth = [], {}
    pid = 0
    for c in LEVELS:
        for k in range(REPL):
            a_toks = [f"p{pid}a{i}" for i in range(M)]
            b_toks = a_toks[:c] + [f"p{pid}b{i}" for i in range(M - c)]
            rows.append((2 * pid, " ".join(a_toks)))
            rows.append((2 * pid + 1, " ".join(b_toks)))
            truth[(2 * pid, 2 * pid + 1)] = (c - 2) / (120 - (c - 2))
            pid += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for plan in (plan_minhash(0.8, 0.95), plan_minhash(0.5, 0.9)):
        cand = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in minhash_candidate_pairs(
                docs, n=3, max_bucket=10**9, band_rows=plan.band_rows
            ).collect()
        }
        qual = {
            p: s for p, s in truth.items() if s >= plan.jaccard_threshold
        }
        assert len(qual) >= 100  # the pin needs statistics
        measured = sum(1 for p in qual if p in cand) / len(qual)
        predicted = sum(
            lsh_candidate_prob(s, plan.band_rows, plan.n_bands)
            for s in qual.values()
        ) / len(qual)
        # worst-case bound: every qualifying pair sits at or above the
        # threshold, so the mean prediction dominates the plan floor
        assert predicted >= plan.predicted_recall - 1e-12
        assert abs(measured - predicted) <= 0.05, (
            plan.band_rows,
            measured,
            predicted,
        )

    # the real gate corpus as a sanity floor: its near-exact pairs must
    # be found at (practically) the predicted ~1.0 rate by the gate plan
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _MINHASH_GATE_PLAN
    cand = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_candidate_pairs(
            real, n=3, max_bucket=10**9, band_rows=plan.band_rows
        ).collect()
    }
    from itertools import combinations

    grams = {}
    for r in real.select("doc_id", "text").collect():
        toks = r["text"].lower().split()
        if len(toks) >= 3:
            grams[r["doc_id"]] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
    true_pairs = {}
    for a, b in combinations(sorted(grams), 2):
        inter = len(grams[a] & grams[b])
        if inter:
            j = inter / (len(grams[a]) + len(grams[b]) - inter)
            if j >= plan.jaccard_threshold:
                true_pairs[(a, b)] = j
    assert true_pairs
    measured = sum(1 for p in true_pairs if p in cand) / len(true_pairs)
    predicted = sum(
        lsh_candidate_prob(s, plan.band_rows, plan.n_bands)
        for s in true_pairs.values()
    ) / len(true_pairs)
    assert measured >= predicted - 0.05


def test_minhash_signature_single_evaluation(spark, planted_docs):
    """Guide §4.4 plan pin: the cached signature relation must evaluate
    the (expensive) signature UDF exactly ONCE.  Filtering on the UDF's
    output column below the cache barrier made PushDownPredicates clone
    the ArrowEvalPython node — one copy below the spread exchange
    (single-partition evaluation of the whole corpus just to decide the
    filter) and one above recomputing the column — doubling every
    Python-boundary crossing in the LSH family."""
    import re

    df = minhash_candidate_pairs(planted_docs, n=3)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    udf_nodes = set(re.findall(r"ArrowEvalPython \((\d+)\)", plan))
    assert len(udf_nodes) == 1, plan


def test_simhash_single_evaluation(spark, planted_docs):
    """Same single-evaluation pin for the SimHash sketch relation."""
    import re

    df = simhash_pairs(planted_docs, max_hamming=3)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    udf_nodes = set(re.findall(r"ArrowEvalPython \((\d+)\)", plan))
    assert len(udf_nodes) == 1, plan
