"""Training-corpus prep operators: CC clustering, hash split, packing
(operators.corpus)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.corpus import (
    SEQ_CAPACITY,
    connected_components,
    corpus_hash_split,
    pack_sequences,
)


def test_connected_components_planted_graph(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_id_a long, doc_id_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_chain_needs_propagation(spark):
    """A length-8 chain exercises multi-round propagation (diameter > 1)."""
    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "doc_id_a long, doc_id_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {i: 1 for i in range(1, 9)}


def test_connected_components_matches_union_find(spark):
    """Random graphs: the distributed min-label propagation must agree
    with a reference union-find on every node."""
    import random

    rng = random.Random(20260813)
    for _ in range(3):
        n = 30
        raw = [(rng.randint(1, n), rng.randint(1, n)) for _ in range(25)]
        raw = [(a, b) for a, b in raw if a != b]
        parent = list(range(n + 1))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in raw:
            parent[find(a)] = find(b)
        roots: dict = {}
        for i in range(1, n + 1):
            roots.setdefault(find(i), []).append(i)
        expected = {i: min(members) for members in roots.values() for i in members}

        nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
        edges = spark.createDataFrame(raw, "doc_id_a long, doc_id_b long")
        got = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges).collect()}
        assert got == expected


def test_connected_components_driver_equals_distributed(spark, monkeypatch):
    """The size-gated driver union-find shortcut must be label-identical
    to the distributed min-label loop — on long ids, string ids (UTF-8
    byte order vs Python code-point order), chains, stars, and
    singletons."""
    import random

    from priority_data_pipeline_postgres_db_spark.operators import corpus as corpus_mod

    rng = random.Random(20260817)
    raw = [(rng.randint(1, 60), rng.randint(1, 60)) for _ in range(70)]
    raw = [(a, b) for a, b in raw if a != b] + [(i, i + 1) for i in range(50, 58)]

    nodes = spark.createDataFrame([(i,) for i in range(1, 61)], "doc_id long")
    edges = spark.createDataFrame(raw, "doc_id_a long, doc_id_b long")
    driver = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    monkeypatch.setattr(corpus_mod, "CC_DRIVER_EDGE_BOUND", -1)
    dist = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    monkeypatch.undo()
    assert driver == dist

    # string ids: the distributed loop's sum-based convergence check only
    # supports numeric ids (all production call sites), so pin the driver
    # path against a Python reference union-find instead.
    snodes = [f"d{i:03d}" for i in range(1, 61)] + ["Über", "zz"]
    sedges = [(f"d{a:03d}", f"d{b:03d}") for a, b in raw] + [("Über", "zz"), ("zz", "d001")]
    parent = {x: x for x in snodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sedges:
        parent[find(a)] = find(b)
    comp_min: dict = {}
    for x in snodes:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    expected = {x: comp_min[find(x)] for x in snodes}
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            spark.createDataFrame([(x,) for x in snodes], "doc_id string"),
            spark.createDataFrame(sedges, "doc_id_a string, doc_id_b string"),
        ).collect()
    }
    assert got == expected


def test_connected_components_null_edge_falls_back(spark):
    """A NULL edge endpoint must not crash the driver shortcut — it falls
    back to the distributed loop (which drops null-keyed join rows)."""
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (3, None)], "doc_id_a long, doc_id_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_hash_split_deterministic_and_stable(spark, sf_dir):
    out1 = {r["doc_id"]: (r["bucket"], r["split"]) for r in corpus_hash_split(spark, sf_dir).collect()}
    out2 = {r["doc_id"]: (r["bucket"], r["split"]) for r in corpus_hash_split(spark, sf_dir).collect()}
    assert out1 == out2  # no RNG, no state
    for bucket, split in out1.values():
        assert 0 <= bucket < 100
        assert split == ("train" if bucket < 90 else "validation" if bucket < 95 else "test")
    # roughly proportional (hash uniformity, generous bounds)
    n = len(out1)
    n_train = sum(1 for _, s in out1.values() if s == "train")
    assert 0.8 * n <= n_train / 0.9 <= 1.2 * n


def test_decontaminate_flags_cross_split_overlap(spark):
    """A test doc sharing a 5-gram with a train doc is flagged with the
    right shared-gram count; clean and short docs are not."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import decontaminate

    leak = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        Row(doc_id=1, lang="en", split="train", text="intro words " + leak),
        Row(doc_id=2, lang="en", split="test", text=leak + " trailing words here"),
        Row(doc_id=3, lang="en", split="test", text="totally different text with many fresh words one two three four five"),
        Row(doc_id=4, lang="en", split="validation", text="short doc"),  # < n tokens
    ]
    out = {r["doc_id"]: r for r in decontaminate(spark.createDataFrame(rows), n=5).collect()}
    assert set(out) == {2}
    # the 9-token leak inside doc 2 yields 5 overlapping 5-grams with doc 1
    assert out[2]["n_shared_grams"] == 5
    assert out[2]["split"] == "test"


def test_redact_pii_counts_and_text(spark, sf_dir, tmp_path):
    """Emails/IPs/phone-ish runs are counted and replaced; clean text
    passes through byte-identical."""
    import os

    from priority_data_pipeline_postgres_db_spark.operators.corpus import corpus_redact_pii

    rows = [
        Row(doc_id=0, text="contact bob.smith+x@example.co.uk or 10.0.0.1 now", lang="en", source="s", n_chars=1),
        Row(doc_id=1, text="call +1 415-555-0199 today", lang="en", source="s", n_chars=1),
        Row(doc_id=2, text="no pii here just words", lang="en", source="s", n_chars=1),
    ]
    d = os.path.join(tmp_path, "docs")
    spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in corpus_redact_pii(spark, d).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_ips"] == 1
    assert "<EMAIL>" in out[0]["redacted_text"] and "<IP>" in out[0]["redacted_text"]
    assert "example.co.uk" not in out[0]["redacted_text"]
    assert out[1]["n_phones"] == 1 and "<PHONE>" in out[1]["redacted_text"]
    assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_phones"] == 0
    assert out[2]["redacted_text"] == "no pii here just words"


def test_source_cap_and_quality_sample(spark, sf_dir):
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_quality_sample,
        corpus_source_cap,
    )
    from priority_data_pipeline_postgres_db_spark.functions.text import text_quality_score

    capped = corpus_source_cap(spark, sf_dir, max_per_source=5).collect()
    per_source: dict = {}
    for r in capped:
        per_source.setdefault(r["source"], []).append(r["doc_id"])
    for source, ids in per_source.items():
        assert len(ids) <= 5
    # deterministic: the lowest doc_ids per source survive
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for source, ids in per_source.items():
        lowest = [
            r["doc_id"]
            for r in docs.filter(F.col("source") == source).orderBy("doc_id").limit(5).collect()
        ]
        assert sorted(ids) == lowest

    sampled = {r["doc_id"]: r["quality_score"] for r in corpus_quality_sample(spark, sf_dir).collect()}
    quality = {r["doc_id"]: r["quality_score"] for r in text_quality_score(spark, sf_dir).collect()}
    assert 0 < len(sampled) <= len(quality)
    # survival is the documented pure function of (doc_id, quality)
    from priority_data_pipeline_postgres_db_spark.operators.dedup import _md5_60
    import math

    for d, q in quality.items():
        expected = (_md5_60(str(d)) % 1000) < math.floor(q * 1000)
        assert (d in sampled) == expected


def test_build_training_set_composition(spark, sf_dir):
    """The flagship composition = exactly (CC survivors ∩ quality gate)
    with the deterministic split — cross-checked against the stages run
    separately."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_build_training_set,
        dedup_connected_components,
    )
    from priority_data_pipeline_postgres_db_spark.functions.text import text_quality_score

    out = corpus_build_training_set(spark, sf_dir).collect()
    assert len(out) > 0
    survivors = {
        r["doc_id"]
        for r in dedup_connected_components(spark, sf_dir).collect()
        if r["component"] == r["doc_id"]
    }
    quality = {r["doc_id"]: r["quality_score"] for r in text_quality_score(spark, sf_dir).collect()}
    expected_ids = {d for d in survivors if quality.get(d, -1.0) >= 0.5}
    assert {r["doc_id"] for r in out} == expected_ids
    splits = {r["split"] for r in out}
    assert splits <= {"train", "validation", "test"}
    for r in out:
        assert r["quality_score"] == quality[r["doc_id"]]


def test_pack_sequences_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(docs).orderBy("lang", "doc_id").collect()
    by_lang: dict = {}
    for r in out:
        assert 0 <= r["seq_offset"] < SEQ_CAPACITY
        assert r["seq_id"] == r["seq_start"] // SEQ_CAPACITY
        prev = by_lang.get(r["lang"])
        if prev is not None:
            # running offset is the cumulative token count of predecessors
            assert r["seq_start"] == prev["seq_start"] + prev["n_tokens"]
            assert r["seq_id"] >= prev["seq_id"]
        by_lang[r["lang"]] = r
    # first doc of each lang stream starts at offset 0
    firsts = {}
    for r in out:
        firsts.setdefault(r["lang"], r)
    assert all(r["seq_start"] == 0 for r in firsts.values())


def test_length_buckets_padding_waste(spark):
    """Bucket = smallest power-of-two bound ≥ n_tokens; waste = bound−n."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import length_buckets

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 10)), (2, " ".join(["w"] * 16)),
         (3, " ".join(["w"] * 17)), (4, " ".join(["w"] * 3000))],
        "doc_id long, text string",
    )
    got = {r["bucket"]: r for r in length_buckets(docs).collect()}
    assert got[16]["n_docs"] == 2 and got[16]["padding_waste"] == (16 - 10) + (16 - 16)
    assert got[32]["n_docs"] == 1 and got[32]["padding_waste"] == 32 - 17
    assert got[-1]["n_docs"] == 1 and got[-1]["padding_waste"] == 0  # overlong


def test_chunk_documents_overlap_and_coverage(spark):
    """Chunks stride by 24 with size 32: every token covered, overlap = 8,
    short docs yield exactly one chunk."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(80))), (2, "a b c")],
        "doc_id long, text string",
    )
    got = chunk_documents(docs).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: single chunk, all 3 tokens
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    # doc 1: 80 tokens -> ceil((80-32)/24)+1 = 3 chunks at offsets 0,24,48
    # (the last covers tokens 48..79, so no tail chunk is needed)
    c = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c] == [32, 32, 32]
    assert c[1]["chunk_text"].split()[0] == "t24"  # stride 24
    # coverage: union of chunk tokens == all tokens
    seen = set()
    for r in c:
        seen.update(r["chunk_text"].split())
    assert seen == {f"t{i}" for i in range(80)}


def test_token_budget_select_greedy_prefix(spark):
    """Selection is the greedy quality-ordered prefix: running total stays
    within budget, the highest-quality docs survive, and the first doc
    past the boundary (and everything after) is dropped."""
    import pyspark.sql.functions as F
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        token_budget_select,
    )

    # quality ~ stopword density; doc_id 1..4 descending quality by design
    mk = lambda stops, pads: ("the a of and to in is it " * stops + "zq " * pads).strip()  # noqa: E731
    docs = spark.createDataFrame(
        [(i, mk(5 - i, 6 * i)) for i in range(1, 5)],
        "doc_id long, text string",
    )
    all_rows = {
        r["doc_id"]: r
        for r in token_budget_select(docs, budget=10**9).collect()
    }
    assert len(all_rows) == 4
    order = sorted(all_rows.values(), key=lambda r: r["cum_tokens"])
    qualities = [r["quality_score"] for r in order]
    assert qualities == sorted(qualities, reverse=True)
    # budget that cuts after the second doc in quality order
    cut = order[1]["cum_tokens"]
    got = token_budget_select(docs, budget=cut).collect()
    assert {r["doc_id"] for r in got} == {order[0]["doc_id"], order[1]["doc_id"]}
    assert max(r["cum_tokens"] for r in got) <= cut


def test_token_budget_selections_nest_across_budgets(spark):
    """Prefix semantics ⇒ selections are nested: the budget-b selection is
    exactly the full quality-ordered prefix cut at b, for every b.  Also
    exercises whole-bucket pruning (tiny budgets keep only top buckets)."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        token_budget_select,
    )

    mk = lambda stops, pads: ("the a of and to in is it " * stops + f"w{pads} " * (3 * pads + 1)).strip()  # noqa: E731
    docs = spark.createDataFrame(
        [(i, mk(1 + (i % 7), i)) for i in range(1, 40)],
        "doc_id long, text string",
    )
    full = sorted(
        token_budget_select(docs, budget=10**9).collect(),
        key=lambda r: r["cum_tokens"],
    )
    assert [r["cum_tokens"] for r in full] == [
        sum(x["n_tokens"] for x in full[: i + 1]) for i in range(len(full))
    ]
    for budget in (full[0]["cum_tokens"] - 1, full[3]["cum_tokens"],
                   full[20]["cum_tokens"] + 1, full[-1]["cum_tokens"]):
        got = token_budget_select(docs, budget=budget).collect()
        want = [r for r in full if r["cum_tokens"] <= budget]
        assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in want)


def test_interleave_sources_round_robin(spark):
    """Reading in interleave_key order alternates sources until the short
    one exhausts; keys are unique and strictly ordering-correct."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        interleave_sources,
    )

    rows = [(i, "a") for i in range(4)] + [(10 + i, "b") for i in range(2)]
    docs = spark.createDataFrame(
        [(i, s, "x") for i, s in rows], "doc_id long, source string, text string"
    )
    got = sorted(interleave_sources(docs).collect(), key=lambda r: r["interleave_key"])
    assert [r["source"] for r in got] == ["a", "b", "a", "b", "a", "a"]
    keys = [r["interleave_key"] for r in got]
    assert len(set(keys)) == len(keys) == 6
    # per-source doc order preserved
    assert [r["doc_id"] for r in got if r["source"] == "a"] == [0, 1, 2, 3]


def test_dup_rate_by_source_counts(spark):
    """dup_rate counts each source's docs touched by >=1 pair, exactly."""
    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators.corpus import dup_rate_by_source

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s1" if i < 4 else "s2") for i in range(6)]
    )
    pairs = spark.createDataFrame([Row(doc_id_a=0, doc_id_b=1), Row(doc_id_a=1, doc_id_b=2)])
    got = {r["source"]: r for r in dup_rate_by_source(docs, pairs).collect()}
    assert got["s1"]["n_docs"] == 4 and got["s1"]["n_dup_docs"] == 3
    assert got["s1"]["dup_rate"] == 0.75
    assert got["s2"]["n_dup_docs"] == 0 and got["s2"]["dup_rate"] == 0.0


def test_exact_substring_scrub_keeps_first_copy(spark):
    """Planted shared span: the min-(doc_id, pos) occurrence survives, every
    other occurrence is scrubbed; unique text is untouched; a doc that is
    entirely a copy of an earlier doc scrubs to empty."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        exact_substring_scrub,
    )

    span = "v w x y z"  # the 5-token duplicated span (w=5)
    rows = [
        (1, f"a b c {span} d e f"),     # first occurrence — kept
        (2, f"g h i {span} j k l"),     # later occurrence — scrubbed
        (3, "m n o p q r s t u"),       # unique — untouched
        (4, f"a b c {span} d e f"),     # full copy of doc 1 — scrubs to empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in exact_substring_scrub(docs, w=5).collect()}
    assert got[1]["text_dedup"] == f"a b c {span} d e f"
    assert got[1]["n_tokens_removed"] == 0
    assert got[2]["text_dedup"] == "g h i j k l"
    assert got[2]["n_tokens_removed"] == 5
    assert got[3]["text_dedup"] == "m n o p q r s t u"
    assert got[3]["n_tokens_removed"] == 0
    # doc 4: every 5-token window duplicates doc 1's, so every token is
    # covered by a non-first occurrence
    assert got[4]["text_dedup"] == ""
    assert got[4]["n_tokens_kept"] == 0
    for r in got.values():
        assert r["n_tokens"] == r["n_tokens_kept"] + r["n_tokens_removed"]


def test_exact_substring_scrub_intra_doc_repeat(spark):
    """A span repeated INSIDE one document keeps only its first occurrence
    (Lee et al. dedup both within and across docs)."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        exact_substring_scrub,
    )

    docs = spark.createDataFrame(
        [(1, "p q r s t m n p q r s t")], "doc_id long, text string"
    )
    got = exact_substring_scrub(docs, w=5).collect()[0]
    assert got["text_dedup"] == "p q r s t m n"
    assert got["n_tokens_removed"] == 5


def test_keep_best_in_cluster_survivors(spark, sf_dir):
    """One survivor per component; the survivor carries the component's max
    quality score; n_members accounts for every document."""
    from priority_data_pipeline_postgres_db_spark.functions.text import (
        text_quality_score,
    )
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_keep_best_in_cluster,
        dedup_connected_components,
    )

    kept = corpus_keep_best_in_cluster(spark, sf_dir).collect()
    comps = {
        r["doc_id"]: r["component"]
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in text_quality_score(spark, sf_dir).collect()
    }
    # exactly one survivor per component
    assert len({r["component"] for r in kept}) == len(kept)
    assert len(kept) == len(set(comps.values()))
    # membership bookkeeping and argmax-quality selection
    assert sum(r["n_members"] for r in kept) == len(comps)
    by_comp: dict = {}
    for d, c in comps.items():
        by_comp.setdefault(c, []).append(d)
    for r in kept:
        members = by_comp[r["component"]]
        assert len(members) == r["n_members"]
        best = max(quality[m] for m in members)
        assert r["quality_score"] == best
        # tie-break: min doc_id among the max-quality members
        assert r["doc_id"] == min(m for m in members if quality[m] == best)


def test_pack_sequences_sharded_equals_windowed(spark, sf_dir):
    """The sharded (range-partition + driver prefix-offsets) packer is
    bit-identical to the per-language-window formulation, across shard
    counts — including shard counts that split a language mid-stream."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        pack_sequences,
        pack_sequences_sharded,
    )
    from priority_data_pipeline_postgres_db_spark.operators.ranking import (
        grouped_running_sum,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = {tuple(r) for r in pack_sequences(docs).collect()}
    got = {tuple(r) for r in pack_sequences_sharded(docs).collect()}
    assert got == expect
    # explicit shard counts, incl. more shards than languages
    base = docs.select(
        "doc_id", "lang", F.length("text").cast("long").alias("v")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = {
        (r["doc_id"], r["s"])
        for r in base.withColumn(
            "s", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
        ).collect()
    }
    for parts in (2, 7, 32):
        sharded = {
            (r["doc_id"], r["s"])
            for r in grouped_running_sum(
                base, ["lang"], [F.asc("doc_id")], "v", "s", partitions=parts
            ).collect()
        }
        assert sharded == ref, parts


def test_connected_components_incremental_equals_full(spark):
    """Random graphs in two waves: updating wave-1 labels with wave-2
    edges must equal a from-scratch CC over the union edge set."""
    import random

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        connected_components,
        connected_components_incremental,
    )

    rng = random.Random(20260814)
    for _ in range(3):
        n = 40
        e1 = [(rng.randint(1, n), rng.randint(1, n)) for _ in range(15)]
        e2 = [(rng.randint(1, n), rng.randint(1, n)) for _ in range(15)]
        e1 = [(a, b) for a, b in e1 if a != b]
        e2 = [(a, b) for a, b in e2 if a != b]
        nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
        d1 = spark.createDataFrame(e1, "doc_id_a long, doc_id_b long")
        d2 = spark.createDataFrame(e2, "doc_id_a long, doc_id_b long")
        full = {
            r["doc_id"]: r["component"]
            for r in connected_components(
                nodes, d1.unionByName(d2)
            ).collect()
        }
        labels1 = connected_components(nodes, d1)
        inc = {
            r["doc_id"]: r["component"]
            for r in connected_components_incremental(nodes, labels1, d2).collect()
        }
        assert inc == full


def test_source_stats_mass_and_shares(spark, sf_dir):
    """Doc/token mass sums to the corpus; shares sum to 1 (exact int/int
    ratios over a common total)."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_source_stats,
    )
    from pyspark.sql import functions as F

    rows = corpus_source_stats(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    total_tok = sum(r["n_tokens"] for r in rows)
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r["avg_doc_tokens"] == r["n_tokens"] / r["n_docs"]
        assert r["token_share"] == r["n_tokens"] / total_tok


def test_repetition_gate_drops_looping_text(spark, sf_dir):
    """A token-looping doc trips both Gopher ceilings and is dropped; a
    diverse doc passes; a 1-token doc has no bigram signal and passes."""
    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam spam spam", lang="en",
                source="s", n_chars=29),
            Row(doc_id=2, text="one two three four five six", lang="en",
                source="s", n_chars=27),
            Row(doc_id=3, text="lonely", lang="en", source="s", n_chars=6),
        ]
    )
    import tempfile, os, shutil
    d = tempfile.mkdtemp()
    try:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["doc_id"]: r for r in C.corpus_repetition_gate(spark, d).collect()}
        assert got[1]["keep"] is False and got[1]["dup_token_frac"] > 0.3
        assert got[2]["keep"] is True and got[2]["dup_token_frac"] == 0.0
        assert got[3]["keep"] is True and got[3]["top_bigram_frac"] == 0.0
    finally:
        shutil.rmtree(d)


def test_blocklist_filter_fraction_gate(spark, sf_dir):
    """Hit fraction above the ceiling drops the doc; zero-token docs pass
    with 0 hits; the hit count is exact."""
    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="slow slow broken fast", lang="en", source="s",
                n_chars=21),  # 3/4 blocked
            Row(doc_id=2, text="fast table scan value data " * 8 + "slow",
                lang="en", source="s", n_chars=10),  # 1/41 blocked < 5%
            Row(doc_id=3, text="   ", lang="en", source="s", n_chars=3),
        ]
    )
    import tempfile, os, shutil
    d = tempfile.mkdtemp()
    try:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["doc_id"]: r for r in C.corpus_blocklist_filter(spark, d).collect()}
        assert got[1]["n_blocked"] == 3 and got[1]["keep"] is False
        assert got[2]["n_blocked"] == 1 and got[2]["keep"] is True
        assert got[3]["n_blocked"] == 0 and got[3]["keep"] is True
    finally:
        shutil.rmtree(d)


def test_packing_efficiency_hand_computed(spark, sf_dir):
    """Utilization matches the ceil-division layout exactly."""
    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators import corpus as C
    from priority_data_pipeline_postgres_db_spark.operators.corpus import SEQ_CAPACITY

    # one doc of exactly capacity tokens (1.0 util), one of capacity+1
    # (2 chunks, util just over 0.5)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(["t"] * SEQ_CAPACITY), lang="en",
                source="full", n_chars=1),
            Row(doc_id=2, text=" ".join(["t"] * (SEQ_CAPACITY + 1)), lang="en",
                source="spill", n_chars=1),
        ]
    )
    import tempfile, os, shutil
    d = tempfile.mkdtemp()
    try:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["source"]: r for r in C.corpus_packing_efficiency(spark, d).collect()}
        assert got["full"]["n_seqs"] == 1 and got["full"]["utilization"] == 1.0
        assert got["spill"]["n_seqs"] == 2
        assert got["spill"]["pad_tokens"] == SEQ_CAPACITY - 1
        assert got["spill"]["utilization"] == (SEQ_CAPACITY + 1) / (2 * SEQ_CAPACITY)
    finally:
        shutil.rmtree(d)


def test_importance_weights_favor_target_vocabulary(spark, sf_dir):
    """A doc written in the target slice's vocabulary outscores one written
    in off-target vocabulary; weights are positive and finite."""
    import hashlib

    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators import corpus as C
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        DSIR_TARGET_MOD,
    )

    def is_target(doc_id):
        return (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
            % DSIR_TARGET_MOD
            == 0
        )

    target_ids = [i for i in range(200) if is_target(i)][:3]
    other_ids = [i for i in range(200) if not is_target(i)][:5]
    rows = [
        Row(doc_id=i, text="alpha beta gamma delta", lang="en", source="s",
            n_chars=1)
        for i in target_ids
    ] + [
        Row(doc_id=other_ids[0], text="alpha beta gamma delta", lang="en",
            source="s", n_chars=1),          # on-target vocab
        Row(doc_id=other_ids[1], text="zig zag zork quux", lang="en",
            source="s", n_chars=1),          # off-target vocab
    ] + [
        Row(doc_id=i, text="filler words here now", lang="en", source="s",
            n_chars=1)
        for i in other_ids[2:]
    ]
    import tempfile, os, shutil
    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame(rows).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {r["doc_id"]: r["importance"] for r in
               C.corpus_importance_weights(spark, d).collect()}
        assert all(v > 0 for v in got.values())
        assert got[other_ids[0]] > got[other_ids[1]]
    finally:
        shutil.rmtree(d)


def test_chunk_dedup_keeps_first_copy_only(spark, sf_dir):
    """Every fingerprint has exactly one keep=True, and it is the min
    (doc_id, chunk_id) holder; duplicated chunks across docs are caught."""
    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    rows = C.corpus_chunk_dedup(spark, sf_dir).collect()
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fingerprint"], []).append(r)
    assert len(rows) > 0
    for fp, grp in by_fp.items():
        keeps = [r for r in grp if r["keep"]]
        assert len(keeps) == 1
        first = min((r["doc_id"], r["chunk_id"]) for r in grp)
        assert (keeps[0]["doc_id"], keeps[0]["chunk_id"]) == first


def test_vocab_coverage_monotone_and_bounded(spark, sf_dir):
    """Coverage rises with k, never exceeds 1, and equals covered/total."""
    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    rows = sorted(
        C.text_vocab_coverage(spark, sf_dir).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == [10, 100, 1000, 10000]
    prev = 0.0
    for r in rows:
        assert 0.0 < r["coverage"] <= 1.0
        assert r["coverage"] >= prev
        assert r["coverage"] == r["covered"] / r["total"]
        prev = r["coverage"]


def test_cluster_size_histogram_accounts_every_doc(spark, sf_dir):
    """Σ n_docs over the histogram equals the corpus size; singleton bin
    dominates on the fixture; n_docs = size × n_clusters per row."""
    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    rows = C.corpus_cluster_size_histogram(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
    by_size = {r["cluster_size"]: r["n_clusters"] for r in rows}
    assert by_size.get(1, 0) > 0


def test_source_drift_bounds_and_identical_source(spark, sf_dir):
    """TV distances live in [0, 1); a corpus with one source has TV ≈ 0
    (only fixed-point floor residue)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    rows = C.corpus_source_drift(spark, sf_dir).collect()
    assert rows and all(0.0 <= r["tv_distance"] < 1.0 for r in rows)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "source", F.lit("only")
    )
    d = tempfile.mkdtemp()
    try:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        one = C.corpus_source_drift(spark, d).collect()
        assert len(one) == 1 and one[0]["tv_distance"] < 0.01
    finally:
        shutil.rmtree(d)


def test_dedup_savings_consistent_with_cc(spark, sf_dir):
    """docs_dropped equals the number of CC non-survivors; fractions are
    internally consistent and bounded."""
    from priority_data_pipeline_postgres_db_spark.operators import corpus as C
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        minhash_verified_pairs,
    )

    row = C.corpus_dedup_savings(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_verified_pairs(docs, n=3, threshold=0.5)
    labels = C.connected_components(docs.select("doc_id"), pairs)
    n_dropped = labels.filter("doc_id != component").count()
    assert row["docs_dropped"] == n_dropped
    assert 0 <= row["tokens_saved"] <= row["tokens_total"]
    assert row["savings_frac"] == row["tokens_saved"] / row["tokens_total"]


def test_importance_ratio_exact_beyond_int64_products(spark):
    """ADVICE r5: the 1e6 fixed-point DSIR numerator overflows int64 at
    moderate corpus sizes — the DECIMAL(38,0)/div pair must stay exact
    (vs Python bigint math) on operand magnitudes where the old int64
    expression demonstrably wrapped."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.corpus import _R6_EXPR

    # (c_t, c_c, t_c, t_t, v): 100 TB-scale totals; numerator up to ~6e32
    cases = [
        (9_000_000_000_000, 9_500_000_000_000, 25_000_000_000_000,
         2_500_000_000_000, 50_000_000),
        (1, 7, 25_000_000_000_000, 2_500_000_000_000, 50_000_000),
        (0, 123_456, 9_000_000_000_000_000, 900_000_000_000_000, 1_000_000),
        (42, 42, 1_000, 100, 10),
    ]
    df = spark.createDataFrame(
        cases, "c_t long, c_c long, t_c long, t_t long, v long"
    )
    got = [r[0] for r in df.select(F.expr(_R6_EXPR)).collect()]
    want = [
        (1_000_000 * (c_t + 1) * (t_c + v)) // ((c_c + 1) * (t_t + v))
        for c_t, c_c, t_c, t_t, v in cases
    ]
    assert got == want
    # and at least one case actually exceeds the int64 product range,
    # i.e. the old expression would have wrapped
    assert any(
        1_000_000 * (c_t + 1) * (t_c + v) > (1 << 63) - 1
        for c_t, c_c, t_c, t_t, v in cases
    )


def test_importance_fixed_point_guard_refuses_quotient_overflow():
    """The quotient bound 1e6·(t_c+v)/(t_t+v) is where Spark's div wraps
    silently — the guard must refuse loudly there and accept below."""
    import pytest

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        FixedPointOverflowError,
        _check_fixed_point_bound,
    )

    _check_fixed_point_bound(t_c=25_000_000_000_000, t_t=2_500_000_000_000,
                             v=50_000_000)  # healthy 10% target slice
    with pytest.raises(FixedPointOverflowError):
        # degenerate target: ~1e-14 of corpus mass -> ratio bound > int64
        _check_fixed_point_bound(t_c=10**19, t_t=0, v=1)


def test_gopher_rules_fire_on_planted_pathologies(spark, sf_dir):
    """Each Gopher rule catches the pathology it is named for, and a
    healthy document passes all four."""
    import os
    import shutil
    import tempfile

    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    healthy = " ".join(
        ["the", "a", "of"] * 4 + [f"token{i} value{i} part{i}" for i in range(12)]
    )
    rows = [
        (1, healthy, "en", "s", len(healthy)),
        (2, "too short", "en", "s", 9),  # word count
        (3, " ".join(["xx"] * 50), "en", "s", 149),  # mean len + repetition
        (4, " ".join(f"w{i}" * 9 for i in range(50)), "en", "s", 500),  # no stopwords
        (5, " ".join(["the"] * 25 + [f"u{i}" for i in range(25)]), "en", "s", 200),  # top token 50%
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    try:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["doc_id"]: r for r in C.corpus_gopher_rules(spark, d).collect()}
    finally:
        shutil.rmtree(d)
    assert got[1]["keep"]
    assert not got[2]["ok_word_count"] and not got[2]["keep"]
    assert not got[3]["ok_mean_word_len"] and not got[3]["ok_repetition"]
    assert not got[4]["ok_stopwords"] and not got[4]["keep"]
    assert got[5]["ok_word_count"] and not got[5]["ok_repetition"]


def test_tokenizer_fertility_ordering(spark, sf_dir):
    """Fertility ≥ 1 by construction (a whitespace word yields ≥1 BPE-ish
    piece) and group sums reconcile with the per-doc token counts."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.functions.text import (
        text_token_count,
    )
    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    rows = C.corpus_tokenizer_fertility(spark, sf_dir).collect()
    assert rows and all(r["fertility"] >= 1.0 for r in rows)
    total_words = sum(r["words"] for r in rows)
    per_doc = text_token_count(spark, sf_dir).agg(
        F.sum("n_tokens").alias("s")
    ).collect()[0]["s"]
    assert total_words == per_doc


def test_crosssplit_contamination_only_crossing_pairs(spark, sf_dir):
    """Every reported pair straddles the train boundary: the train side
    hashes into the train band, the eval side does not — and the pair set
    is a subset of the full semantic near-dup pairs."""
    from priority_data_pipeline_postgres_db_spark.operators import corpus as C
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        corpus_crosssplit_contamination,
        semantic_pairs,
    )

    rows = corpus_crosssplit_contamination(spark, sf_dir).collect()
    assert rows, "sf0.01 fixture has cross-split near-dups"

    def bucket(v):
        import hashlib

        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % C._SPLIT_BUCKETS

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    allp = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs(emb, dim).collect()
    }
    for r in rows:
        assert bucket(r["train_vec_id"]) < C._TRAIN_LT
        assert bucket(r["eval_vec_id"]) >= C._TRAIN_LT
        a, b = sorted((r["train_vec_id"], r["eval_vec_id"]))
        assert (a, b) in allp


def test_safety_profile_counts_planted_pii_and_blocklist(spark):
    """Planted PII and blocklist pathologies roll up into the right
    source rows; a clean source reports zeros."""
    import os
    import shutil
    import tempfile

    from priority_data_pipeline_postgres_db_spark.operators import corpus as C

    rows = [
        (1, "contact bob@example.com or 10.0.0.1 now", "en", "dirty", 40),
        (2, "call +1 (555) 123-4567 today", "en", "dirty", 28),
        (3, "slow slow slow slow fast", "en", "blocked", 24),  # 80% blocked
        (4, "clean words only here always", "en", "clean", 28),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    try:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["source"]: r for r in C.corpus_safety_profile(spark, d).collect()}
    finally:
        shutil.rmtree(d)
    assert got["dirty"]["email_hits"] == 1
    assert got["dirty"]["ip_hits"] == 1
    assert got["dirty"]["phone_hits"] >= 1
    assert got["dirty"]["pii_docs"] == 2
    assert got["blocked"]["blocked_tokens"] == 4
    assert got["blocked"]["blocked_docs"] == 1
    clean = got["clean"]
    assert (clean["email_hits"], clean["ip_hits"], clean["pii_docs"],
            clean["blocked_docs"]) == (0, 0, 0, 0)


def test_decontaminate_bloom_equals_plain(spark):
    """The Bloom prefilter is a pure cost optimization: on the planted
    leak corpus it must return exactly the plain operator's rows."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        decontaminate,
        decontaminate_bloom,
    )

    leak = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        Row(doc_id=1, lang="en", split="train", text="intro words " + leak),
        Row(doc_id=2, lang="en", split="test", text=leak + " trailing words here"),
        Row(doc_id=3, lang="en", split="test", text="fresh words one two three four five six seven"),
        Row(doc_id=4, lang="en", split="validation", text="short doc"),
    ]
    df = spark.createDataFrame(rows)
    plain = sorted(map(tuple, decontaminate(df, n=5).collect()))
    bloom = sorted(map(tuple, decontaminate_bloom(df, n=5).collect()))
    assert bloom == plain
    assert bloom  # non-vacuous: the leak was found


def test_decontaminate_bloom_refuses_oversized_eval(spark):
    """An eval split bigger than the driver budget is a loud refusal
    (inverted split roles), never a silent driver OOM."""
    import pytest

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        BroadcastScopeError,
        decontaminate_bloom,
    )

    rows = [
        Row(doc_id=1, lang="en", split="train", text="one two three four five six"),
        Row(doc_id=2, lang="en", split="test", text="one two three four five six seven"),
    ]
    with pytest.raises(BroadcastScopeError):
        decontaminate_bloom(spark.createDataFrame(rows), n=5, max_eval_keys=1)


def test_bloom_bits_no_false_negatives():
    """Property of the bit array itself: every inserted key tests
    positive, and the false-positive rate on disjoint keys stays far
    below the 5e-4 design point's order of magnitude."""
    import numpy as np

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        _BLOOM_K,
        _bloom_build,
        _bloom_hash_halves,
    )

    rng = np.random.default_rng(20260814)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    bits, mask = _bloom_build(keys)

    def might(h):
        h1, h2 = _bloom_hash_halves(h.astype(np.int64), mask)
        out = np.ones(len(h1), dtype=bool)
        for i in range(_BLOOM_K):
            idx = (h1 + np.uint64(i) * h2) & np.uint64(mask)
            out &= (
                bits[(idx >> np.uint64(3)).astype(np.int64)]
                & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
            ) != 0
        return out

    assert might(keys).all()  # zero false negatives, by construction
    probe = rng.integers(-(2**62), 2**62, size=200_000, dtype=np.int64)
    probe = np.setdiff1d(probe, keys)
    assert might(probe).mean() < 0.01


# ---------------------------------------------------------------------------
# multi-signal ensemble (r9 shared scan + component-equivalent compression)
# ---------------------------------------------------------------------------


def test_dual_sketch_udf_matches_standalone_udfs(spark, sf_dir):
    """The shared-scan dual sketch must be VALUE-identical to the two
    standalone UDFs on every document — any drift silently changes the
    ensemble's candidate sets."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        dual_sketch_udf,
        minhash_signature_udf,
        simhash_udf,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dual = docs.select(
        "doc_id", dual_sketch_udf(3)(F.col("text")).alias("d")
    ).select("doc_id", F.col("d.sig").alias("sig"), F.col("d.simhash").alias("sh"))
    mh = docs.select(
        "doc_id", minhash_signature_udf(3)(F.col("text")).alias("sig")
    )
    sh = docs.select("doc_id", simhash_udf()(F.col("text")).alias("sh"))
    d = {r["doc_id"]: (list(r["sig"]), r["sh"]) for r in dual.collect()}
    m = {r["doc_id"]: list(r["sig"]) for r in mh.collect()}
    s = {r["doc_id"]: r["sh"] for r in sh.collect()}
    assert set(d) == set(m) == set(s)
    for k in d:
        assert d[k][0] == m[k], f"minhash sig drift at doc {k}"
        assert d[k][1] == s[k], f"simhash drift at doc {k}"


def test_multi_signal_matches_naive_union(spark, sf_dir):
    """The sketch-compressed CC feed (identical-sketch stars + rep-level
    Hamming pairs) must produce EXACTLY the components of the naive
    union (full verified Jaccard ∪ full verified SimHash pairs,
    distinct) — the compression is claimed connectivity-equivalent, so
    pin it against the straightforward implementation."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        connected_components,
        multi_signal_components,
    )
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        minhash_verified_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_id"], r["component"], r["survivor"])
        for r in multi_signal_components(docs).collect()
    }
    jac = minhash_verified_pairs(docs, n=3, threshold=0.5).select(
        "doc_id_a", "doc_id_b"
    )
    sim = simhash_pairs(docs, max_hamming=3).select("doc_id_a", "doc_id_b")
    naive = connected_components(
        docs.select("doc_id"), jac.unionByName(sim).distinct()
    )
    want = {
        (r["doc_id"], r["component"], r["doc_id"] == r["component"])
        for r in naive.collect()
    }
    assert got == want
    assert got  # non-degenerate fixture


def test_bpe_merges_match_sequential_reference(spark, sf_dir):
    """The relational greedy merge (run-parity over match islands) must
    equal the textbook SEQUENTIAL left-to-right fold — the definition it
    re-expresses.  Full trajectory equality on the real corpus, driven
    by an in-test pure-Python BPE."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        BPE_MERGES,
        corpus_bpe_merges,
    )

    got = sorted(
        (r["iter"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in corpus_bpe_merges(spark, sf_dir).collect()
    )

    words = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("explode(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS w")
        .groupBy("w")
        .count()
        .collect()
    )
    types = {r["w"]: list(r["w"]) for r in words}
    freq = {r["w"]: r["count"] for r in words}

    def best():
        c = {}
        for w, toks in types.items():
            f = freq[w]
            for a, b in zip(toks, toks[1:]):
                c[(a, b)] = c.get((a, b), 0) + f
        return min(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))

    want = []
    for r in range(1, BPE_MERGES + 1):
        (lft, rgt), cnt = best()
        want.append((r, lft, rgt, cnt))
        if r == BPE_MERGES:
            break
        for w, toks in types.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == lft and toks[i + 1] == rgt:
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            types[w] = out

    assert got == want  # full trajectory, counts included


def test_bpe_exhausted_corpus_stops_early(spark, tmp_path):
    """A corpus whose words are single symbols has NO adjacent pairs —
    training must return the learnable merges (none, or those found
    before exhaustion) instead of crashing on the argmax of an empty
    relation."""
    import os

    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_bpe_merges,
    )

    d = os.path.join(tmp_path, "single")
    docs = spark.createDataFrame(
        [(0, "a b c a", "en", "s", 7), (1, "b c a", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = corpus_bpe_merges(spark, d).collect()
    assert out == []  # every word is one symbol: nothing to merge

    # two-symbol words: exactly ONE merge is learnable, then exhaustion
    d2 = os.path.join(tmp_path, "pairs")
    docs2 = spark.createDataFrame(
        [(0, "ab ab ab", "en", "s", 8), (1, "ab", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs2.coalesce(1).write.parquet(os.path.join(d2, "documents.parquet"))
    out2 = sorted(corpus_bpe_merges(spark, d2).collect(),
                  key=lambda r: r["iter"])
    assert [(r["merge_left"], r["merge_right"], r["pair_count"]) for r in out2] == [
        ("a", "b", 4)
    ]


def test_bpe_pretrained_encode_matches_inline_and_reuses_artifact(spark, sf_dir):
    """VERDICT r9 #2: the persisted-tokenizer encode must be value-
    identical to the self-contained (retrain-inline) encode — the
    stored segmentation is the training loop's output verbatim — and
    the train-once memo must hand back the SAME warehouse root on the
    second call (no retraining per encode)."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        bpe_tokenizer_warehouse,
        corpus_bpe_encode,
        corpus_bpe_encode_pretrained,
    )

    pre = {
        (r["doc_id"], r["n_words"], r["n_bpe_tokens"])
        for r in corpus_bpe_encode_pretrained(spark, sf_dir).collect()
    }
    inline = {
        (r["doc_id"], r["n_words"], r["n_bpe_tokens"])
        for r in corpus_bpe_encode(spark, sf_dir).collect()
    }
    assert pre == inline and pre

    wh1 = bpe_tokenizer_warehouse(spark, sf_dir)
    wh2 = bpe_tokenizer_warehouse(spark, sf_dir)
    assert wh1.root == wh2.root
    assert wh1.exists("bpe_merges") and wh1.exists("bpe_vocab")
    # the artifact is the tokenizer FILE: merge table rows = trained rounds
    assert wh1.read("bpe_merges").count() > 0


def _seq_bpe_train(freq: dict, rounds: int):
    """In-test sequential reference: train `rounds` BPE merges over a
    word->count dict (same tie rule as the engine)."""
    types = {w: list(w) for w in freq}
    merges = []
    for _ in range(rounds):
        c = {}
        for w, toks in types.items():
            for a, b in zip(toks, toks[1:]):
                c[(a, b)] = c.get((a, b), 0) + freq[w]
        if not c:
            break
        (lft, rgt), _cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((lft, rgt))
        for w in types:
            types[w] = _seq_bpe_apply_one(types[w], lft, rgt)
    return merges


def _seq_bpe_apply_one(toks, lft, rgt):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == lft and toks[i + 1] == rgt:
            out.append(lft + rgt)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def test_bpe_holdout_apply_handles_oov(spark, tmp_path):
    """Held-out application: train on the even half, encode the odd half
    by REPLAYING the stored merges — a word the training half never saw
    must be encoded (merge rules apply to any string), matching the
    sequential reference tokenizer, not dropped like a vocab join
    would."""
    import os

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_bpe_apply_holdout,
    )

    d = os.path.join(tmp_path, "hold")
    docs = spark.createDataFrame(
        [
            (0, "low lower lowest low low", "en", "s", 24),
            (2, "low slowest lower", "en", "s", 17),
            (1, "low slow glow", "en", "s", 13),      # slow/glow OOV-ish
            (3, "newest widest low", "en", "s", 17),  # newest/widest unseen
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in corpus_bpe_apply_holdout(spark, d).collect()
    }

    # sequential reference: train on even docs, replay on odd docs
    train_words = "low lower lowest low low".split() + "low slowest lower".split()
    freq = {}
    for w in train_words:
        freq[w] = freq.get(w, 0) + 1
    merges = _seq_bpe_train(freq, 6)
    want = {}
    for doc_id, text in [(1, "low slow glow"), (3, "newest widest low")]:
        n_toks = 0
        for w in text.split():
            toks = list(w)
            for lft, rgt in merges:
                toks = _seq_bpe_apply_one(toks, lft, rgt)
            n_toks += len(toks)
        want[doc_id] = (len(text.split()), n_toks)
    assert got == want
    # and the OOV words genuinely compress (a learned merge applies
    # inside 'slow'/'glow' via the 'lo'-family rules)
    assert got[1][1] < sum(len(w) for w in "low slow glow".split())


def test_bpe_segment_types_matches_trained_vocab(spark, sf_dir):
    """Replaying the stored merge list over the TRAINING words must
    reproduce the stored vocab segmentation exactly — application and
    training share one rewrite algebra, so a tokenizer shipped as just
    its merge table loses nothing."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        bpe_segment_types,
        bpe_tokenizer_warehouse,
    )

    wh = bpe_tokenizer_warehouse(spark, sf_dir)
    merges = [
        (r["merge_left"], r["merge_right"])
        for r in sorted(
            wh.read("bpe_merges").collect(), key=lambda r: r["iter"]
        )
    ]
    vocab = {r["word"]: r["toks"] for r in wh.read("bpe_vocab").collect()}
    replayed = bpe_segment_types(
        wh.read("bpe_vocab").select("word", "freq"), merges
    )
    got = {r["word"]: r["toks"] for r in replayed.collect()}
    assert got == vocab and got


def test_mix_waterfill_matches_python_reference(spark):
    """The relational waterfill must equal a sequential reference on a
    fixture that exercises saturation, redistribution, and the
    everything-fits case."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        mix_waterfill,
    )

    rows = [("a", 1, 100), ("b", 2, 50), ("c", 3, 900), ("d", 4, 2000)]

    def reference(budget):
        # iterative waterfill with the same integer algebra
        items = sorted(rows, key=lambda r: (r[2] * 1_000_000 // r[1], r[0]))
        pre_avail, pre_w = 0, 0
        W = sum(r[1] for r in rows)
        lam = None
        for src, w, avail in items:
            r = avail * 1_000_000 // w
            test = -1 if pre_avail > budget else (budget - pre_avail) * 1_000_000 // (W - pre_w)
            if test < r:
                lam = test
                break
            pre_avail += avail
            pre_w += w
        out = {}
        for src, w, avail in rows:
            r = avail * 1_000_000 // w
            # max(lam, 0): the engines clamp the exhausted-budget
            # sentinel (-1) at zero before the division (ADVICE r10 —
            # floor vs truncate diverge on negative operands)
            alloc = (
                avail
                if (lam is None or r <= lam)
                else w * max(lam, 0) // 1_000_000
            )
            out[src] = alloc
        return out

    avail = spark.createDataFrame(rows, "source string, w int, avail long")
    for budget in (0, 100, 1000, 2500, 3050, 10_000):
        got = {
            r["source"]: r["alloc_tokens"]
            for r in mix_waterfill(avail, budget).collect()
        }
        assert got == reference(budget), budget
        # allocation never exceeds availability or (within truncation
        # slack ≤ n_sources) the budget
        assert all(got[s] <= a for s, _, a in rows)
        assert sum(got.values()) <= budget + len(rows) or sum(got.values()) == sum(
            a for _, _, a in rows
        )


def test_mix_waterfill_exhausted_budget_clamps_at_zero(spark):
    """The exhausted-budget branch (pre_avail > budget, reachable only
    through truncation slack when w > scale) must allocate ZERO to the
    remaining rows, never a negative allocation: the -1 sentinel water
    level divides differently under Spark div (truncate) and DuckDB //
    (floor), so it is clamped at zero before the division (ADVICE r10).
    scale=1 makes the branch reachable on a tiny fixture."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        mix_waterfill,
    )

    # order by r: ('a', r=0) saturates first consuming 3 > budget 2,
    # so ('b', r=10) hits the pre_avail > budget sentinel branch
    avail = spark.createDataFrame(
        [("a", 5, 3), ("b", 1, 10)], "source string, w int, avail long"
    )
    rows = {
        r["source"]: r for r in mix_waterfill(avail, 2, scale=1).collect()
    }
    # lam = -1 (sentinel): neither row passes r <= lam, so both route
    # through the clamped w * max(lam, 0) branch — 0 each, never -w.
    # The python reference in test_mix_waterfill_matches_python_reference
    # computes the identical max(lam, 0).
    assert rows["a"]["alloc_tokens"] == 0
    assert rows["b"]["alloc_tokens"] == 0
    assert all(r["alloc_tokens"] >= 0 for r in rows.values())


def test_mix_apply_consistent_with_schedule(spark, sf_dir):
    """The applied sample must track its schedule: saturated sources
    keep EVERY document (rate 1e6 is exact, not sampled), unsaturated
    sources keep a subset, and per-source achieved tokens sit within
    binomial range of the allocation (loose 3-sigma-ish band on the
    tiny gate corpus; the report's whole point is making the realized
    mix observable)."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_mix_apply,
    )

    rows = {r["source"]: r for r in corpus_mix_apply(spark, sf_dir).collect()}
    assert rows
    docs_per_src = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n"))
        .collect()
    }
    for src, r in rows.items():
        if r["sampling_rate_x1e6"] == 1_000_000:
            assert r["tokens_selected"] == r["avail_tokens"] == r["alloc_tokens"]
            assert r["n_docs_selected"] == docs_per_src[src]
        else:
            assert r["n_docs_selected"] <= docs_per_src[src]
            assert r["tokens_selected"] <= r["avail_tokens"]


def test_connected_components_subgraph_labels(spark):
    """restore_singletons=False returns exactly the edge-endpoint labels
    the full output carries — the star-compression input
    connected_components_incremental consumes — without the
    singleton-restore join (singletons absent, labeled nodes identical)."""
    nodes = spark.createDataFrame([(i,) for i in range(1, 12)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9)], "doc_id_a long, doc_id_b long"
    )
    full = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    sub = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            nodes, edges, restore_singletons=False
        ).collect()
    }
    assert set(sub) == {1, 2, 3, 5, 6, 9}  # endpoint nodes only
    for k, v in sub.items():
        assert full[k] == v
    for k in set(full) - set(sub):
        assert full[k] == k  # everything omitted is a singleton
