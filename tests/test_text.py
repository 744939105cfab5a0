"""Text analysis: token counts, quality score bounds, lang-id heuristic,
fingerprints (functions.text)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.functions.text import (
    bpe_ish_count_expr,
    fingerprint_exprs,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)


def docs(spark, *texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_token_counts(spark):
    df = docs(spark, "Hello,  world! 42 times", "")
    out = df.select("doc_id", token_count_expr().alias("n"), bpe_ish_count_expr().alias("b")).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n"] == 4  # hello,  world!  42  times
    # bpe-ish: hello , world ! 42 times → 6
    assert by_id[0]["b"] == 6
    assert by_id[1]["n"] == 0


def test_quality_score_in_unit_interval(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    comps, score = quality_score_expr()
    stats = (
        d.filter(F.size(F.split(F.col("text"), r"\s+")) > 0)
        .select(score.alias("s"))
        .agg(F.min("s"), F.max("s"))
        .first()
    )
    assert stats[0] is None or stats[0] >= 0.0
    assert stats[1] is None or stats[1] <= 1.0


def test_lang_id_on_natural_sentences(spark):
    df = docs(
        spark,
        "the cat is in the house and it is warm",
        "der Hund ist nicht in das Haus und die Katze",
        "el perro es de la casa y que en un dia",
        "le chat est dans les maisons et une belle que",
    )
    out = {r["doc_id"]: r["p"] for r in df.select("doc_id", lang_id_expr().alias("p")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "fr"


def test_lang_id_no_signal_is_und(spark):
    df = docs(spark, "zzz qqq xxx")
    assert df.select(lang_id_expr().alias("p")).first()["p"] == "und"


def test_fingerprints_bow_vs_norm(spark):
    df = docs(spark, "alpha beta gamma", "gamma  ALPHA beta", "alpha beta delta")
    fps = fingerprint_exprs()
    out = df.select("doc_id", fps["fp_norm"].alias("n"), fps["fp_bow"].alias("b")).collect()
    by_id = {r["doc_id"]: r for r in out}
    # bag-of-words fingerprint is order/case/ws-insensitive
    assert by_id[0]["b"] == by_id[1]["b"]
    assert by_id[0]["b"] != by_id[2]["b"]
    # normalized fingerprint is order-sensitive
    assert by_id[0]["n"] != by_id[1]["n"]


def test_events_anomaly_mad_invariants(spark, sf_dir):
    from priority_data_pipeline_postgres_db_spark.functions.text import events_anomaly_mad

    out = events_anomaly_mad(spark, sf_dir, z=3.0)
    rows = out.collect()
    assert len(rows) > 0  # the synthetic values have tails
    for r in rows:
        # every flagged event truly violates the MAD bound it reports
        assert abs(r["value"] - r["median_value"]) > 3.0 * r["mad"]
        assert r["mad"] > 0
    # flagged set is a small minority
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(rows) < total * 0.2


def test_repetition_score_planted(spark, tmp_path):
    """A doc that is one phrase looped scores near-1 on both signals; a
    diverse doc scores near-0; a <2-token doc is excluded."""
    import os

    from pyspark.sql import Row
    from priority_data_pipeline_postgres_db_spark.functions.text import text_repetition_score

    rows = [
        Row(doc_id=1, text="spam ham " * 20, lang="en", source="s", n_chars=1),
        Row(doc_id=2, text="each word here appears exactly once in this sentence", lang="en", source="s", n_chars=1),
        Row(doc_id=3, text="solo", lang="en", source="s", n_chars=1),
    ]
    d = os.path.join(tmp_path, "docs")
    spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in text_repetition_score(spark, d).collect()}
    assert set(out) == {1, 2}
    # 40 tokens, 2 distinct -> dup 38/40; bigrams: 'spam ham' x20 of 39
    assert abs(out[1]["dup_token_frac"] - 38 / 40) < 1e-12
    assert abs(out[1]["top_bigram_frac"] - 20 / 39) < 1e-12
    assert out[2]["dup_token_frac"] == 0.0
    assert abs(out[2]["top_bigram_frac"] - 1 / 8) < 1e-12


def test_unigram_surprisal_planted(spark):
    """Rare tokens must score higher than common ones; the scaled-integer
    math must equal the hand-computed value."""
    from priority_data_pipeline_postgres_db_spark.functions.text import unigram_surprisal

    docs = spark.createDataFrame(
        [(1, "the the the"), (2, "the rare"), (3, "the the")],
        "doc_id long, text string",
    )
    # counts: the=6, rare=1, N=7
    got = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    surp_the = (1_000_000 * 7) // 6
    surp_rare = (1_000_000 * 7) // 1
    assert got[1]["surprisal"] == surp_the
    assert got[2]["surprisal"] == (surp_the + surp_rare) / 2.0
    assert got[2]["surprisal"] > got[1]["surprisal"]
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 2


def test_bm25_ranks_term_density_and_length(spark):
    """A doc stuffed with query terms outranks a sparse one; between two
    docs with identical tf, the shorter doc wins (length normalization);
    docs with no query term never appear."""
    from priority_data_pipeline_postgres_db_spark.functions.text import bm25_topk

    filler = " ".join(["pad"] * 40)
    docs = spark.createDataFrame(
        [
            (1, "hash join table hash join table"),   # dense, short
            (2, "hash join table " + filler),          # same tf, longer
            (3, "hash " + filler),                     # one term
            (4, filler),                               # no query terms
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bm25_topk(docs, k=10).collect()}
    assert 4 not in got
    assert got[1]["bm25_score"] > got[2]["bm25_score"] > got[3]["bm25_score"]
    assert got[1]["n_matched_terms"] == 3 and got[3]["n_matched_terms"] == 1


def test_bigram_pmi_planted_collocation(spark):
    """A pair of tokens that only ever occur together tops the lift
    ranking; a pair of independently-frequent tokens scores near 1."""
    from priority_data_pipeline_postgres_db_spark.functions.text import bigram_pmi

    # "zq vx" always adjacent (perfect collocation); "aa bb" co-occur but
    # aa and bb also appear independently everywhere else
    rows = [(i, "zq vx aa bb aa cc bb dd aa ee bb ff") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bigram_pmi(docs, min_count=5, k=20).collect()
    assert got[0]["bigram"] == "zq vx"
    by_g = {r["bigram"]: r["lift"] for r in got}
    assert by_g["zq vx"] > by_g["aa bb"] > 0.0


def test_heavy_hitters_rank_and_plan(spark, sf_dir):
    """Top-20 doc-frequency tokens: deterministic total order, and the
    top-k is TakeOrderedAndProject (per-partition heaps), never a global
    sort of the vocabulary."""
    from priority_data_pipeline_postgres_db_spark.functions.text import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hh = heavy_hitters(docs, top=20)
    rows = hh.collect()
    assert len(rows) == 20
    freqs = [r["doc_freq"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert freqs == sorted(freqs, reverse=True)
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(range(1, 21))
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_token_entropy_known_values(spark):
    """Closed-form checks: a constant doc has entropy 0; a all-distinct doc
    has entropy ln(n) and type-token ratio 1."""
    import math

    from priority_data_pipeline_postgres_db_spark.functions.text import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),                 # H = 0, ttr = 1/4
            (2, "a b c d e f g h"),         # H = ln 8, ttr = 1
            (3, "a a b b"),                 # H = ln 2
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert got[1]["entropy_nats"] == 0.0
    assert got[1]["type_token_ratio"] == 0.25
    assert abs(got[2]["entropy_nats"] - round(math.log(8), 4)) < 1e-9
    assert got[2]["type_token_ratio"] == 1.0
    assert abs(got[3]["entropy_nats"] - round(math.log(2), 4)) < 1e-9
    assert got[3]["n_types"] == 2 and got[3]["n_tokens"] == 4


def test_zipf_fit_closed_form(spark):
    """Tiny corpus with known rank/freq pairs: the OLS slope/intercept/r2
    match a numpy reference computed the same closed-form way."""
    import numpy as np

    from priority_data_pipeline_postgres_db_spark.functions.text import zipf_fit

    # freqs: a=6, b=3, c=2, d=1  → ranks 1..4
    docs = spark.createDataFrame(
        [(1, "a a a a a a b b b c c d")], "doc_id long, text string"
    )
    got = zipf_fit(docs, top=4).collect()[0]
    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array([6.0, 3.0, 2.0, 1.0]))
    n = 4.0
    cov = n * (x * y).sum() - x.sum() * y.sum()
    varx = n * (x * x).sum() - x.sum() ** 2
    vary = n * (y * y).sum() - y.sum() ** 2
    assert got["n"] == 4
    assert abs(got["zipf_slope"] - round(cov / varx, 4)) < 1e-9
    assert abs(got["r2"] - round(cov * cov / (varx * vary), 4)) < 1e-9
    assert got["zipf_slope"] < 0 and 0.9 < got["r2"] <= 1.0


def test_zipf_fit_corpus_shape(spark, sf_dir):
    """On the fixture corpus: negative slope, sane r2, exactly top-N rows."""
    from priority_data_pipeline_postgres_db_spark.functions.text import text_zipf_fit

    got = text_zipf_fit(spark, sf_dir).collect()[0]
    # the synthetic fixture's vocab (~31 tokens at sf0.001) is below the
    # top-100 cut; the fit runs over whatever head exists
    assert 0 < got["n"] <= 100
    assert got["zipf_slope"] < 0
    assert 0.0 < got["r2"] <= 1.0


def test_hashed_features_partition_tokens_exactly(spark, sf_dir):
    """Buckets stay in [0, HASH_DIM); per-doc bucket counts sum to the
    doc's token count (the hashing trick loses identity, never mass)."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.functions.text import (
        HASH_DIM,
        text_hashed_features,
    )

    feats = text_hashed_features(spark, sf_dir).collect()
    assert all(0 <= r["bucket"] < HASH_DIM for r in feats)
    per_doc = {}
    for r in feats:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""))
            .alias("n"),
        ).collect()
        if r["n"] > 0
    }
    assert per_doc == truth
