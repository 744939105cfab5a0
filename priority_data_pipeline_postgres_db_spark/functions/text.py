"""Text analysis for LLM-data pipelines: token counting, quality scoring,
language ID, document fingerprinting (BASELINE.json north star).

Everything is JVM-side expression work (split / regexp / array built-ins
inside whole-stage codegen) — no Python UDFs, so these run at scan speed at
100 TB.  Cross-engine determinism: scores are double divisions of integer
counts (bit-identical in any IEEE engine); fingerprints are md5 hex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import normalized_text, tokens_expr
from ..plans.tables import load
from ..util import bounded_cache

# Deliberately ASCII-simple patterns: identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
PUNCT_PATTERN = "[^A-Za-z0-9 ]"

STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "les", "et", "est", "que", "un", "une"],
    "zh": ["de", "le", "shi", "zai", "he", "you", "wo", "ta"],
}


def token_count_expr(toks: Column | None = None) -> Column:
    return F.size(tokens_expr() if toks is None else toks)


def bpe_ish_count_expr(norm: Column | None = None) -> Column:
    """Sub-word-ish token count: letter runs + digit runs + single symbols
    over the normalized text (a regex approximation of BPE pre-tokenization)."""
    norm = normalized_text() if norm is None else norm
    return F.size(F.regexp_extract_all(norm, F.lit(BPE_ISH_PATTERN), 0))


def tokenized(docs: DataFrame, *extra: str) -> DataFrame:
    """Materialized tokenization: (doc_id, *extra, toks, norm, uniq), cached.

    The tokenize/normalize subtrees are higher-order/regex expressions that
    fall outside whole-stage codegen, so Catalyst's project collapse would
    re-evaluate them once per downstream reference (a quality score makes
    ~8 references → 8 tokenizations per row).  The cache is the barrier:
    tokenize once, every metric reads stored arrays.  Repartition first —
    small-file corpora arrive as one partition (see operators.dedup).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par).select(
        "doc_id", *extra, tokens_expr().alias("toks"), normalized_text().alias("norm")
    )
    return bounded_cache(base.withColumn("uniq", F.array_distinct(F.col("toks"))))


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tokenized(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        token_count_expr(F.col("toks")).alias("n_tokens"),
        bpe_ish_count_expr(F.col("norm")).alias("n_bpe_tokens"),
        F.length(F.col("norm")).alias("n_chars_norm"),
    )


def quality_score_expr(
    toks: Column | None = None, norm: Column | None = None
) -> tuple[dict[str, Column], Column]:
    """Length/punctuation/stopword heuristics → [0,1] quality score.

    Components (per document):
    - token length sanity: mean token length in [3, 10] scores high
    - punctuation ratio: symbols / chars (lower is better)
    - stopword ratio: share of tokens in the union stopword list —
      natural text has some; word salad and boilerplate have few/none
    - digit ratio: digits / chars (lower is better)
    """
    toks = tokens_expr() if toks is None else toks
    n_tok = F.size(toks)
    norm = normalized_text() if norm is None else norm
    n_chars = F.length(norm)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    avg_tok_len = tok_chars / F.nullif(n_tok, F.lit(0))
    n_punct = F.size(F.regexp_extract_all(norm, F.lit(PUNCT_PATTERN), 0))
    punct_ratio = n_punct / F.nullif(n_chars, F.lit(0))
    n_digit = F.size(F.regexp_extract_all(norm, F.lit("[0-9]"), 0))
    digit_ratio = n_digit / F.nullif(n_chars, F.lit(0))
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in all_stops])))
    stop_ratio = n_stop / F.nullif(F.size(F.array_distinct(toks)), F.lit(0))
    comps = {
        "n_tokens": n_tok,
        "avg_token_len": avg_tok_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stop_ratio": stop_ratio,
    }
    len_ok = F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        len_ok * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(digit_ratio * 5, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 10, F.lit(1.0)) * 0.2
    )
    return comps, score


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tokenized(load(spark, sf_dir, "documents"))
    comps, score = quality_score_expr(F.col("toks"), F.col("norm"))
    return docs.filter(F.size("toks") > 0).select(
        "doc_id",
        comps["n_tokens"].alias("n_tokens"),
        comps["avg_token_len"].alias("avg_token_len"),
        comps["punct_ratio"].alias("punct_ratio"),
        comps["stop_ratio"].alias("stop_ratio"),
        score.alias("quality_score"),
    )


def lang_scores_expr(uniq: Column | None = None) -> dict[str, Column]:
    """Per-language score: distinct-token overlap with the language's
    stopword list (an n-gram-free heuristic langid)."""
    uniq = F.array_distinct(tokens_expr()) if uniq is None else uniq
    return {
        lang: F.size(F.array_intersect(uniq, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in sorted(STOPWORDS.items())
    }


def lang_id_expr(uniq: Column | None = None) -> Column:
    """argmax over language scores; ties resolved alphabetically (the CASE
    chain checks languages in sorted order against the running max)."""
    scores = lang_scores_expr(uniq)
    mx = F.greatest(*scores.values())
    out = F.lit("und")
    expr = None
    for lang in sorted(scores):
        cond = scores[lang] == mx
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return F.when(mx == 0, F.lit("und")).otherwise(expr.otherwise(F.lit("und")))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tokenized(load(spark, sf_dir, "documents"), "lang")
    return docs.select("doc_id", "lang", lang_id_expr(F.col("uniq")).alias("lang_pred"))


def fingerprint_exprs(
    norm: Column | None = None, uniq: Column | None = None
) -> dict[str, Column]:
    """Document fingerprints:
    - fp_norm: md5 of the normalized text (exact-dup key)
    - fp_bow: md5 of the sorted distinct token bag (order-insensitive —
      catches shuffled/re-ordered copies)"""
    norm = normalized_text() if norm is None else norm
    uniq = F.array_distinct(tokens_expr()) if uniq is None else uniq
    return {
        "fp_norm": F.md5(norm),
        "fp_bow": F.md5(F.concat_ws(" ", F.array_sort(uniq))),
    }


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tokenized(load(spark, sf_dir, "documents"))
    fps = fingerprint_exprs(F.col("norm"), F.col("uniq"))
    return docs.select("doc_id", fps["fp_norm"].alias("fp_norm"), fps["fp_bow"].alias("fp_bow"))


QUERIES = {
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
}

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_UNIQ = f"list_distinct({_TOKS})"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_ALL_STOPS = _sql_list(sorted({w for ws in STOPWORDS.values() for w in ws}))
_LANG_SCORE = {
    lang: f"len(list_intersect({_UNIQ}, {_sql_list(ws)}))" for lang, ws in sorted(STOPWORDS.items())
}
_MX = "greatest(" + ", ".join(_LANG_SCORE[lang] for lang in sorted(STOPWORDS)) + ")"
_LANG_CASE = (
    "CASE WHEN " + _MX + " = 0 THEN 'und' "
    + " ".join(f"WHEN {_LANG_SCORE[lang]} = {_MX} THEN '{lang}'" for lang in sorted(STOPWORDS))
    + " ELSE 'und' END"
)

ORACLE = {
    "text_token_count": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all({_NORM}, '{BPE_ISH_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
               CAST(length({_NORM}) AS INTEGER) AS n_chars_norm
        FROM documents
    """,
    "text_quality_score": f"""
        WITH t AS (
          SELECT doc_id,
            CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
            CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS INTEGER) AS tok_chars,
            CAST(length({_NORM}) AS INTEGER) AS n_chars,
            CAST(len(regexp_extract_all({_NORM}, '{PUNCT_PATTERN}')) AS INTEGER) AS n_punct,
            CAST(len(regexp_extract_all({_NORM}, '[0-9]')) AS INTEGER) AS n_digit,
            CAST(len(list_intersect({_UNIQ}, {_ALL_STOPS})) AS INTEGER) AS n_stop,
            CAST(len({_UNIQ}) AS INTEGER) AS n_uniq
          FROM documents
          WHERE len({_TOKS}) > 0
        )
        SELECT doc_id, n_tokens,
          tok_chars / nullif(n_tokens, 0) AS avg_token_len,
          n_punct / nullif(n_chars, 0) AS punct_ratio,
          n_stop / nullif(n_uniq, 0) AS stop_ratio,
          (CASE WHEN tok_chars / nullif(n_tokens, 0) >= 3
                 AND tok_chars / nullif(n_tokens, 0) <= 10 THEN 1.0 ELSE 0.0 END) * 0.4
          + (1.0 - least(n_punct / nullif(n_chars, 0) * 5, 1.0)) * 0.2
          + (1.0 - least(n_digit / nullif(n_chars, 0) * 5, 1.0)) * 0.2
          + least(n_stop / nullif(n_uniq, 0) * 10, 1.0) * 0.2 AS quality_score
        FROM t
    """,
    "text_lang_id": f"""
        SELECT doc_id, lang, {_LANG_CASE} AS lang_pred FROM documents
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               md5({_NORM}) AS fp_norm,
               md5(array_to_string(list_sort({_UNIQ}), ' ')) AS fp_bow
        FROM documents
    """,
}


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-document top-k salient terms by tf × (N/df).

    The idf factor is the raw rarity ratio N/df rather than log(N/df):
    rank-equivalent per document (log is monotone), and — unlike log, whose
    libm rounding differs across engines — int/int double division is
    bit-exact against the SQL oracle.  Shape: explode → two grouped
    aggregations (map-side combined) → broadcast join of the small df table
    → per-doc window top-k.  At 100 TB the df table is vocabulary-sized
    (≪ corpus); the only big shuffle is the (doc, term) tf aggregation.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    par = spark.sparkContext.defaultParallelism
    terms = docs.repartition(par).select(
        "doc_id", F.explode(tokens_expr()).alias("term")
    )
    # cache barrier: tf feeds BOTH the df rollup and the scored join —
    # without it the explode+groupBy subtree executes twice (Catalyst
    # doesn't share subplans across actions).  At warehouse scale use
    # persist(MEMORY_AND_DISK) — (doc, term) can exceed executor memory.
    tf = bounded_cache(terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_tbl), "term").withColumn(
        "score", F.col("tf") * (F.lit(n_docs) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", F.col("rank").cast("int").alias("rank"))
    )


QUERIES["text_tfidf_top_terms"] = text_tfidf_top_terms

ORACLE["text_tfidf_top_terms"] = f"""
    WITH terms AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, score, CAST(rank AS INTEGER) AS rank FROM (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             tf.tf * ((SELECT n_docs FROM n) / dfreq.df) AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ((SELECT n_docs FROM n) / dfreq.df) DESC,
                                         tf.term ASC) AS rank
      FROM tf JOIN dfreq USING (term)
    ) WHERE rank <= 3
"""


def events_anomaly_mad(spark: SparkSession, sf_dir: str, z: float = 3.0) -> DataFrame:
    """Robust per-key anomaly detection via applyInPandas (grouped map):
    flag events whose value deviates from the user's median by more than
    ``z`` × MAD.  Exact medians per group are the textbook grouped-map
    case — a built-in exact median needs a full sort per group anyway, and
    the pandas kernel gets the whole group as one frame (groups are
    per-user sized, never corpus-sized, so the Python boundary is safe at
    scale).  Oracle-checked: numpy's even-count median interpolation
    ((a+b)/2) matches DuckDB's ``median``/``mad`` bit-for-bit on this
    data (verified exhaustively per user at sf0.01), so the driver gets a
    full hash-match instead of rows-only.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..plans.tables import load

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("median_value", T.DoubleType()),
            T.StructField("mad", T.DoubleType()),
        ]
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        med = float(np.median(pdf["value"]))
        mad = float(np.median(np.abs(pdf["value"] - med)))
        if mad == 0.0:
            return pdf.iloc[0:0][["user_id", "event_id", "value"]].assign(
                median_value=0.0, mad=0.0
            )
        mask = np.abs(pdf["value"] - med) > z * mad
        out = pdf.loc[mask, ["user_id", "event_id", "value"]].copy()
        out["median_value"] = med
        out["mad"] = mad
        return out

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return ev.groupBy("user_id").applyInPandas(per_user, out_schema)


def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-token fraction and the
    mass of the single most frequent bigram — the standard filters for
    looping/boilerplate text.

    Shape: token fractions are pure expressions; the bigram signal is one
    explode → (doc, gram) count → per-doc max/sum — two partial-agg
    shuffles on doc_id, no joins between docs.  All integer counts until
    the final division (engine-identical doubles).
    """
    from ..operators.dedup import ngrams_expr, tokens_expr

    docs = tokenized(load(spark, sf_dir, "documents")).filter(F.size("toks") >= 2)
    tok_stats = docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (
            (F.size("toks") - F.size("uniq")) / F.size("toks").cast("double")
        ).alias("dup_token_frac"),
    )
    bigrams = docs.select(
        "doc_id", F.explode(ngrams_expr(F.col("toks"), 2, distinct=False)).alias("g")
    )
    per_doc = (
        bigrams.groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top"), F.sum("count").alias("total"))
        .select(
            "doc_id", (F.col("top") / F.col("total").cast("double")).alias("top_bigram_frac")
        )
    )
    return tok_stats.join(per_doc, "doc_id")


QUERIES["text_repetition_score"] = text_repetition_score

ORACLE["text_repetition_score"] = f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE len({_TOKS}) >= 2
    ), b AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                 i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS g
      FROM d
    ), c AS (
      SELECT doc_id, g, count(*) AS n FROM b GROUP BY doc_id, g
    ), p AS (
      SELECT doc_id, CAST(max(n) AS BIGINT) AS top, CAST(sum(n) AS BIGINT) AS total
      FROM c GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           (len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE)
             AS dup_token_frac,
           p.top / CAST(p.total AS DOUBLE) AS top_bigram_frac
    FROM d JOIN p ON p.doc_id = d.doc_id
"""


QUERIES["events_anomaly_mad"] = events_anomaly_mad

ORACLE["events_anomaly_mad"] = """
    WITH stats AS (
      SELECT user_id, median(value) AS med, mad(value) AS madv
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, e.value, s.med AS median_value, s.madv AS mad
    FROM events e JOIN stats s USING (user_id)
    WHERE s.madv > 0 AND abs(e.value - s.med) > 3.0 * s.madv
"""


# ---------------------------------------------------------------------------
# unigram-LM surprisal (perplexity-style quality signal)
# ---------------------------------------------------------------------------


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-doc mean unigram surprisal — the classic LM-based quality
    filter (KenLM-perplexity stand-in), engine-exact.

    Model: corpus unigram frequencies.  A token's surprisal is 1/p(tok) =
    N/c(tok), kept in integer space as ``(1e6·N) div c`` (BIGINT floor
    division — bit-exact in any engine; exact while N < 2^63/1e6 ≈ 9.2e12
    tokens, beyond which split into ``(N div c)·1e6 + ((N mod c)·1e6) div
    c``).  The doc score is the per-doc mean — ONE double division at the
    end, deterministic.

    Scale shape: two shuffles (global token counts; per-doc sum) plus the
    token join.  The counts side is vocabulary-sized — AQE broadcasts it
    when small; the probe-side join key is Zipf-skewed, which AQE's skew
    join splits.  High-frequency heads dominate c, so no salting needed on
    the counts aggregation (partial aggregation absorbs the hot keys
    map-side)."""
    from ..operators.dedup import tokens_expr

    ex = docs.select("doc_id", F.explode(tokens_expr()).alias("tok"))
    counts = ex.groupBy("tok").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("n_total"))
    scored = (
        ex.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr("(CAST(1000000 AS BIGINT) * n_total) div c").alias("surp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum("surp").cast("double") / F.count("*").cast("double")).alias(
            "surprisal"
        ),
    )


def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_surprisal(load(spark, sf_dir, "documents"))


QUERIES["text_unigram_surprisal"] = text_unigram_surprisal

ORACLE["text_unigram_surprisal"] = f"""
    WITH ex AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), counts AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM ex GROUP BY tok
    ), total AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM counts
    ), scored AS (
      SELECT doc_id, (CAST(1000000 AS BIGINT) * n_total) // c AS surp
      FROM ex JOIN counts USING (tok) CROSS JOIN total
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(CAST(SUM(surp) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS surprisal
    FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# n-gram novelty (incremental-crawl dedup signal)
# ---------------------------------------------------------------------------

NOVELTY_N = 3


def ngram_novelty(docs: DataFrame, n: int = NOVELTY_N) -> DataFrame:
    """Per-doc novelty: the fraction of its distinct word n-grams whose
    FIRST corpus occurrence (min doc_id) is this doc — the signal an
    incremental crawl uses to drop near-copies of already-ingested
    content without pairwise comparison.

    Two shuffles: distinct (doc, gram) pairs, then min-doc per gram joined
    back (gram-keyed — Zipf-skewed, AQE splits); the score is one integer
    ratio → a single double division."""
    from ..operators.dedup import ngrams_expr, tokens_expr

    grams = docs.select(
        "doc_id", F.explode(ngrams_expr(tokens_expr(), n)).alias("gram")
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            (
                F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
                .cast("double")
                / F.count("*").cast("double")
            ).alias("novelty"),
        )
    )


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty(load(spark, sf_dir, "documents"))


QUERIES["text_ngram_novelty"] = text_ngram_novelty

ORACLE["text_ngram_novelty"] = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(range(0, len(t) - {NOVELTY_N - 1}),
                 i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gram
        FROM toks WHERE len(t) >= {NOVELTY_N}
      )
    ), first AS (
      SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty
    FROM grams g JOIN first f USING (gram)
    GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (fixed-query top-k)
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ["hash", "join", "table"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str] = BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 document scoring against a fixed query-term set, global top-k.

    Lucene-flavored idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — always
    positive, so stopword-frequent terms can't flip document ranks with
    negative contributions.  Shape at scale: tokenize → filter to the
    query-term rows BEFORE the (doc, term) shuffle (only matching-term
    rows ever shuffle, a vocabulary-sized fraction of the corpus), tiny
    per-term df table broadcast, document length from the tokenized
    scan, global top-k as TakeOrderedAndProject (no full sort).  The
    score is rounded at 4 decimals — ln() may differ in the last ulp
    across engines — and ties break on doc_id, so the top-k cut is
    deterministic and oracle-stable.  The per-document reduction folds
    the term scores in SORTED order (array_sort → left fold, mirrored as
    list_sort → list_aggregate in the oracle) instead of F.sum's
    partition-dependent order, so the pre-rounding double is bit-stable
    however Spark schedules the rows (ADVICE r2: an unordered sum within
    an ulp of a rounding boundary could flip the top-k cut).
    """
    toks = tokenized(docs)
    # dl/avgdl from exact integer token counts; int->double conversion and
    # one division are bit-identical across IEEE engines.
    dl = bounded_cache(toks.select("doc_id", F.size("toks").alias("dl")))
    tot, n_docs = dl.agg(
        F.sum("dl").cast("long"), F.count("*").cast("long")
    ).first()
    avgdl = tot / n_docs
    matches = toks.select(
        "doc_id", F.explode("toks").alias("term")
    ).filter(F.col("term").isin(query_terms))
    tf = matches.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .withColumn("term_score", idf * tf_norm)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_matched_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("term_score")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            )
            .cast("decimal(18,4)")
            .cast("double")
            .alias("bm25_score"),
        )
    )
    return scored.orderBy(F.desc("bm25_score"), F.asc("doc_id")).limit(k)


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load(spark, sf_dir, "documents"))


QUERIES["text_bm25_topk"] = text_bm25_topk

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

ORACLE["text_bm25_topk"] = f"""
    WITH dl AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
    ), stats AS (
      SELECT CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS BIGINT) AS avgdl,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM dl
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
      ) WHERE term IN ({_BM25_TERMS_SQL})
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    )
    SELECT * FROM (
      SELECT tf.doc_id AS doc_id,
             CAST(count(*) AS INTEGER) AS n_matched_terms,
             CAST(sum(tf.tf) AS BIGINT) AS total_tf,
             CAST(CAST(round(list_aggregate(list_sort(list(
               ln(1.0 + (CAST((SELECT n_docs FROM stats) AS DOUBLE) - tf.df + 0.5)
                          / (tf.df + 0.5))
               * ((tf.tf * {BM25_K1 + 1.0!r}) / (tf.tf + {BM25_K1!r}
                  * ({1.0 - BM25_B!r} + {BM25_B!r} * dl.dl / (SELECT avgdl FROM stats))))
             )), 'sum'), 4) AS DECIMAL(18,4)) AS DOUBLE) AS bm25_score
      FROM (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df FROM tf JOIN dfreq USING (term)) tf
      JOIN dl ON tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
    )
    ORDER BY bm25_score DESC, doc_id ASC
    LIMIT {BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# bigram PMI collocations (corpus-level)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOPK = 50


def bigram_pmi(docs: DataFrame, min_count: int = PMI_MIN_COUNT, k: int = PMI_TOPK) -> DataFrame:
    """Corpus-level collocation extraction: top-k adjacent-token bigrams
    by PMI lift, with a minimum-support filter.

    The reported ``lift`` is the raw probability ratio
    p(xy) / (p(x)·p(y)) rather than its log (= PMI): ln is monotone, so
    the ranking is identical, and the ratio is pure int→double divisions
    in a fixed order — bit-exact across engines where libm log is not
    (the tf-idf operator makes the same trade, text.py:245).

    Shape at scale: two corpus-wide counts (unigram, bigram — each one
    partial-agg shuffle on the gram), the two scalar totals ride the same
    aggregations, and the unigram table joins in twice via broadcast
    (vocabulary-sized ≪ corpus; at web scale with unbounded vocab swap to
    a shuffle join on the term — same plan shape, still no doc×doc work).
    Top-k is TakeOrderedAndProject with a (lift, bigram) tie-break."""
    from ..operators.dedup import ngrams_expr

    toks = tokenized(docs)
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    uni = bounded_cache(uni)  # barrier: feeds the N scalar and both join sides
    n_uni = uni.agg(F.sum("c")).first()[0]
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(F.explode(ngrams_expr(F.col("toks"), 2, distinct=False)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c_xy"))
    )
    bi = bounded_cache(bi)  # barrier: feeds the M scalar and the scored join
    n_bi = bi.agg(F.sum("c_xy")).first()[0]
    w12 = F.split(F.col("g"), " ")
    scored = (
        bi.filter(F.col("c_xy") >= min_count)
        .withColumn("w1", w12.getItem(0))
        .withColumn("w2", w12.getItem(1))
        .join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))), "w2")
        .withColumn(
            "lift",
            (F.col("c_xy").cast("double") / F.lit(float(n_bi)))
            / (
                (F.col("c_x").cast("double") / F.lit(float(n_uni)))
                * (F.col("c_y").cast("double") / F.lit(float(n_uni)))
            ),
        )
        .select(F.col("g").alias("bigram"), "c_xy", "c_x", "c_y", "lift")
    )
    return scored.orderBy(F.desc("lift"), F.asc("bigram")).limit(k)


def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_pmi(load(spark, sf_dir, "documents"))


QUERIES["text_bigram_pmi"] = text_bigram_pmi

ORACLE["text_bigram_pmi"] = f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(toks) AS w FROM d
      ) GROUP BY w
    ), totals AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni
    ), b AS (
      SELECT unnest(list_transform(range(1, len(toks)),
               i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS g
      FROM d WHERE len(toks) >= 2
    ), cxy AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c_xy FROM b GROUP BY g
    ), btot AS (
      SELECT CAST(sum(c_xy) AS BIGINT) AS n_bi FROM cxy
    )
    SELECT * FROM (
      SELECT cxy.g AS bigram, cxy.c_xy, u1.c AS c_x, u2.c AS c_y,
             (CAST(cxy.c_xy AS DOUBLE) / CAST((SELECT n_bi FROM btot) AS DOUBLE))
             / ((CAST(u1.c AS DOUBLE) / CAST((SELECT n_uni FROM totals) AS DOUBLE))
                * (CAST(u2.c AS DOUBLE) / CAST((SELECT n_uni FROM totals) AS DOUBLE)))
               AS lift
      FROM cxy
      JOIN uni u1 ON u1.w = string_split(cxy.g, ' ')[1]
      JOIN uni u2 ON u2.w = string_split(cxy.g, ' ')[2]
      WHERE cxy.c_xy >= {PMI_MIN_COUNT}
    )
    ORDER BY lift DESC, bigram ASC
    LIMIT {PMI_TOPK}
"""


# ---------------------------------------------------------------------------
# corpus heavy hitters (document frequency)
# ---------------------------------------------------------------------------

HH_TOPK = 20


def heavy_hitters(docs: DataFrame, top: int = HH_TOPK) -> DataFrame:
    """Top tokens by DOCUMENT frequency — the corpus-profiling companion to
    BM25/tf-idf (boilerplate and template phrases surface as tokens whose
    doc-frequency approaches the corpus size; a training pipeline watches
    this list to catch scrapes gone wrong).

    Scale shape: explode(distinct tokens) → one groupBy shuffle bounded by
    VOCABULARY (map-side combine collapses per-partition duplicates), then
    the top-k is ``orderBy(...).limit(top)`` — Catalyst plans
    TakeOrderedAndProject (per-partition heap of ``top`` rows + driver
    merge), never a global sort of the vocab.  Ranks are attached after
    the limit, a window over ``top`` rows.  Deterministic total order:
    (doc_freq desc, token asc).
    """
    toks = docs.select(
        F.explode(F.array_distinct(tokens_expr())).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("doc_freq"))
    top_rows = counts.orderBy(F.desc("doc_freq"), F.asc("token")).limit(top)
    w = Window.orderBy(F.desc("doc_freq"), F.asc("token"))
    return top_rows.withColumn("rank", F.row_number().over(w))


def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(load(spark, sf_dir, "documents"))


QUERIES["text_heavy_hitters"] = text_heavy_hitters

ORACLE["text_heavy_hitters"] = f"""
    SELECT token, doc_freq,
           CAST(row_number() OVER (ORDER BY doc_freq DESC, token ASC) AS INTEGER) AS rank
    FROM (
      SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
      FROM (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents)
      GROUP BY token
    )
    ORDER BY doc_freq DESC, token ASC
    LIMIT {HH_TOPK}
"""


# ---------------------------------------------------------------------------
# token-distribution entropy (lexical-diversity quality signal)
# ---------------------------------------------------------------------------


def token_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy (nats) of the token distribution plus
    type-token ratio — the lexical-diversity signals the heuristic quality
    score can't see: keyword-stuffed spam and looped generations have LOW
    entropy at normal length/punctuation ratios, while encrypted or
    mojibake blobs max it out.  Both ends of the entropy range are filter
    targets in corpus curation.

    Entropy is computed as ``ln(n) − (Σ c·ln c)/n`` from per-token counts
    ``c`` — one (doc, token) groupBy bounded by tokens (map-side combine),
    then one per-doc groupBy.  Cross-engine determinism: the only float
    hazards are ln() (last-ulp differences) and summation order, so the
    per-token ``c·ln c`` terms are folded in SORTED order (array_sort →
    left fold, mirrored as list_sort → list_aggregate) and the result is
    rounded at 4 decimals through a decimal cast — the same discipline
    ``text_bm25_topk`` uses.  ``type_token_ratio`` is one int/int double
    division, bit-exact in any IEEE engine.
    """
    toks = tokenized(docs)
    tf = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    clogc = F.col("c").cast("double") * F.log(F.col("c").cast("double"))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.aggregate(
            F.array_sort(F.collect_list(clogc)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("clogc_sum"),
    )
    n_dbl = F.col("n_tokens").cast("double")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        (F.col("n_types").cast("double") / n_dbl).alias("type_token_ratio"),
        F.round(F.log(n_dbl) - F.col("clogc_sum") / n_dbl, 4)
        .cast("decimal(18,4)")
        .cast("double")
        .alias("entropy_nats"),
    )


def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_entropy(load(spark, sf_dir, "documents"))


ZIPF_TOPN = 100


def zipf_fit(docs: DataFrame, top: int = ZIPF_TOPN) -> DataFrame:
    """Zipf-law fit over the corpus token-frequency distribution: OLS slope
    of ln(freq) against ln(rank) over the top-``top`` tokens, plus the fit
    r² — the corpus-health fingerprint (natural language runs slope ≈ −1;
    template/boilerplate-heavy corpora flatten the head, mojibake or
    deduplicated-token soup steepens it, and a collapsing r² means the
    distribution isn't Zipfian at all — all cheap red flags before
    training).

    Scale shape: one vocabulary-bounded groupBy (map-side combine), top-k
    via TakeOrderedAndProject (per-partition heaps, no vocab-wide sort),
    then closed-form OLS over ``top`` rows — the five regression sums fold
    collected lists in SORTED order so the doubles are schedule-stable, and
    the outputs are rounded at 4 decimals through decimal casts (the
    ``text_bm25_topk`` discipline).  Ranking ties break on token, so
    ranks — and hence the fit — are engine-deterministic.
    """
    counts = (
        docs.select(F.explode(tokens_expr()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    ranked = (
        counts.orderBy(F.desc("freq"), F.asc("token"))
        .limit(top)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), F.asc("token")))
            .alias("rank"),
            "freq",
        )
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))

    def ssum(col: Column, alias: str) -> Column:
        return F.aggregate(
            F.array_sort(F.collect_list(col)), F.lit(0.0), lambda a, v: a + v
        ).alias(alias)

    sums = ranked.agg(
        F.count("*").cast("long").alias("n"),
        ssum(x, "sx"),
        ssum(y, "sy"),
        ssum(x * y, "sxy"),
        ssum(x * x, "sxx"),
        ssum(y * y, "syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")

    def r4(col: Column, alias: str) -> Column:
        return (
            F.round(col, 4).cast("decimal(18,4)").cast("double").alias(alias)
        )

    return sums.select(
        "n",
        r4(cov / varx, "zipf_slope"),
        r4((F.col("sy") - (cov / varx) * F.col("sx")) / n, "intercept"),
        r4((cov * cov) / (varx * vary), "r2"),
    )


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zipf_fit(load(spark, sf_dir, "documents"))


QUERIES["text_token_entropy"] = text_token_entropy
QUERIES["text_zipf_fit"] = text_zipf_fit

ORACLE["text_zipf_fit"] = f"""
    WITH counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKS}) AS token FROM documents)
      GROUP BY token
    ), ranked AS (
      SELECT CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
                  AS BIGINT) AS rank, freq
      FROM counts
      ORDER BY freq DESC, token ASC
      LIMIT {ZIPF_TOPN}
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             list_aggregate(list_sort(list(ln(CAST(rank AS DOUBLE)))), 'sum') AS sx,
             list_aggregate(list_sort(list(ln(CAST(freq AS DOUBLE)))), 'sum') AS sy,
             list_aggregate(list_sort(list(
               ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE)))), 'sum') AS sxy,
             list_aggregate(list_sort(list(
               ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)))), 'sum') AS sxx,
             list_aggregate(list_sort(list(
               ln(CAST(freq AS DOUBLE)) * ln(CAST(freq AS DOUBLE)))), 'sum') AS syy
      FROM ranked
    )
    SELECT n,
           CAST(CAST(round(
             (CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx), 4)
             AS DECIMAL(18,4)) AS DOUBLE) AS zipf_slope,
           CAST(CAST(round(
             (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
               / CAST(n AS DOUBLE), 4)
             AS DECIMAL(18,4)) AS DOUBLE) AS intercept,
           CAST(CAST(round(
             ((CAST(n AS DOUBLE) * sxy - sx * sy)
               * (CAST(n AS DOUBLE) * sxy - sx * sy))
               / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                  * (CAST(n AS DOUBLE) * syy - sy * sy)), 4)
             AS DECIMAL(18,4)) AS DOUBLE) AS r2
    FROM sums
"""

ORACLE["text_token_entropy"] = f"""
    WITH tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS type_token_ratio,
           CAST(CAST(round(
             ln(CAST(sum(c) AS DOUBLE))
             - list_aggregate(list_sort(list(
                 CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))), 'sum')
                 / CAST(sum(c) AS DOUBLE),
             4) AS DECIMAL(18,4)) AS DOUBLE) AS entropy_nats
    FROM tf GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# hashing-trick features (fixed-width sparse text features)
# ---------------------------------------------------------------------------

HASH_DIM = 16  # feature buckets; production classifiers use 2^18-2^20


def text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick unigram features in long form: (doc_id, bucket,
    n_tokens) where bucket = md5-60(token) mod HASH_DIM — the input every
    lightweight quality/toxicity/language classifier trains on without a
    vocabulary (Weinberger et al. 2009).  Long form beats a fixed-width
    array column at scale: rows are sparse (absent buckets cost nothing),
    aggregations stay partial-agg shuffles, and downstream pivots to
    wide only at the (small) model boundary.

    One explode + one (doc_id, bucket) groupBy — the bucket key is the
    same engine-portable md5-60 every hash family here uses, so the
    whole featurization replays in the oracle."""
    ex = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens_expr()).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long") % HASH_DIM
    )
    return (
        ex.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("n_tokens"))
    )


QUERIES["text_hashed_features"] = text_hashed_features

ORACLE["text_hashed_features"] = f"""
    SELECT doc_id,
           ('0x' || substr(md5(tok), 1, 15))::BIGINT % {HASH_DIM} AS bucket,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
    GROUP BY doc_id, bucket
"""
