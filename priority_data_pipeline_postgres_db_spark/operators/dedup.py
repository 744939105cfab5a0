"""Deduplication operators for LLM-data pipelines (BASELINE.json north star).

Five dedup families, each designed for 100 TB scale:

- **exact** — hash-groupBy on a normalized fingerprint; one shuffle on the
  fingerprint, deterministic keep-lowest-id survivor (window row_number,
  which also fixes the reference's silent duplicate-append gap on
  incremental loads — SURVEY.md §7 M3).
- **n-gram Jaccard** — exact pairwise similarity *within blocks* (lang,
  source): the classic blocked-dedup layout; the cross product never leaves
  a block so the shuffle is bounded by block size, not corpus size.
- **MinHash LSH** — shingle → 64-way minhash signature → 16 bands × 4 rows
  → bucket join.  All JVM built-ins (xxhash64 + higher-order array
  functions); candidate generation is a self-equi-join on (band, hash),
  the standard linear-scale near-dup path.
- **SimHash** — 64-bit sign-aggregated token-hash fingerprint; Hamming-≤3
  candidate pairs found by 4×16-bit chunk banding (pigeonhole: any pair at
  Hamming distance ≤3 shares at least one exact chunk).
- **embedding cosine** — near-dup pairs above a cosine threshold over the
  embeddings table, computed in *quantized integer* space so the result is
  bit-deterministic across engines (see _quantize).

Determinism notes (for the DuckDB oracle gate): integer math only in the
similarity kernels — dot products of 1e7-quantized vectors stay below 2^53
so even a double-accumulated sum is exact; jaccard = int/int division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.tables import load

# ---------------------------------------------------------------------------
# shared text kernels (all JVM expressions — no Python in the hot path)
# ---------------------------------------------------------------------------


def tokens_expr(col: str = "text") -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    toks = F.split(F.lower(F.col(col)), r"\s+")
    return F.filter(toks, lambda x: x != "")


def ngrams_expr(toks: Column, n: int) -> Column:
    """Distinct word n-grams of a token array (space-joined)."""
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])  # noqa: E731
    return F.array_distinct(F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(F.array()))


def normalized_text(col: str = "text") -> Column:
    """Canonical form for exact dedup: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key: Column, order_col: str, keep_cols: list[str]) -> DataFrame:
    """Keep the lowest-``order_col`` row per ``key``.

    Deterministic alternative to dropDuplicates (which keeps an arbitrary
    row). One shuffle on the fingerprint; at 100 TB prefer this over
    groupBy+join because the window needs no second pass over the data.
    """
    return (
        df.withColumn("_fp", key)
        .withColumn("_rn", F.row_number().over(Window.partitionBy("_fp").orderBy(F.col(order_col))))
        .filter(F.col("_rn") == 1)
        .select(*keep_cols, F.col("_fp").alias("fingerprint"))
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, F.md5(normalized_text()), "doc_id", ["doc_id", "lang", "source"])


# ---------------------------------------------------------------------------
# blocked n-gram Jaccard (exact, oracle-checkable)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_cols: list[str],
    n: int = 2,
    threshold: float = 0.30,
) -> DataFrame:
    """All pairs within a block with word-``n``-gram Jaccard ≥ threshold.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct n-gram sets — integer
    set sizes, so the double division is bit-identical across engines.
    Block-bounded cross join: the quadratic term is per-block, which is the
    scale story (blocks = shuffle partitions; skewed blocks would need a
    size cap — see minhash for the unblocked path).
    """
    g = docs.select(
        "doc_id",
        *block_cols,
        ngrams_expr(tokens_expr(), n).alias("grams"),
    ).filter(F.size("grams") > 0)
    a = g.alias("a")
    b = g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    size_a = F.size(F.col("a.grams"))
    size_b = F.size(F.col("b.grams"))
    jac = inter / (size_a + size_b - inter)
    return (
        a.join(b, [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, ["lang", "source"], n=1, threshold=0.5)


# ---------------------------------------------------------------------------
# MinHash LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_N_HASHES = 64
_BAND_ROWS = 4  # 16 bands


def _affine_params(n: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash function — derived from a fixed LCG so
    runs are reproducible without any RNG state."""
    params = []
    x = 0x9E3779B97F4A7C15
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        # a ≤ 2^29 and the base hash is masked to 31 bits, so a*h+b < 2^62
        # — no long overflow (Spark 4 runs ANSI mode: overflow would THROW,
        # not wrap)
        a = (x % ((1 << 29) - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _MERSENNE
        params.append((a, b))
    return params


def minhash_signature(grams: Column, n_hashes: int = _N_HASHES) -> Column:
    """64-long array: min over shingles of (a_i * xxhash64(s) + b_i) mod p.

    Computed as ONE aggregate pass over the shingles with a 64-wide
    accumulator (zip_with against a literal params array).  The obvious
    formulation — 64 separate array_min(transform(...)) columns — embeds 64
    copies of the whole tokenize→shingle→hash subtree after Catalyst's
    project collapse and ran ~60× slower.
    """
    hashes = F.transform(grams, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF)))
    # (nested-lambda capture of `h` inside zip_with is supported and keeps
    # this a true single pass)
    params = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in _affine_params(n_hashes)
        ]
    )
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), n_hashes)
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, params, lambda m, p: F.least(m, F.pmod(p["a"] * h + p["b"], F.lit(_MERSENNE)))
        ),
    )


def minhash_bands(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → (band_id, band_hash) rows; bucket key for the LSH join."""
    sig = docs.select(
        "doc_id", minhash_signature(ngrams_expr(tokens_expr(), n)).alias("sig")
    ).filter(F.size("sig") > 0)
    # cache() is an optimizer barrier as much as a reuse point: without it
    # CollapseProject inlines the signature expression into each of the 16
    # band hashes (16× recompute), and again into both sides of the LSH
    # self-join.  At cluster scale this is persist(MEMORY_AND_DISK) on the
    # signature table — hash the corpus once, reuse everywhere.
    sig = sig.cache()
    n_bands = _N_HASHES // _BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.hash(F.slice("sig", i * _BAND_ROWS + 1, _BAND_ROWS)).alias("band_hash"),
            )
            for i in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_id", "b.band_hash"
    )


def minhash_candidate_pairs(
    docs: DataFrame, n: int = 3, max_bucket: int = 64
) -> DataFrame:
    """LSH candidate pairs: self-equi-join on (band_id, band_hash).

    ``max_bucket`` caps degenerate buckets (a bucket of k docs costs k²/2
    pairs — at 100 TB an uncapped hot bucket is the classic LSH skew
    failure; capped buckets trade a little recall for bounded work, and AQE
    skew-split handles the moderate ones).
    """
    bands = minhash_bands(docs, n)
    counts = bands.groupBy("band_id", "band_hash").count()
    bands = bands.join(
        F.broadcast(counts.filter(F.col("count") > max_bucket)),
        ["band_id", "band_hash"],
        "left_anti",
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return minhash_candidate_pairs(docs, n=3)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_counts_expr(toks: Column) -> Column:
    """64-wide signed bit-counters for SimHash: one aggregate pass over the
    token hashes, rebuilding the counter array per token (single-pass — see
    minhash_signature for why 64 separate aggregates is 60× slower).
    shiftright takes a literal bit index, hence the Python-side unroll."""
    hashes = F.transform(F.array_distinct(toks), lambda t: F.xxhash64(t))
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.array(
            *[
                F.element_at(acc, b + 1)
                + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)
                for b in range(64)
            ]
        ),
    )


def simhash_pack_expr(counts: Column) -> Column:
    """Counter array → 64-bit fingerprint: bit b set iff counts[b] > 0.
    (shiftleft, not lit(1<<63) — that overflows the signed-long literal.)"""
    out = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(
            F.element_at(counts, b + 1) > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(bit)
    return out


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming-≤k candidate pairs via 16-bit chunk banding (exact for k≤3:
    with 4 chunks, distance ≤3 forces one identical chunk), then exact
    Hamming verify with bit_count(xor)."""
    # two-step with a cache barrier: the pack expression references the
    # counter array 64 times; without the barrier CollapseProject would
    # inline the token-hash aggregate into every reference
    counts = docs.select("doc_id", simhash_counts_expr(tokens_expr()).alias("counts")).cache()
    sh = counts.select("doc_id", simhash_pack_expr(F.col("counts")).alias("simhash"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
            )
            for i in range(4)
        ]
    )
    banded = sh.select("doc_id", "simhash", F.explode(chunks).alias("c")).select(
        "doc_id", "simhash", "c.chunk_id", "c.chunk"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["chunk_id", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=6)


# ---------------------------------------------------------------------------
# embedding cosine near-dup (quantized-exact)
# ---------------------------------------------------------------------------

QUANT = 10_000_000  # 1e7: q*q*64 < 2^53 so double accumulation stays exact


def quantize_expr(col: str = "embedding") -> Column:
    """float vector → bigint vector: floor(x*1e7 + 0.5) (IEEE-deterministic,
    unlike round() whose tie behavior differs between engines)."""
    return F.transform(
        F.col(col), lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long")
    )


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_expr(qa: Column, qb: Column, na: Column, nb: Column) -> Column:
    """cosine from quantized vectors + precomputed self-dots (exact ints →
    identical doubles in any engine)."""
    return dot_expr(qa, qb) / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """O(n²) exact cosine pairs ≥ threshold. The brute-force base path —
    correct at any scale but quadratic; the LSH-bucketed variant in
    operators.similarity is the 100 TB path."""
    q = emb.select(
        "vec_id", quantize_expr().alias("q")
    ).withColumn("norm2", dot_expr(F.col("q"), F.col("q")))
    a = q.alias("a")
    b = q.alias("b")
    cos = cosine_expr(F.col("a.q"), F.col("b.q"), F.col("a.norm2"), F.col("b.norm2"))
    return (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_embedding_pairs": dedup_embedding_pairs,
}

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

ORACLE = {
    "dedup_exact": f"""
        SELECT doc_id, lang, source, fingerprint FROM (
          SELECT doc_id, lang, source, md5({_NORM}) AS fingerprint,
                 row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    "dedup_ngram_jaccard": f"""
        WITH g AS (
          SELECT doc_id, lang, source, list_distinct({_TOKS}) AS grams
          FROM documents
          WHERE len(list_distinct({_TOKS})) > 0
        )
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               len(list_intersect(a.grams, b.grams))
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
                 AS jaccard
        FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.grams, b.grams))
                / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
    """,
    # minhash / simhash use xxhash64 (no DuckDB equivalent) → rows-only.
    "dedup_embedding_pairs": """
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT)) AS qv
          FROM embeddings
        ), n AS (
          SELECT vec_id, qv, list_dot_product(qv, qv) AS norm2 FROM q
        )
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               list_dot_product(a.qv, b.qv) / (sqrt(a.norm2) * sqrt(b.norm2)) AS cosine
        FROM n a, n b
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.qv, b.qv) / (sqrt(a.norm2) * sqrt(b.norm2)) >= 0.35
    """,
}
