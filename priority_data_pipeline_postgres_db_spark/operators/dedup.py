"""Deduplication operators for LLM-data pipelines (BASELINE.json north star).

Five dedup families, each designed for 100 TB scale:

- **exact** — hash-groupBy on a normalized fingerprint; one shuffle on the
  fingerprint, deterministic keep-lowest-id survivor (window row_number,
  which also fixes the reference's silent duplicate-append gap on
  incremental loads — SURVEY.md §7 M3).
- **n-gram Jaccard** — exact pairwise similarity *within blocks* (lang,
  source): the classic blocked-dedup layout; the cross product never leaves
  a block so the shuffle is bounded by block size, not corpus size.
- **MinHash LSH** — shingle → 64-way minhash signature (Arrow-batched
  numpy kernel over an md5-based shingle hash both engines share) → 16
  bands × 4 rows → bucket join; candidate generation is a self-equi-join
  on (band, key), the standard linear-scale near-dup path.
- **SimHash** — 60-bit sign-aggregated token-hash fingerprint; Hamming-≤3
  candidate pairs found by 4×15-bit chunk banding (pigeonhole: any pair at
  Hamming distance ≤3 shares at least one exact chunk).
- **embedding cosine** — near-dup pairs above a cosine threshold over the
  embeddings table, computed in *quantized integer* space so the result is
  bit-deterministic across engines (see _quantize).

Determinism notes (for the DuckDB oracle gate): integer math only in the
similarity kernels — dot products of 1e7-quantized vectors stay below 2^53
so even a double-accumulated sum is exact; jaccard = int/int division.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..plans.tables import load
from ..util import bounded_cache

# ---------------------------------------------------------------------------
# shared text kernels (all JVM expressions — no Python in the hot path)
# ---------------------------------------------------------------------------


def tokens_expr(col: str = "text") -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    toks = F.split(F.lower(F.col(col)), r"\s+")
    return F.filter(toks, lambda x: x != "")


def ngrams_expr(toks: Column, n: int, *, distinct: bool = True) -> Column:
    """Word n-grams of a token array (space-joined), distinct by default
    (set ``distinct=False`` where frequency matters, e.g. repetition
    scoring).

    ``toks`` is bound to a lambda variable via transform(array(toks), ...)
    so the tokenize subtree evaluates ONCE per row: referencing the raw
    column expression from inside the per-shingle lambda would re-evaluate
    it for every element_at — 3n tokenizations per document (measured 50×
    slowdown on the shingle stage).
    """
    if n == 1:
        return F.array_distinct(toks) if distinct else toks

    def grams_of(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(t) - n)
        gram = lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)])  # noqa: E731
        return F.when(F.size(t) >= n, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )

    bound = F.transform(F.array(toks), grams_of)
    grams = F.element_at(bound, 1)
    return F.array_distinct(grams) if distinct else grams


def normalized_text(col: str = "text") -> Column:
    """Canonical form for exact dedup: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


# ---------------------------------------------------------------------------
# quadratic-kernel guard
# ---------------------------------------------------------------------------


class QuadraticScaleError(ValueError):
    """Raised when an O(n²) kernel is pointed at a table above its scope."""


def _guard_quadratic(
    df: DataFrame, max_rows: int | None, op_name: str, alternative: str
) -> None:
    """Enforce the verify-stage/small-table scope of the quadratic kernels
    in code, not just docstrings (VERDICT r3 #5).  The probe is
    ``limit(max_rows+1).count()`` — it stops scanning the moment the limit
    is exceeded, so on a full 100 TB corpus the guard costs a bounded
    prefix read, not a count of the table it is refusing to process.
    ``max_rows=None`` opts out for callers who know the input is a bounded
    candidate subset."""
    if max_rows is None:
        return
    if df.limit(max_rows + 1).count() > max_rows:
        raise QuadraticScaleError(
            f"{op_name} is an O(n²) kernel scoped to verify-stage / "
            f"small-table use: input exceeds max_rows={max_rows:,}. "
            f"For full-corpus dedup use {alternative}; to run anyway on a "
            "known-bounded subset pass max_rows=None or a higher limit."
        )


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
    max_block: int = 10_000,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """All pairs within a block with word-``n``-gram Jaccard ≥ threshold.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct n-gram sets — integer
    set sizes, so the double division is bit-identical across engines.
    Block-bounded cross join: the quadratic term is per-block, which is the
    scale story (blocks = shuffle partitions).

    ``max_block`` is the skew safety valve: one hot (lang, source) block of
    k docs costs k²/2 comparisons, so blocks above the cap are EXCLUDED
    (broadcast anti-join on block counts, same shape as minhash's
    ``max_bucket``). The cap is part of the operator's semantics — the
    DuckDB oracle applies the identical window-count filter — so results
    stay engine-identical whether or not it fires. Corpora whose blocks
    exceed any affordable cap should use the minhash path for candidates
    and this only as the exact-verify stage — ``max_rows`` enforces that
    scope in code (raises :class:`QuadraticScaleError` above the limit;
    pass ``None`` for bounded candidate subsets).
    """
    _guard_quadratic(
        docs, max_rows, "ngram_jaccard_pairs", "minhash_verified_pairs"
    )
    g = (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select("doc_id", *block_cols, ngrams_expr(tokens_expr(), n).alias("grams"))
        .filter(F.size("grams") > 0)
    )
    oversized = (
        g.groupBy(*block_cols).count().filter(F.col("count") > max_block).drop("count")
    )
    g = g.join(F.broadcast(oversized), block_cols, "left_anti")
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
    runs are reproducible without any RNG state.

    ``a`` spans the FULL field [1, p-1].  The earlier family bounded
    a <= 2^29 so a*h+b never overflowed a signed 64 — but with 31-bit
    inputs that product almost never wraps mod 2^61-1 either, which
    makes the map ORDER-PRESERVING: 46 of the 64 functions never wrapped
    at all, so each of them always returned the same element (the global
    h-minimum) and the signature carried ~19 effective hash functions,
    heavily correlated through a shared rotation structure (measured:
    band-collision rates 2.7x the S-curve at r=6 — the plan_minhash
    prediction pin caught it).  Full-range a restores approximate
    min-wise independence; the overflow-free evaluation is the
    Mersenne-61 split multiply in ``_affine_min`` / ``_sig_expr_sql``
    (identical in numpy and DuckDB — both engines stay inside signed
    64, so Spark 4 ANSI mode never throws)."""
    params = []
    x = 0x9E3779B97F4A7C15
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (_MERSENNE - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _MERSENNE
        params.append((a, b))
    return params


def _affine_split(params: list[tuple[int, int]]):
    """(a1, a0, b) numpy column vectors with a = a1*2^30 + a0 — the
    split the overflow-free Mersenne-61 multiply needs."""
    a1 = np.array([a >> 30 for a, _ in params], dtype=np.int64)[:, None]
    a0 = np.array(
        [a & ((1 << 30) - 1) for a, _ in params], dtype=np.int64
    )[:, None]
    b = np.array([b for _, b in params], dtype=np.int64)[:, None]
    return a1, a0, b


def _affine_min(h, a1, a0, b):
    """min over elements of (a*h + b) mod 2^61-1 per hash function,
    without ever leaving signed 64 (bound audit, h < 2^31, a1 < 2^31,
    a0 < 2^30, b < 2^61):

        t = a1*h                                  < 2^62
        t*2^30 ≡ (t>>31) + (t & (2^31-1))*2^30    (2^61 ≡ 1 mod p)
        u = that                                  < 2^61 + 2^31
        w = u + a0*h + b                          < 2^63

    The same arithmetic runs verbatim in the DuckDB oracles
    (``_sig_expr_sql``)."""
    t = a1 * h
    u = (t >> 31) + ((t & 0x7FFFFFFF) << 30)
    return ((u + a0 * h + b) % _MERSENNE).min(axis=1)


#: per-worker memo of _md5_60 results.  Near-dup corpora repeat shingles
#: and tokens heavily (that is the point of the workload), and the md5 +
#: int() per string is the sketch kernels' dominant per-row cost
#: (measured: 27% off the whole signature pass on the sf0.1 fixture,
#: scripts/ubench_minhash.py).  Module-level so a reused Python worker
#: (spark.python.worker.reuse, the default) keeps it across tasks and
#: batches (guide §4.5 — this module is importable on executors, so the
#: global survives task boundaries).  Pure function-value cache: keyed
#: by the string itself, dataset-independent, first occurrence always
#: computed.  Bounded: cleared past _MD5_CACHE_MAX entries (~60 MB) so a
#: high-cardinality corpus degrades to the uncached cost, never OOM.
_MD5_CACHE: dict[str, int] = {}
_MD5_CACHE_MAX = 500_000


def _md5_60(s: str) -> int:
    """Shared 60-bit string hash: first 15 hex chars of md5, as an int.

    Chosen over crc32/xxhash because BOTH engines compute it
    bit-identically — DuckDB: ``('0x'||substr(md5(s),1,15))::BIGINT`` —
    which upgrades the minhash/simhash CORRECTNESS checks from rows-only
    to full hash-match (VERDICT r1 #7).  md5 avalanches, so no finalizer
    mix is needed (unlike GF(2)-linear crc32, whose correlated hashes of
    overlapping shingles visibly biased the minima).
    """
    v = _MD5_CACHE.get(s)
    if v is None:
        import hashlib

        if len(_MD5_CACHE) >= _MD5_CACHE_MAX:
            _MD5_CACHE.clear()
        v = _MD5_CACHE[s] = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    return v


def minhash_signature_udf(n: int, n_hashes: int = _N_HASHES):
    """text → 64-long minhash signature, one Arrow-batched pandas UDF.

    The whole per-document kernel (tokenize → word-n-gram shingles →
    md5-60 shingle hash masked to 31 bits → 64-way affine-min) runs in
    Python/numpy: per document it's one vectorized (64, n_shingles)
    broadcast.  Keeping the shingle stage in JVM higher-order functions
    measured ~3 ms/doc interpreted (and nesting a pandas UDF over HOF
    output trips an evaluator INTERNAL_ERROR in Spark 4.1), so the
    boundary sits at the raw text column: one string through Arrow, one
    array<long> back.  Returns an empty array for docs with < n tokens
    (caller filters).
    """
    from pyspark.sql.pandas.functions import pandas_udf

    a1_vec, a0_vec, b_vec = _affine_split(_affine_params(n_hashes))
    empty = np.array([], dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        def one(text):
            if not text:
                return empty
            toks = text.lower().split()
            if len(toks) < n:
                return empty
            shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            h60 = np.fromiter(
                (_md5_60(s) for s in shingles), dtype=np.int64, count=len(shingles)
            )
            # mask to 31 bits (the split-multiply domain; see _affine_min)
            h = (h60 & 0x7FFFFFFF)[None, :]
            return _affine_min(h, a1_vec, a0_vec, b_vec)

        return texts.map(one)

    return _sig


# ---------------------------------------------------------------------------
# (b, r) planner — the S-curve law as a callable (VERDICT r10 #2)
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class MinHashPlan:
    """Band geometry sized from the S-curve 1 − (1 − s^r)^b instead of
    the hand-tuned ``_BAND_ROWS`` constant: ``band_rows`` (r) is the
    LARGEST row count whose ``n_hashes // r`` bands still reach the
    recall target for a pair at exactly the Jaccard threshold — largest
    because precision (candidate-volume suppression below the threshold)
    improves monotonically with r, so the best achievable plan is the
    most selective one that still meets the recall floor.  Pairs above
    the threshold amplify further up the S-curve, so ``predicted_recall``
    is the worst case over qualifying pairs.

    ``achievable=False`` is the honest boundary (same contract as
    ``similarity.plan_semantic_dedup``): when even r=1 (every hash its
    own band) misses the target, the planner says so and returns the
    r=1 geometry rather than silently under-recalling — the fix is more
    hashes, not a different slicing of the same 64."""

    jaccard_threshold: float
    target_recall: float
    n_hashes: int
    band_rows: int
    n_bands: int
    predicted_recall: float
    achievable: bool


def lsh_candidate_prob(s: float, band_rows: int, n_bands: int) -> float:
    """P(candidate) for a pair with Jaccard similarity ``s`` under
    (b, r) banding — the standard S-curve 1 − (1 − s^r)^b (MMDS ch.3)."""
    return 1.0 - (1.0 - s**band_rows) ** n_bands


def plan_minhash(
    jaccard_threshold: float,
    target_recall: float,
    *,
    n_hashes: int = _N_HASHES,
) -> MinHashPlan:
    """Size MinHash-LSH banding for a Jaccard threshold and a recall
    target.  Feed the result to ``minhash_verified_pairs(...,
    plan=plan)`` (or pass ``band_rows=plan.band_rows`` to any band
    builder).  A user deduping at 0.9 instead of the default 0.5 gets
    the geometry the law demands instead of the constant that happened
    to fit the gate corpus."""
    if not (0.0 < jaccard_threshold < 1.0):
        raise ValueError("jaccard_threshold must be in (0, 1)")
    if not (0.0 < target_recall <= 1.0):
        raise ValueError("target_recall must be in (0, 1]")
    for r in range(n_hashes, 0, -1):
        b = n_hashes // r
        rec = lsh_candidate_prob(jaccard_threshold, r, b)
        if rec >= target_recall:
            return MinHashPlan(
                jaccard_threshold, target_recall, n_hashes, r, b, rec, True
            )
    return MinHashPlan(
        jaccard_threshold,
        target_recall,
        n_hashes,
        1,
        n_hashes,
        lsh_candidate_prob(jaccard_threshold, 1, n_hashes),
        False,
    )


def minhash_bands(docs: DataFrame, n: int = 3, band_rows: int = _BAND_ROWS) -> DataFrame:
    """doc_id → (band_id, band_hash) rows; bucket key for the LSH join."""
    # repartition first: a small-file corpus scan arrives as ONE partition
    # and the signature work would run on one core; per-row-heavy stages
    # must spread before they start (at cluster scale: same rule, coarser
    # inputs)
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    sig_udf = minhash_signature_udf(n)
    sig = docs.select("doc_id", sig_udf(F.col("text")).alias("sig"))
    # cache() is an optimizer barrier as much as a reuse point: without it
    # CollapseProject inlines the signature expression into each of the 16
    # band hashes (16× recompute), and again into both sides of the LSH
    # self-join.  At cluster scale this is persist(MEMORY_AND_DISK) on the
    # signature table — hash the corpus once, reuse everywhere.
    #
    # The cache barrier sits BELOW the empty-signature filter (guide §4.4):
    # filtering on the UDF's own output column inside the cached subtree
    # made PushDownPredicates duplicate the UDF — one ArrowEvalPython below
    # the repartition exchange (evaluating the WHOLE corpus in the scan's
    # single partition just to decide the filter) and a second one above it
    # recomputing the column.  Cache-then-filter evaluates the signature
    # exactly once, in the spread partitioning (plan pin:
    # tests/test_dedup.py::test_minhash_signature_single_evaluation).
    sig = bounded_cache(sig)
    # shingle-less docs (empty signature) are dropped: they'd otherwise all
    # share a degenerate signature and pair with each other
    return _bands_from_sig(sig.filter(F.size("sig") > 0), band_rows)


def _bands_from_sig(sig: DataFrame, band_rows: int = _BAND_ROWS) -> DataFrame:
    """Band rows from an ALREADY-computed (and cached/filtered) signature
    relation — split out (r9) so a caller that computes signatures in a
    shared scan (``corpus.multi_signal_components``' dual-sketch pass)
    feeds the identical band build the standalone path uses.

    ``band_rows`` is the planner dial (``plan_minhash``): b = 64 // r
    bands of r rows each; when r does not divide 64 the trailing hashes
    are simply unused (the law prices exactly b×r of them)."""
    n_bands = _N_HASHES // band_rows
    # band key = the raw band slice joined as a string (NOT F.hash, whose
    # murmur has no DuckDB twin): engine-portable, and an equi-join on a
    # short string costs the same shuffle as one on a long
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.array_join(
                    F.slice("sig", i * band_rows + 1, band_rows).cast("array<string>"),
                    "/",
                ).alias("band_key"),
            )
            for i in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )


def minhash_candidate_pairs(
    docs: DataFrame, n: int = 3, max_bucket: int = 64, band_rows: int = _BAND_ROWS
) -> DataFrame:
    """LSH candidate pairs: self-equi-join on (band_id, band_hash).

    ``max_bucket`` caps degenerate buckets (a bucket of k docs costs k²/2
    pairs — at 100 TB an uncapped hot bucket is the classic LSH skew
    failure; capped buckets trade a little recall for bounded work, and AQE
    skew-split handles the moderate ones).
    """
    return _candidates_from_bands(minhash_bands(docs, n, band_rows), max_bucket)


def _candidates_from_bands(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Capped LSH self-join over an already-built band relation — split
    out (r9) for shared-scan callers; semantics identical to
    ``minhash_candidate_pairs``."""
    counts = bands.groupBy("band_id", "band_key").count()
    bands = bands.join(
        F.broadcast(counts.filter(F.col("count") > max_bucket)),
        ["band_id", "band_key"],
        "left_anti",
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return minhash_candidate_pairs(docs, n=3)


def minhash_verified_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 64,
    *,
    plan: MinHashPlan | None = None,
) -> DataFrame:
    """The production near-dup pipeline: MinHash LSH proposes candidates
    (linear-scale), exact n-gram Jaccard verifies ONLY those pairs.

    This is the scale-correct division of labor the blocked all-pairs
    Jaccard can't give you on an unblocked corpus: the quadratic exact
    kernel runs on |candidates| pairs (∝ true near-dup count), never on
    n²/2.  Two joins hang the gram sets back onto the candidate edge
    list; integer set sizes keep the jaccard bit-identical to the oracle.

    ``plan`` (from ``plan_minhash``) supplies the band geometry AND the
    verify threshold in one object — the planner-to-operator handoff;
    explicit ``threshold`` is ignored when a plan is given.
    """
    if plan is not None:
        threshold = plan.jaccard_threshold
        band_rows = plan.band_rows
    else:
        band_rows = _BAND_ROWS
    cand = minhash_candidate_pairs(
        docs, n=n, max_bucket=max_bucket, band_rows=band_rows
    )
    return verify_pairs_jaccard(cand, docs, n=n, threshold=threshold)


def verify_pairs_jaccard(
    cand: DataFrame, docs: DataFrame, *, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard verify of a candidate edge list against
    ``docs`` — the shared verify stage, exposed so ANY proposer
    (full-corpus LSH, ``incremental_minhash_pairs``, a persisted band
    store) feeds the same bit-exact kernel.  Two joins hang the gram
    sets onto the candidate edges; integer set sizes keep the jaccard
    bit-identical to the oracle."""
    g = (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select("doc_id", ngrams_expr(tokens_expr(), n).alias("grams"))
        .filter(F.size("grams") > 0)
    )
    a = g.select(F.col("doc_id").alias("doc_id_a"), F.col("grams").alias("grams_a"))
    b = g.select(F.col("doc_id").alias("doc_id_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    jac = inter / (F.size("grams_a") + F.size("grams_b") - inter)
    return (
        cand.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select("doc_id_a", "doc_id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return minhash_verified_pairs(docs, n=3, threshold=0.5)


CONTAIN_THRESHOLD = 0.8


def containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = CONTAIN_THRESHOLD, max_bucket: int = 64
) -> DataFrame:
    """Asymmetric near-dup: shingle CONTAINMENT ``|A∩B| / |A|`` per side —
    the measure that catches a document embedded inside another (quoted
    articles, concatenated scrapes, boilerplate-wrapped bodies), which
    symmetric Jaccard misses when the sizes differ (inter/union shrinks
    with the larger doc; inter/|small| doesn't).

    Candidates come from the MinHash-LSH band join and containment is the
    exact verify on that candidate set — same linear-scale division of
    labor as ``minhash_verified_pairs``, same bit-exact int/int division.
    RECALL CAVEAT, stated honestly: Jaccard-banded LSH under-proposes
    low-Jaccard/high-containment pairs (a tiny doc inside a huge one may
    share no band).  At the fixture's size ratios the candidate set covers
    the containment pairs; a corpus with extreme size skew should shingle
    the SMALL side only or band on bottom-k sketches of each doc's prefix
    — the verify stage here is reusable for either proposer.
    """
    cand = minhash_candidate_pairs(docs, n=n, max_bucket=max_bucket)
    g = (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select("doc_id", ngrams_expr(tokens_expr(), n).alias("grams"))
        .filter(F.size("grams") > 0)
    )
    a = g.select(F.col("doc_id").alias("doc_id_a"), F.col("grams").alias("grams_a"))
    b = g.select(F.col("doc_id").alias("doc_id_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    c_a = inter / F.size("grams_a")
    c_b = inter / F.size("grams_b")
    return (
        cand.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
        )
        .filter(F.greatest(F.col("containment_a"), F.col("containment_b")) >= threshold)
    )


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return containment_pairs(docs, n=3)


SUBSTR_W = 15  # window width in tokens (Lee et al. use 50 BPE tokens;
#               the fixture's docs run 10-99 whitespace tokens)
SUBSTR_MAX_DF = 64  # windows in more docs than this are boilerplate


def substring_dup_pairs(
    docs: DataFrame, w: int = SUBSTR_W, max_window_df: int = SUBSTR_MAX_DF
) -> DataFrame:
    """Exact-substring duplication pairs: docs sharing at least one
    verbatim ``w``-token window, with the count of shared windows — the
    signal behind "Deduplicating Training Data Makes Language Models
    Better" (Lee et al., 2022): verbatim spans that survive near-dup
    filters (quotes, syndicated passages, templated sections) are what
    models memorize.

    Scale shape: windows fingerprint to md5-60 ints (narrow shuffle key,
    engine-portable), one groupBy bounds the per-window quadratic by
    document frequency (windows in > ``max_window_df`` docs are
    boilerplate and dropped — the same hot-bucket discipline as the LSH
    families, mirrored in the oracle), then the pair join runs per
    window group.  Work ∝ Σ df² over kept windows, never corpus².
    """
    wins = (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(ngrams_expr(tokens_expr(), w)).alias("win"))
    )
    h = wins.select(
        "doc_id",
        F.conv(F.substring(F.md5("win"), 1, 15), 16, 10).cast("long").alias("wh"),
    )
    hot = h.groupBy("wh").count().filter(F.col("count") > max_window_df)
    kept = h.join(F.broadcast(hot.select("wh")), "wh", "left_anti")
    a = kept.select(F.col("doc_id").alias("doc_id_a"), "wh")
    b = kept.select(F.col("doc_id").alias("doc_id_b"), "wh")
    return (
        a.join(b, "wh")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("n_shared_windows"))
    )


def dedup_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return substring_dup_pairs(docs)


def incremental_minhash_pairs(
    old_docs: DataFrame, new_docs: DataFrame, n: int = 3, max_bucket: int = 64
) -> DataFrame:
    """Incremental near-dup: candidate pairs that INVOLVE a new-batch doc
    — (new, old) and (new, new) — without ever materializing the old×old
    self-join.  THE production shape for a growing corpus: per batch, work
    tracks |new| × bucket occupancy, not |corpus|².

    Bucket caps are computed over the UNION of both sides (a bucket can
    only be judged hot with the old docs counted), so the result is
    EXACTLY the full self-join's pairs minus the old×old ones — the unit
    test pins that identity.  At warehouse scale the old side's bands
    come from a persisted signature store (StagingWarehouse) rather than
    being re-hashed; only the new batch runs the signature UDF."""
    bands = minhash_bands(old_docs, n).withColumn(
        "is_new", F.lit(0)
    ).unionByName(minhash_bands(new_docs, n).withColumn("is_new", F.lit(1)))
    counts = bands.groupBy("band_id", "band_key").count()
    kept = bands.join(
        F.broadcast(counts.filter(F.col("count") > max_bucket)),
        ["band_id", "band_key"],
        "left_anti",
    )
    a = kept.filter(F.col("is_new") == 1).alias("a")
    b = kept.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id_b"),
        )
        .distinct()
    )


def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture split: docs with doc_id % 10 < 8 are the standing corpus,
    the rest are the incoming batch (mirrored verbatim in the oracle)."""
    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    return incremental_minhash_pairs(old, new, n=3)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_SIM_BITS = 60  # the shared md5-hex hash is 60 bits (15 hex chars)
_SIM_CHUNK_BITS = 15  # 4 chunks; pigeonhole exact for Hamming ≤ 3


def simhash_udf():
    """text → 60-bit SimHash, one Arrow-batched pandas UDF.

    Per document: distinct tokens → md5-60 hash (engine-portable, see
    ``_md5_60``) → per-bit ±1 counts via an (n_tokens, 60) numpy unpack →
    sign bits packed into a long.  Replaces a 60-wide aggregate +
    60-reference pack expression (and its cache barrier) with one
    vectorized kernel.  Token-less docs yield NULL (caller filters) —
    a shared degenerate fingerprint would pair them all with each other.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    bit_idx = np.arange(_SIM_BITS, dtype=np.int64)

    @pandas_udf(T.LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        def one(text):
            toks = sorted(set(text.lower().split())) if text else []
            if not toks:
                return None
            h = np.fromiter((_md5_60(t) for t in toks), dtype=np.int64, count=len(toks))
            bits = ((h[:, None] >> bit_idx[None, :]) & 1).astype(np.int64)
            counts = (bits * 2 - 1).sum(axis=0)
            packed = 0
            for b in np.nonzero(counts > 0)[0]:
                packed |= 1 << int(b)
            return packed

        return texts.map(one)

    return _sim


def dual_sketch_udf(n: int, n_hashes: int = _N_HASHES):
    """text → struct(sig array<long>, simhash long): BOTH sketches from
    ONE tokenize in ONE Arrow pass (r9, VERDICT r8 #4).  The MinHash and
    SimHash chains each re-read and re-tokenized the corpus through
    their own pandas UDF; an ensemble consumer
    (``corpus.multi_signal_components``) pays the scan, the Arrow
    transfer, and ``text.lower().split()`` once and forks the cached
    sketch relation into both band pipelines.  Value-parity with
    ``minhash_signature_udf`` and ``simhash_udf`` is pinned in pytest —
    the per-field kernels below are the same operations on the same
    token stream (shingle-set md5-60 affine-min; distinct-token md5-60
    sign bits)."""
    from pyspark.sql.pandas.functions import pandas_udf

    a1_vec, a0_vec, b_vec = _affine_split(_affine_params(n_hashes))
    bit_idx = np.arange(_SIM_BITS, dtype=np.int64)
    empty = np.array([], dtype=np.int64)

    @pandas_udf(
        T.StructType(
            [
                T.StructField("sig", T.ArrayType(T.LongType())),
                T.StructField("simhash", T.LongType()),
            ]
        )
    )
    def _dual(texts: pd.Series) -> pd.DataFrame:
        sigs, shs = [], []
        for text in texts:
            toks = text.lower().split() if text else []
            # minhash leg (minhash_signature_udf verbatim)
            if len(toks) < n:
                sigs.append(empty)
            else:
                shingles = {
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                }
                h60 = np.fromiter(
                    (_md5_60(s) for s in shingles),
                    dtype=np.int64,
                    count=len(shingles),
                )
                h = (h60 & 0x7FFFFFFF)[None, :]
                sigs.append(_affine_min(h, a1_vec, a0_vec, b_vec))
            # simhash leg (simhash_udf verbatim)
            uniq = sorted(set(toks))
            if not uniq:
                shs.append(None)
            else:
                hu = np.fromiter(
                    (_md5_60(t) for t in uniq), dtype=np.int64, count=len(uniq)
                )
                bits = ((hu[:, None] >> bit_idx[None, :]) & 1).astype(np.int64)
                counts = (bits * 2 - 1).sum(axis=0)
                packed = 0
                for b in np.nonzero(counts > 0)[0]:
                    packed |= 1 << int(b)
                shs.append(packed)
        return pd.DataFrame({"sig": sigs, "simhash": shs})

    return _dual


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming-≤k candidate pairs via 15-bit chunk banding (exact for k≤3:
    with 4 chunks, distance ≤3 forces one identical chunk), then exact
    Hamming verify with bit_count(xor)."""
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    sim = simhash_udf()
    # cache BELOW the null filter — same single-evaluation rule as
    # minhash_bands (a filter on the UDF's output inside the cached
    # subtree duplicates the ArrowEvalPython node)
    sh = bounded_cache(docs.select("doc_id", sim(F.col("text")).alias("simhash")))
    return _simhash_pairs_from_sketch(
        sh.filter(F.col("simhash").isNotNull()), max_hamming
    )


def _simhash_pairs_from_sketch(sh: DataFrame, max_hamming: int) -> DataFrame:
    """Chunk-banded Hamming join over an already-computed (cached,
    null-filtered) sketch relation — split out (r9) for shared-scan
    callers; semantics identical to ``simhash_pairs``."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftrightunsigned("simhash", i * _SIM_CHUNK_BITS)
                .bitwiseAND(F.lit(0x7FFF))
                .alias("chunk"),
            )
            for i in range(_SIM_BITS // _SIM_CHUNK_BITS)
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
    # max_hamming=3: the 4x15-bit chunk banding only GUARANTEES capture up
    # to Hamming 3 (pigeonhole); asking for 6 would silently drop pairs
    # that differ in all four chunks
    return simhash_pairs(docs, max_hamming=3)


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


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_blocks: int = 8,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact cosine pairs ≥ threshold via a blocked (i, j) grid.

    SCOPE (VERDICT r2 #2): this is the VERIFY-STAGE / small-table kernel —
    exact all-pairs is inherently n²/2 work no matter how well it is
    distributed, so at corpus scale it must only ever run on a candidate
    subset (an SRP bucket, an IVF cluster, a suspect cohort), never on the
    full table.  The production embedding-dedup entry is the SRP-gated
    path (``similarity.semantic_pairs`` / registry ``dedup_embedding_pairs``),
    which bounds the quadratic per (table, bucket); this kernel stays
    registered as ``dedup_embedding_exact`` for the small-table/verify role.
    The *distribution* is still scale-correct for that role: no driver
    collect of the corpus (VERDICT r1 #2), B(B+1)/2 applyInPandas cells.

    Every vector hashes into one of ``n_blocks`` blocks; each of the
    B(B+1)/2 unordered block pairs becomes one ``applyInPandas`` group
    whose kernel is an exact int64 block-matmul (quantized dots
    ≤ 64·1e14 < 2^63 so numpy matmul is exact, and the double division
    uses the same operation order as the SQL form — cosines bit-identical
    to the DuckDB oracle).  Shuffle volume is B copies of the corpus
    (each row joins B grid cells); peak group memory is ~2·(n/B) vectors —
    pick B so one block fits an executor.  Work is the true n²/2 pair
    count, distributed, instead of an n×64 driver matrix.

    ``max_rows`` enforces the scope in code: above the limit this raises
    :class:`QuadraticScaleError` pointing at the SRP-gated production path
    (pass ``None`` for a known-bounded candidate subset).
    """
    _guard_quadratic(
        emb, max_rows, "embedding_near_dup_pairs", "similarity.semantic_pairs"
    )
    spark = emb.sparkSession
    q = emb.select("vec_id", quantize_expr().alias("q")).withColumn(
        "block", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    )
    combos = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    # a row in block p is the LEFT side of cells (p, j≥p) and the RIGHT side
    # of cells (i<p, p); diagonal cells carry only the left copy
    left = q.join(F.broadcast(combos), q["block"] == combos["bi"]).withColumn(
        "side", F.lit("a")
    )
    off_diag = combos.filter(F.col("bi") != F.col("bj"))
    right = q.join(F.broadcast(off_diag), q["block"] == off_diag["bj"]).withColumn(
        "side", F.lit("b")
    )
    tagged = left.unionByName(right).select("bi", "bj", "side", "vec_id", "q")

    schema = T.StructType(
        [
            T.StructField("vec_id_a", T.LongType()),
            T.StructField("vec_id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    empty = pd.DataFrame(
        {
            "vec_id_a": np.array([], dtype=np.int64),
            "vec_id_b": np.array([], dtype=np.int64),
            "cosine": np.array([], dtype=np.float64),
        }
    )

    def grid(key, pdf):
        bi, bj = key
        a = pdf[pdf["side"] == "a"]
        if len(a) == 0:
            return empty
        a_ids = a["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.stack(a["q"].map(lambda v: np.asarray(v, dtype=np.int64)))
        a_sqrt = np.sqrt((a_mat * a_mat).sum(axis=1).astype(np.float64))
        if bi == bj:
            b_ids, b_mat, b_sqrt = a_ids, a_mat, a_sqrt
        else:
            b = pdf[pdf["side"] == "b"]
            if len(b) == 0:
                return empty
            b_ids = b["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.stack(b["q"].map(lambda v: np.asarray(v, dtype=np.int64)))
            b_sqrt = np.sqrt((b_mat * b_mat).sum(axis=1).astype(np.float64))
        dots = a_mat @ b_mat.T
        # cos = dot / (sqrt(na) * sqrt(nb)) — SAME operation order as the
        # SQL form so the doubles match bit-for-bit
        cos = dots / (a_sqrt[:, None] * b_sqrt[None, :])
        if bi == bj:
            # strict upper triangle: each within-block pair once, no self
            ai, bj_idx = np.nonzero((cos >= threshold) & (a_ids[:, None] < b_ids[None, :]))
            lo, hi = a_ids[ai], b_ids[bj_idx]
        else:
            # cross-block pairs appear in exactly one grid cell; orient (lo, hi)
            ai, bj_idx = np.nonzero(cos >= threshold)
            xa, xb = a_ids[ai], b_ids[bj_idx]
            lo, hi = np.minimum(xa, xb), np.maximum(xa, xb)
        return pd.DataFrame({"vec_id_a": lo, "vec_id_b": hi, "cosine": cos[ai, bj_idx]})

    return tagged.groupBy("bi", "bj").applyInPandas(grid, schema)


def dedup_embedding_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs kernel, registered for the verify-stage/small-table
    role (see ``embedding_near_dup_pairs`` scope note).  The production
    ``dedup_embedding_pairs`` entry lives in ``operators.similarity``."""
    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_minhash_incremental": dedup_minhash_incremental,
    "dedup_minhash_verified": dedup_minhash_verified,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_containment_pairs": dedup_containment_pairs,
    "dedup_substring_pairs": dedup_substring_pairs,
    "dedup_embedding_exact": dedup_embedding_exact,
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
        WITH g0 AS (
          SELECT doc_id, lang, source, list_distinct({_TOKS}) AS grams
          FROM documents
          WHERE len(list_distinct({_TOKS})) > 0
        ), g AS (
          -- max_block cap (mirrors the Spark-side anti-join on block counts)
          SELECT doc_id, lang, source, grams FROM (
            SELECT *, count(*) OVER (PARTITION BY lang, source) AS _bn FROM g0
          ) WHERE _bn <= 10000
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
    "dedup_embedding_exact": """
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

# -- minhash / simhash oracles: the md5-60 hash (see _md5_60) is computed
# identically by DuckDB, so the full LSH pipelines are SQL-expressible and
# the gate upgrades from rows-only to hash-match.  The 64 affine (a, b)
# pairs are inlined from the same _affine_params the Spark kernel uses.

_H60 = "('0x' || substr(md5({v}), 1, 15))::BIGINT"
def _sig_expr_sql(a: int, b: int) -> str:
    """One hash function as a DuckDB expression — the split Mersenne-61
    multiply from ``_affine_min``, verbatim (a1*v appears twice so the
    whole thing stays one pure expression; every intermediate is inside
    signed 64)."""
    a1, a0 = a >> 30, a & ((1 << 30) - 1)
    t = f"({a1}::BIGINT * v)"
    u = f"(({t} >> 31) + (({t} & 2147483647) << 30))"
    return (
        f"list_min(list_transform(h, v -> ({u} + {a0}::BIGINT * v + {b})"
        f" % {_MERSENNE}))"
    )


_SIG_EXPRS = ",\n                 ".join(
    _sig_expr_sql(a, b) for a, b in _affine_params(_N_HASHES)
)
_MH_N = 3  # shingle width used by dedup_minhash_pairs

def _minhash_pairs_sql(band_rows: int = _BAND_ROWS, max_bucket: int = 64) -> str:
    """DuckDB twin of ``minhash_candidate_pairs`` at a given band
    geometry — parameterized on (b, r) so a ``plan_minhash`` retune
    re-derives the oracle automatically (the shared-constant rule:
    geometry is f-string-injected FROM the same plan the Spark side
    executes)."""
    return f"""
        WITH d AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(toks) - {_MH_N} + 2),
                     i -> array_to_string(list_slice(toks, i, i + {_MH_N} - 1), ' '))) AS sl
          FROM d WHERE len(toks) >= {_MH_N}
        ), hs AS (
          SELECT doc_id,
                 list_transform(sl, x -> {_H60.format(v='x')} & 2147483647) AS h
          FROM sh
        ), sig AS (
          SELECT doc_id, [{_SIG_EXPRS}] AS sig FROM hs
        ), bands AS (
          SELECT doc_id, r.bid AS band_id,
                 array_to_string(list_slice(sig, r.bid * {band_rows} + 1,
                                            r.bid * {band_rows} + {band_rows}), '/') AS band_key
          FROM sig CROSS JOIN range({_N_HASHES // band_rows}) r(bid)
        ), kept AS (
          SELECT doc_id, band_id, band_key FROM (
            SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bn FROM bands
          ) WHERE bn <= {max_bucket}
        )
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM kept a JOIN kept b ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
"""


ORACLE["dedup_minhash_pairs"] = _minhash_pairs_sql()

ORACLE["dedup_minhash_incremental"] = f"""
        SELECT doc_id_a, doc_id_b FROM ({ORACLE["dedup_minhash_pairs"]}) p
        WHERE NOT (doc_id_a % 10 < 8 AND doc_id_b % 10 < 8)
"""

def _minhash_verified_sql(
    band_rows: int = _BAND_ROWS, threshold: float = 0.5
) -> str:
    """DuckDB twin of ``minhash_verified_pairs`` — candidate CTE from
    ``_minhash_pairs_sql`` at the given geometry, exact-Jaccard verify
    at the given threshold."""
    return f"""
        WITH cand AS (
          SELECT * FROM ({_minhash_pairs_sql(band_rows)}) c
        ), g AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(toks) - {_MH_N} + 2),
                     i -> array_to_string(list_slice(toks, i, i + {_MH_N} - 1), ' '))) AS grams
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) d
          WHERE len(toks) >= {_MH_N}
        )
        SELECT cand.doc_id_a, cand.doc_id_b,
               len(list_intersect(a.grams, b.grams))
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
                 AS jaccard
        FROM cand JOIN g a ON a.doc_id = cand.doc_id_a
                  JOIN g b ON b.doc_id = cand.doc_id_b
        WHERE len(list_intersect(a.grams, b.grams))
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= {threshold}
"""


ORACLE["dedup_minhash_verified"] = _minhash_verified_sql()

ORACLE["dedup_substring_pairs"] = f"""
        WITH d AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), w AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(toks) - {SUBSTR_W} + 2),
                     i -> array_to_string(list_slice(toks, i, i + {SUBSTR_W} - 1), ' ')))) AS win
          FROM d WHERE len(toks) >= {SUBSTR_W}
        ), h AS (
          SELECT doc_id, ('0x' || substr(md5(win), 1, 15))::BIGINT AS wh FROM w
        ), kept AS (
          SELECT doc_id, wh FROM (
            SELECT *, count(*) OVER (PARTITION BY wh) AS df FROM h
          ) WHERE df <= {SUBSTR_MAX_DF}
        )
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(count(*) AS BIGINT) AS n_shared_windows
        FROM kept a JOIN kept b ON a.wh = b.wh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
"""

ORACLE["dedup_containment_pairs"] = f"""
        WITH cand AS (
          SELECT * FROM ({ORACLE["dedup_minhash_pairs"]}) c
        ), g AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(toks) - {_MH_N} + 2),
                     i -> array_to_string(list_slice(toks, i, i + {_MH_N} - 1), ' '))) AS grams
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) d
          WHERE len(toks) >= {_MH_N}
        )
        SELECT doc_id_a, doc_id_b, containment_a, containment_b FROM (
          SELECT cand.doc_id_a, cand.doc_id_b,
                 len(list_intersect(a.grams, b.grams)) / len(a.grams) AS containment_a,
                 len(list_intersect(a.grams, b.grams)) / len(b.grams) AS containment_b
          FROM cand JOIN g a ON a.doc_id = cand.doc_id_a
                    JOIN g b ON b.doc_id = cand.doc_id_b
        ) WHERE greatest(containment_a, containment_b) >= {CONTAIN_THRESHOLD}
"""

ORACLE["dedup_simhash_pairs"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct({_TOKS})) AS t
          FROM documents WHERE len({_TOKS}) > 0
        ), h AS (
          SELECT doc_id, {_H60.format(v='t')} AS h FROM tok
        ), bits AS (
          SELECT doc_id, r.b AS b,
                 SUM(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS c
          FROM h CROSS JOIN range({_SIM_BITS}) r(b)
          GROUP BY doc_id, r.b
        ), sh AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id
        ), banded AS (
          SELECT doc_id, simhash, r.cid AS chunk_id,
                 (simhash >> (r.cid * {_SIM_CHUNK_BITS})) & 32767 AS chunk
          FROM sh CROSS JOIN range({_SIM_BITS // _SIM_CHUNK_BITS}) r(cid)
        )
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM banded a JOIN banded b ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# LSH recall calibration report
# ---------------------------------------------------------------------------

RECALL_SAMPLE_MOD = 2  # floor: even a tiny corpus stays a strict sample
# auto-mod target (VERDICT r4 #5): mod = max(floor, ceil(n / TARGET)) so
# the exact side's pair count stays ~TARGET²/2 at ANY corpus size — the
# report's cost no longer grows with the corpus, only the (cheap) LSH
# side does.  Recall is a ratio, so the fixed-size sample estimates it
# equally well at any scale (stability across mods pinned in tests).
RECALL_SAMPLE_TARGET = 1000


def _auto_mod(n: int, target: int = RECALL_SAMPLE_TARGET) -> int:
    return max(RECALL_SAMPLE_MOD, -(-n // target))


def lsh_recall_report(
    docs: DataFrame,
    *,
    mod: int | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """One-row LSH calibration report: on a deterministic md5-60 hash
    sample of the corpus, compute exact all-pairs n-gram Jaccard ground
    truth and the production ``minhash_verified_pairs`` on the SAME
    sample, and report the measured recall.  This is how banding
    parameters are tuned at warehouse scale: exact ground truth is
    quadratic, so you buy it on a small sample and extrapolate — the
    sample is hash-keyed (not random), so the report is reproducible
    run over run and comparable release over release.

    The quadratic term is the point, and it is SAMPLE-bounded by
    construction (1/mod² of the corpus pair count); the LSH side is the
    linear production path.  ``n_lsh_found`` counts exact pairs the LSH
    pipeline recovered (verified pairs are a subset of ground truth by
    construction, since verify applies the same threshold).  recall
    defaults to 1.0 when the sample nets zero ground-truth pairs.

    ``mod`` SIZES ITSELF TO THE CORPUS (VERDICT r4 #5): when None, mod =
    max(2, ceil(n / RECALL_SAMPLE_TARGET)) from one corpus count — the
    exact side's pair count then stays ~TARGET²/2 (≈500k comparisons)
    whether the corpus is 5k docs or a billion (pairs ∝ (N/mod)²).
    Recall is a ratio, so the fixed-size sample estimates it equally
    well at any corpus size; stability across mods is pinned in tests.
    An explicit ``mod`` overrides for tuning experiments.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    if mod is None:
        mod = _auto_mod(docs.count())
    key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    sample = docs.filter(key % mod == 0)
    g = bounded_cache(
        sample.repartition(par)
        .select("doc_id", ngrams_expr(tokens_expr(), n).alias("grams"))
        .filter(F.size("grams") > 0)
    )
    a = g.select(F.col("doc_id").alias("doc_id_a"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("doc_id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    jac = inter / (F.size("ga") + F.size("gb") - inter)
    exact = (
        a.join(b, F.col("doc_id_a") < F.col("doc_id_b"))
        .filter(jac >= threshold)
        .select("doc_id_a", "doc_id_b")
    )
    ver = (
        minhash_verified_pairs(sample, n=n, threshold=threshold)
        .select("doc_id_a", "doc_id_b")
        .withColumn("_v", F.lit(1))
    )
    counts = exact.join(ver, ["doc_id_a", "doc_id_b"], "left").agg(
        F.count("*").cast("long").alias("n_exact_pairs"),
        F.count("_v").cast("long").alias("n_lsh_found"),
    )
    nsamp = sample.agg(F.count("*").cast("long").alias("n_sample_docs"))
    return counts.crossJoin(F.broadcast(nsamp)).select(
        "n_sample_docs",
        "n_exact_pairs",
        "n_lsh_found",
        F.when(F.col("n_exact_pairs") == 0, F.lit(1.0))
        .otherwise(
            F.col("n_lsh_found").cast("double")
            / F.col("n_exact_pairs").cast("double")
        )
        .alias("recall"),
    )


def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_recall_report(load(spark, sf_dir, "documents"))


QUERIES["dedup_lsh_recall_report"] = dedup_lsh_recall_report

# mirrors _auto_mod: mod = max(floor, ceil(corpus_count / target)) as a
# scalar subquery so the oracle tracks the Spark side at ANY corpus size
_SAMPLE_PRED = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % "
    f"(SELECT GREATEST({RECALL_SAMPLE_MOD}, "
    f"CAST(ceil(count(*) / {RECALL_SAMPLE_TARGET}.0) AS BIGINT)) "
    "FROM documents) = 0"
)
# the verified-pairs pipeline, scoped to the SAME hash sample (every
# stage — signatures, band caps, verify — sees only sample docs, exactly
# like the Spark side running minhash_verified_pairs(sample))
_VER_ON_SAMPLE = ORACLE["dedup_minhash_verified"].replace(
    "FROM documents", f"FROM (SELECT * FROM documents WHERE {_SAMPLE_PRED})"
)

ORACLE["dedup_lsh_recall_report"] = f"""
    WITH s AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE {_SAMPLE_PRED}
    ), g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - {_MH_N} + 2),
                 i -> array_to_string(list_slice(toks, i, i + {_MH_N} - 1), ' '))) AS grams
      FROM s WHERE len(toks) >= {_MH_N}
    ), exact AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.grams, b.grams))
            / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
            >= 0.5
    ), ver AS (
      SELECT doc_id_a, doc_id_b FROM ({_VER_ON_SAMPLE}) v
    ), cnt AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
             CAST(count(ver.doc_id_a) AS BIGINT) AS n_lsh_found
      FROM exact LEFT JOIN ver USING (doc_id_a, doc_id_b)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE {_SAMPLE_PRED})
             AS n_sample_docs,
           n_exact_pairs, n_lsh_found,
           CASE WHEN n_exact_pairs = 0 THEN 1.0
                ELSE CAST(n_lsh_found AS DOUBLE) / CAST(n_exact_pairs AS DOUBLE)
           END AS recall
    FROM cnt
"""


# ---------------------------------------------------------------------------
# Exact Jaccard join via prefix filtering (AllPairs, r7)
# ---------------------------------------------------------------------------

# τ = 3/5: integer ratio so the threshold comparison is exact on both
# engines (5·inter ≥ 3·union, never a float boundary)
JPREFIX_TAU_NUM = 3
JPREFIX_TAU_DEN = 5
JPREFIX_SAMPLE_TARGET = 500  # registry-entry sample size (see docstring)


def jaccard_prefix_candidates(
    docs: DataFrame,
    tau_num: int = JPREFIX_TAU_NUM,
    tau_den: int = JPREFIX_TAU_DEN,
) -> DataFrame:
    """The candidate-generation half of :func:`jaccard_prefix_pairs` —
    distinct (doc_id_a, doc_id_b) pairs sharing a rarest-first prefix
    token.  Split out so the stress harness can measure candidate volume
    against n²/2 directly (the prefix-theorem payoff is THIS number; the
    verified output only bounds it from below)."""
    # the exploded token relation feeds sized/dfreq/prefix — cache it so
    # the tokenize+explode subtree runs once, not once per consumer
    toks = bounded_cache(
        docs.select(
            "doc_id", F.explode(F.array_distinct(tokens_expr())).alias("tok")
        )
    )
    sized = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_tok"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    prefix = (
        toks.join(dfreq, "tok")
        .withColumn("pos", F.row_number().over(w))
        .join(sized, "doc_id")
        # L = n − ceil(τ·n) + 1, with ceil via (a+b−1) div b (positive ints,
        # so Spark div and DuckDB // agree)
        .filter(
            F.col("pos")
            <= F.col("n_tok")
            - F.expr(f"({tau_num} * n_tok + {tau_den} - 1) div {tau_den}")
            + 1
        )
        .select("doc_id", "tok")
    )
    return (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )


def jaccard_prefix_pairs(
    docs: DataFrame,
    tau_num: int = JPREFIX_TAU_NUM,
    tau_den: int = JPREFIX_TAU_DEN,
) -> DataFrame:
    """EXACT corpus-wide token-set Jaccard ≥ τ join via prefix filtering
    (the AllPairs family, Bayardo et al. WWW'07) — the third point in
    the similarity-join design space alongside the blocked quadratic
    (``dedup_ngram_jaccard``: exact but only within blocks) and MinHash
    LSH (corpus-wide but probabilistic): corpus-wide AND exact, with
    pruning that does not cost recall.

    The prefix theorem: under any GLOBAL total order on tokens, two
    sets with Jaccard ≥ τ must share a token within each one's first
    ``|s| − ⌈τ·|s|⌉ + 1`` tokens.  Ordering by ascending document
    frequency puts the RAREST tokens in the prefix, so the candidate
    self-join runs over the thin end of the token distribution — a
    stop-word never generates a candidate pair unless it survives into
    some document's prefix.  Candidates are then verified with one
    exact ``array_intersect`` per pair; the threshold compare is pure
    integer (``tau_den·inter ≥ tau_num·union``).

    Scale: df ranking is one aggregate + one per-doc window (partitioned
    by doc — parallel); the candidate join shuffles only prefix tokens
    (∝ (1−τ)·total tokens); verification is candidate-bounded.  No
    false negatives anywhere — the oracle is the plain n²/2 SQL join."""
    cand = jaccard_prefix_candidates(docs, tau_num, tau_den)
    arrs = docs.select(
        "doc_id", F.array_sort(F.array_distinct(tokens_expr())).alias("toks")
    )
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb"))).cast("long")
    uni = (F.size(F.col("ta")) + F.size(F.col("tb"))).cast("long") - inter
    return (
        cand.join(
            arrs.select(F.col("doc_id").alias("doc_id_a"), F.col("toks").alias("ta")),
            "doc_id_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_id_b"), F.col("toks").alias("tb")),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            inter.alias("inter"),
            uni.alias("uni"),
        )
        .filter(F.lit(tau_den) * F.col("inter") >= F.lit(tau_num) * F.col("uni"))
    )


def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the prefix-filtered exact join on the
    deterministic md5 auto-mod sample (the ``lsh_recall_report``
    idiom).  The synthetic corpus is template-generated and therefore
    near-dup DENSE — ~57% of ALL doc pairs clear τ=0.6 at sf0.01 — so
    the exact pair OUTPUT itself is quadratic in corpus size no matter
    the algorithm; the sample keeps the entry's cost corpus-size-
    independent while exercising every stage.  On a real corpus
    (near-dup density ~1%), call :func:`jaccard_prefix_pairs` on the
    full table — prefix pruning, not output volume, is then the
    binding cost."""
    docs = load(spark, sf_dir, "documents")
    # half the recall-report target: the dense output makes verify cost
    # ∝ sample², so ~500 docs keeps the entry in the bench noise floor
    mod = _auto_mod(docs.count(), target=JPREFIX_SAMPLE_TARGET)
    key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return jaccard_prefix_pairs(docs.filter(key % mod == 0))


QUERIES["dedup_jaccard_prefix"] = dedup_jaccard_prefix

ORACLE["dedup_jaccard_prefix"] = f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
      WHERE len(list_distinct({_TOKS})) > 0
        AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % (SELECT GREATEST({RECALL_SAMPLE_MOD},
                 CAST(ceil(count(*) / {JPREFIX_SAMPLE_TARGET}.0) AS BIGINT))
               FROM documents) = 0
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
           CAST(len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE {JPREFIX_TAU_DEN} * len(list_intersect(a.toks, b.toks))
          >= {JPREFIX_TAU_NUM} * (len(a.toks) + len(b.toks)
                                  - len(list_intersect(a.toks, b.toks)))
"""


# ---------------------------------------------------------------------------
# planner-sized banding under the gate (VERDICT r10 #2)
# ---------------------------------------------------------------------------

# a HIGH-threshold dedup pass (0.8 Jaccard — near-exact scrape copies)
# with a 0.95 recall floor: the law derives r=6 × b=10, not the default
# r=4 × 16 that fits the 0.5 gate threshold — the planner's geometry,
# not the constant's, executes under the hash gate
MINHASH_PLAN_THRESHOLD = 0.8
MINHASH_PLAN_TARGET_RECALL = 0.95
_MINHASH_GATE_PLAN = plan_minhash(
    MINHASH_PLAN_THRESHOLD, MINHASH_PLAN_TARGET_RECALL
)


def dedup_minhash_planned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: a PLANNER-SIZED MinHash-LSH dedup run — band
    geometry (b, r) comes from ``plan_minhash``'s S-curve solve for the
    (threshold, recall-target) pair, not from ``_BAND_ROWS``, and the
    whole derived configuration executes under the hash gate: the
    oracle's band slicing and verify threshold are f-string-built FROM
    the same plan object, so a planner retune re-derives the oracle
    automatically (the ``dedup_semantic_planned`` pattern,
    operators/similarity.py).  The prediction itself is pytest-pinned
    against the measured per-pair candidate expectation on the gate
    corpus (tests/test_dedup.py)."""
    docs = load(spark, sf_dir, "documents")
    return minhash_verified_pairs(docs, n=3, plan=_MINHASH_GATE_PLAN)


QUERIES["dedup_minhash_planned"] = dedup_minhash_planned

ORACLE["dedup_minhash_planned"] = _minhash_verified_sql(
    _MINHASH_GATE_PLAN.band_rows, _MINHASH_GATE_PLAN.jaccard_threshold
)
