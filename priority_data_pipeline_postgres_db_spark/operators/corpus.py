"""Training-corpus preparation operators (BASELINE.json north star —
the steps between raw documents and a training run that the reference's
ELT surface stops short of).

Three operators, each deterministic and oracle-checked:

- **connected-components dedup clustering** — near-dup PAIRS (any of the
  dedup families) only say "these two overlap"; a training pipeline needs
  the transitive closure: one cluster id per group of mutually-near docs,
  so exactly one survivor per cluster ships.  Implemented as iterative
  min-label propagation (the standard large-graph CC: per round each node
  takes the min label among itself and its neighbors; rounds = graph
  diameter, and near-dup components are shallow).  Each round is one
  shuffle on ``dst``; lineage is truncated per round (localCheckpoint) so
  plans don't snowball — at cluster scale swap in ``checkpoint`` against
  a real checkpoint dir.
- **hash split** — deterministic train/validation/test assignment from a
  content-stable hash of the key (md5-60, the same engine-portable hash
  the LSH family uses).  Pure JVM expressions — no UDF, no RNG, no state:
  re-running on a grown corpus never reshuffles old docs across splits.
- **sequence packing** — concat-and-chunk layout: per language stream
  (ordered by doc_id), each doc starts at the running token offset and
  lands in sequence ``floor(offset / capacity)``.  One window sum —
  engine-exact integer math.  At 100 TB the per-lang window is the
  bottleneck when one language dominates; ``pack_sequences_sharded``
  is the scale path — same values, computed via
  ``ranking.grouped_running_sum`` (range shards + driver prefix
  offsets), hash-matched against the same oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..plans.tables import load
from ..util import bounded_cache
from .dedup import _TOKS, minhash_verified_pairs, tokens_expr


class FixedPointOverflowError(ValueError):
    """A fixed-point integer score would exceed int64, where Spark
    (non-ANSI) wraps silently while DuckDB raises — refused loudly
    instead, like :class:`~.dedup.QuadraticScaleError` (ADVICE r5)."""


# ---------------------------------------------------------------------------
# connected components over near-dup pairs
# ---------------------------------------------------------------------------

#: edge-count bound for the driver-side union-find shortcut below — the
#: broadcast-hash-join sizing argument applied to CC: ≤2M edges is
#: ≈64 MB of id pairs on the driver, and union-find labels them in
#: O(E·α) single-process time, vs O(diameter) distributed rounds each
#: paying joins + checkpoints + a convergence action (measured: the
#: sf0.1 semantic near-dup graph needs 10 rounds ≈ 8 s for 4k edges).
#: Above the bound the exact same min-label loop as before runs — the
#: 100 TB path is untouched.
CC_DRIVER_EDGE_BOUND = 2_000_000


def _cc_driver_labels(e: DataFrame) -> dict | None:
    """Union-find over a collected edge list — see
    :func:`_cc_driver_labels_pdf`."""
    return _cc_driver_labels_pdf(e.toPandas())


def _cc_driver_labels_pdf(pdf) -> dict | None:
    """Union-find (path compression + union by rank) over a collected
    edge list: node -> min reachable node id, for edge-endpoint nodes
    only (singletons are restored by the caller's left join, exactly as
    in the distributed loop).  Returns None when an edge endpoint is
    NULL — the caller falls back to the distributed loop rather than
    guessing comparison semantics."""
    if len(pdf) and (pdf["src"].isna().any() or pdf["dst"].isna().any()):
        return None
    parent: dict = {}
    rank: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["src"], pdf["dst"]):
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rank.get(ra, 0) < rank.get(rb, 0):
            ra, rb = rb, ra
        parent[rb] = ra
        if rank.get(ra, 0) == rank.get(rb, 0):
            rank[ra] = rank.get(ra, 0) + 1
    # min id per root (python < on ints/strings == Spark's min ordering:
    # int64 numeric; UTF-8 byte order preserves code-point order)
    comp_min: dict = {}
    seen = set(parent)
    seen.update(pdf["src"])
    seen.update(pdf["dst"])
    labels: dict = {}
    for x in seen:
        r = find(x)
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    for x in seen:
        labels[x] = comp_min[find(x)]
    return labels


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "doc_id",
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    max_iters: int = 25,
    restore_singletons: bool = True,
) -> DataFrame:
    """(node, component) with component = min node id reachable — exact CC
    via min-label propagation.

    ``restore_singletons=False`` returns labels for EDGE-ENDPOINT nodes
    only (skipping the final left join against ``nodes``) — for
    compositions that immediately re-filter to ``component != node``
    (``connected_components_incremental``'s star compression), where the
    full-node join is computed work the next operator throws away.

    Scale design: the loop runs ONLY over the edge-induced subgraph.  In a
    near-dup graph almost every node is a singleton — those never enter the
    iteration; they rejoin at the end with component = own id.  Labels are
    seeded with ``min(self, min neighbor)``, so pair and star components
    (the overwhelming shape of near-dup clusters) are already converged at
    seed time and the loop only runs for chains/larger diameters.
    Convergence is detected by the (monotonically decreasing) global label
    sum; the loop is driver-side but touches one scalar per round, and the
    round count is the component diameter, not the data size.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # materialize the edge set ONCE — every propagation round joins against
    # it, and recomputing an expensive upstream pair plan (e.g. an LSH
    # verify chain) per round would dominate
    e = e.localCheckpoint()
    # Size the LOOP's shuffles to the SUBGRAPH, not the session default:
    # every round pays a fixed per-partition term (task launch, state
    # files), and a near-dup edge set is typically orders of magnitude
    # smaller than the corpus the session's shuffle.partitions is tuned
    # for (sf0.1: 251 edges across 32 partitions cost the loop 5.0 s;
    # 2 partitions cost 2.4 s).  ~100k edge-rows per partition, never
    # ABOVE the session default (a billion-edge graph keeps the
    # cluster-tuned width).  Sizing is via EXPLICIT hash repartition on the
    # loop keys (no session-conf mutation — VERDICT r3): ``repartition(n,
    # key)`` yields HashPartitioning(key, n), which satisfies the join /
    # groupBy distribution requirement on that key, so EnsureRequirements
    # inserts no further exchange and every loop shuffle runs loop_parts
    # wide.  Concurrent jobs in the session are untouched.
    spark = nodes.sparkSession
    # one bounded collect doubles as the size probe AND the driver path's
    # edge list (was: a count job, then a separate toPandas — one Spark
    # job per CC call saved; the checkpoint means neither re-runs the
    # upstream pair pipeline).  limit(bound+1) keeps the collect bounded
    # when the edge set is huge: one extra row proves the bound is
    # exceeded and the distributed loop takes over.
    probe_pdf = e.limit(CC_DRIVER_EDGE_BOUND + 1).toPandas()
    n_edges = len(probe_pdf)
    if n_edges <= CC_DRIVER_EDGE_BOUND:
        # small edge set: label it on the driver (see CC_DRIVER_EDGE_BOUND)
        labels_map = _cc_driver_labels_pdf(probe_pdf)
        if labels_map is not None:
            node_type = nodes.schema[node_col].dataType
            schema = T.StructType(
                [
                    T.StructField(node_col, node_type),
                    T.StructField("component", node_type),
                ]
            )
            if labels_map:
                # pandas frame → Arrow createDataFrame path: ~free even at
                # the 2M-edge bound (a list of Python tuples is pickled
                # row-at-a-time)
                lpdf = pd.DataFrame(
                    {
                        node_col: list(labels_map.keys()),
                        "component": list(labels_map.values()),
                    }
                )
                labels = spark.createDataFrame(lpdf, schema)
            else:
                labels = spark.createDataFrame([], schema)
            if not restore_singletons:
                return labels
            return nodes.select(node_col).join(labels, node_col, "left").select(
                node_col,
                F.coalesce("component", F.col(node_col)).alias("component"),
            )
    else:
        n_edges = e.count()  # exact size for loop-width sizing (cheap: checkpointed)
    del probe_pdf
    try:
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" on some platforms
        session_parts = 200
    loop_parts = min(session_parts, max(2, (2 * n_edges) // 100_000 + 1))
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(loop_parts, "src")
        .localCheckpoint()
    )
    # seed: component = min over {self} ∪ neighbors (symmetric edges
    # mean grouping by src covers every edge endpoint)
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_nbr_min"))
        .select(
            F.col("src").alias(node_col),
            F.least(F.col("src"), F.col("_nbr_min")).alias("component"),
        )
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["src"] == labels[node_col])
            .select("dst", "component")
            .repartition(loop_parts, "dst")
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr_min, labels[node_col] == nbr_min["dst"], "left")
            .select(
                node_col,
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .repartition(loop_parts, node_col)
            .localCheckpoint()  # truncate lineage: plans must not snowball
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if not restore_singletons:
        return labels
    # singletons (no incident edge) are their own component — one left
    # join against the (small) subgraph labels restores the full node set
    return nodes.select(node_col).join(labels, node_col, "left").select(
        node_col,
        F.coalesce("component", F.col(node_col)).alias("component"),
    )


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster id per document from the MinHash-LSH-verified near-dup
    graph (same parameters as ``dedup_minhash_verified``); singleton docs
    are their own cluster.

    Edge source (VERDICT r2 #1): candidates come from the LSH band join —
    linear in the corpus — then exact n-gram Jaccard verifies only those
    pairs.  The previous source, blocked all-pairs Jaccard, was quadratic
    within each (lang, source) block (STRESS_x30: 55.8× wall growth at
    30× data); the CC iteration itself was always linear in the edge set,
    so swapping the edge source is the whole fix.
    """
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_verified_pairs(docs, n=3, threshold=0.5)
    return connected_components(docs.select("doc_id"), pairs)


# ---------------------------------------------------------------------------
# deterministic hash split
# ---------------------------------------------------------------------------

_SPLIT_BUCKETS = 100
_TRAIN_LT = 90  # buckets [0, 90) → train
_VAL_LT = 95  # [90, 95) → validation, [95, 100) → test


def hash_bucket_expr(col: str, buckets: int = _SPLIT_BUCKETS):
    """Deterministic bucket from the md5-60 hash of the key — all JVM
    expressions (md5 + conv stay in codegen), identical in DuckDB as
    ``('0x'||substr(md5(CAST(k AS VARCHAR)),1,15))::BIGINT % buckets``."""
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def split_expr(key_col: str = "doc_id"):
    """THE train/validation/test split — one expression over the md5-60
    bucket of ``key_col``; every operator that needs the split uses this
    (r6 review: four hand copies had accumulated, the r4 drift shape)."""
    bucket = hash_bucket_expr(key_col)
    return (
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "validation")
        .otherwise("test")
    )


def split_case_sql(key_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`split_expr`, parameterized on the key."""
    bucket = (
        f"('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {_SPLIT_BUCKETS}"
    )
    return (
        f"CASE WHEN {bucket} < {_TRAIN_LT} THEN 'train'\n"
        f"                WHEN {bucket} < {_VAL_LT} THEN 'validation'\n"
        f"                ELSE 'test' END"
    )


def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        hash_bucket_expr("doc_id").alias("bucket"),
        split_expr().alias("split"),
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

SEQ_CAPACITY = 2048


def pack_sequences(docs: DataFrame, capacity: int = SEQ_CAPACITY) -> DataFrame:
    """Assign each doc its (seq_id, seq_offset) in a concat-and-chunk
    token stream per language: running token offset via one window sum,
    sequence = offset // capacity.  Integer math end to end."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id", "lang", F.size(tokens_expr()).cast("long").alias("n_tokens")
        )
        .withColumn("seq_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("seq_id", F.floor(F.col("seq_start") / capacity))
        .withColumn("seq_offset", F.col("seq_start") % capacity)
    )


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# source-mix capping and quality-weighted sampling
# ---------------------------------------------------------------------------

SOURCE_CAP = 200


def corpus_source_cap(
    spark: SparkSession, sf_dir: str, max_per_source: int = SOURCE_CAP
) -> DataFrame:
    """Source-mix capping: at most ``max_per_source`` docs per source,
    deterministically chosen (row_number by doc_id — stable under re-runs
    and corpus growth for already-selected docs).  One shuffle on the
    source key; the classic guard against one crawl dominating the mix."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= max_per_source)
    )


def corpus_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling WITHOUT randomness: a doc survives
    iff its md5-60 bucket (of 1000) falls below floor(quality × 1000) —
    survival probability tracks the quality score, yet the decision is a
    pure function of (doc_id, text), so re-runs and incremental rebuilds
    keep identical docs.  All codegen expressions."""
    from ..functions.text import quality_score_expr, tokenized

    docs = tokenized(load(spark, sf_dir, "documents"), "lang")
    _, score = quality_score_expr(F.col("toks"), F.col("norm"))
    scored = docs.filter(F.size("toks") > 0).select(
        "doc_id", "lang", score.alias("quality_score")
    )
    bucket = hash_bucket_expr("doc_id", buckets=1000)
    return scored.filter(
        bucket < F.floor(F.col("quality_score") * 1000)
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (cross-split n-gram leakage)
# ---------------------------------------------------------------------------

DECON_N = 13  # the customary "13-gram overlap" contamination test


def decontaminate(docs_with_split: DataFrame, n: int = DECON_N) -> DataFrame:
    """Flag evaluation-split documents that share any word ``n``-gram with
    the training split — the standard benchmark-decontamination check run
    before shipping an eval set.  Input carries (doc_id, lang, split,
    text); output is one row per contaminated non-train doc with its
    shared-gram count.

    Shape at scale: explode distinct n-grams (narrow), one shuffle to
    distinct the train gram set, one equi-join on the gram — cost tracks
    gram volume, not docs².  At 100 TB hash each gram to 64 bits first
    (same join, 8-byte keys); here the raw string keeps the oracle exact.
    Docs shorter than ``n`` tokens have no grams and can't be flagged.
    """
    from .dedup import ngrams_expr

    grams = docs_with_split.select(
        "doc_id", "split", F.explode(ngrams_expr(tokens_expr(), n)).alias("gram")
    )
    train_grams = grams.filter(F.col("split") == "train").select("gram").distinct()
    ev = grams.filter(F.col("split") != "train")
    return (
        ev.join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
        .join(docs_with_split.select("doc_id", "lang", "split"), "doc_id")
        .select("doc_id", "lang", "split", "n_shared_grams")
    )


def corpus_decontaminate(spark: SparkSession, sf_dir: str, n: int = DECON_N) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return decontaminate(
        docs.select("doc_id", "lang", split_expr().alias("split"), "text"), n
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (the 100 TB shuffle killer)
# ---------------------------------------------------------------------------

# ~16 bits/key + 11 probes → fpp ≈ 5e-4: a false positive only costs one
# extra row through the confirming equi-join, never a wrong result
_BLOOM_BITS_PER_KEY = 16
_BLOOM_K = 11
BLOOM_MAX_KEYS = 50_000_000  # 16 b/key → ≤100 MB of driver bits


class BroadcastScopeError(ValueError):
    """The 'small' side of a broadcast-filter pattern is not small —
    refused loudly (like :class:`~.dedup.QuadraticScaleError`) instead
    of silently OOMing the driver."""


def _bloom_hash_halves(hashes: "np.ndarray", mask: int):
    hv = hashes.astype(np.int64, copy=False).view(np.uint64)
    h1 = hv & np.uint64(mask)
    h2 = (hv >> np.uint64(33)) | np.uint64(1)  # odd → full-period stride
    return h1, h2


def _bloom_build(hashes: "np.ndarray"):
    """Bit array + mask from int64 keys (double hashing: k probes at
    h1 + i*h2 mod m, m a power of two)."""
    n = max(len(hashes), 1)
    m = 1 << max(13, (n * _BLOOM_BITS_PER_KEY - 1).bit_length())
    mask = m - 1
    bits = np.zeros(m >> 3, dtype=np.uint8)
    h1, h2 = _bloom_hash_halves(hashes, mask)
    for i in range(_BLOOM_K):
        idx = (h1 + np.uint64(i) * h2) & np.uint64(mask)
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(3)).astype(np.int64),
            np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
        )
    return bits, mask


def _bloom_might_contain_udf(bc_bits, mask: int):
    """Arrow-batched membership test over ``xxhash64`` keys; the bit
    array rides an explicit SparkContext broadcast (shipped once per
    executor, not per task)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("boolean")
    def _might(h: pd.Series) -> pd.Series:
        bits = bc_bits.value
        h1, h2 = _bloom_hash_halves(h.to_numpy(dtype=np.int64), mask)
        out = np.ones(len(h1), dtype=bool)
        for i in range(_BLOOM_K):
            idx = (h1 + np.uint64(i) * h2) & np.uint64(mask)
            out &= (
                bits[(idx >> np.uint64(3)).astype(np.int64)]
                & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
            ) != 0
        return pd.Series(out)

    return _might


def decontaminate_bloom(
    docs_with_split: DataFrame,
    n: int = DECON_N,
    max_eval_keys: int = BLOOM_MAX_KEYS,
) -> DataFrame:
    """:func:`decontaminate` with the train side Bloom-prefiltered —
    value-identical output (same oracle), different 100 TB cost model.

    The plain shape shuffles EVERY distinct train n-gram to build the
    join side; at 100 TB that shuffle dominates the job even though the
    eval split (the benchmark suite) is tiny.  Here the eval grams'
    64-bit hashes become a ≤16-bit-per-key Bloom bit array broadcast to
    executors, and train grams are membership-tested in an Arrow batch
    BEFORE the distinct+join — a gram that cannot be in the eval set
    never leaves its scan partition.  No false negatives, so every truly
    shared gram still reaches the confirming equi-join; false positives
    (~5e-4) just ride along and fall out of the join.  Spark's own
    runtime bloom injection targets shuffle joins the planner can see —
    this pins the pattern explicitly ahead of the distinct, where the
    planner won't.  Refuses (``BroadcastScopeError``) if the eval side
    exceeds ``max_eval_keys`` — that is the signal the split roles are
    inverted, not a reason to spill."""
    from .dedup import ngrams_expr

    spark = docs_with_split.sparkSession
    grams = docs_with_split.select(
        "doc_id", "split", F.explode(ngrams_expr(tokens_expr(), n)).alias("gram")
    )
    ev = grams.filter(F.col("split") != "train")
    ev_keys = ev.select(F.xxhash64("gram").alias("h")).distinct()
    # one pass serves both the scope guard and the build (ADVICE r7: a
    # separate count() paid the explode+distinct scan twice) — the
    # limit(max+1) bounds the driver collect even when the guard fires
    key_pdf = ev_keys.limit(max_eval_keys + 1).toPandas()
    if len(key_pdf) > max_eval_keys:
        raise BroadcastScopeError(
            f"decontaminate_bloom: eval split has > {max_eval_keys} "
            "distinct grams; the Bloom build would not fit the driver — "
            "use decontaminate() or shrink the eval split"
        )
    keys = key_pdf["h"].to_numpy(dtype=np.int64)
    bits, mask = _bloom_build(keys)
    might = _bloom_might_contain_udf(spark.sparkContext.broadcast(bits), mask)
    train_grams = (
        grams.filter(F.col("split") == "train")
        .filter(might(F.xxhash64("gram")))
        .select("gram")
        .distinct()
    )
    return (
        ev.join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
        .join(docs_with_split.select("doc_id", "lang", "split"), "doc_id")
        .select("doc_id", "lang", "split", "n_shared_grams")
    )


def corpus_decontaminate_bloom(
    spark: SparkSession, sf_dir: str, n: int = DECON_N
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return decontaminate_bloom(
        docs.select("doc_id", "lang", split_expr().alias("split"), "text"), n
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no lookarounds, no backslash-class shorthands beyond \b
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\+?[0-9][0-9() -]{7,}[0-9]"


def corpus_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact PII-shaped spans (emails, IPv4s, phone-ish digit
    runs) — pure JVM regexp expressions in codegen, scan-speed at any
    scale.  Redaction order (email → ip → phone) is fixed and mirrored in
    the oracle so overlapping matches resolve identically."""
    docs = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_IPV4), 0)).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), 0)).cast("long").alias("n_phones"),
        redacted.alias("redacted_text"),
    )


# ---------------------------------------------------------------------------
# flagship composition: documents → deduped, quality-gated, split corpus
# ---------------------------------------------------------------------------

QUALITY_THRESHOLD = 0.5


def corpus_build_training_set(
    spark: SparkSession, sf_dir: str, quality_threshold: float = QUALITY_THRESHOLD
) -> DataFrame:
    """The end-to-end corpus build a training run consumes, as ONE composed
    plan: near-dup clustering picks a canonical survivor per component
    (component == doc_id, the min-id representative), the quality gate
    drops low-score docs, and the deterministic hash split assigns
    train/validation/test.  Each stage is the already-verified operator —
    the composition is joins and filters, all Catalyst-visible."""
    from ..functions.text import quality_score_expr, tokenized

    docs = load(spark, sf_dir, "documents")
    comp = dedup_connected_components(spark, sf_dir)
    survivors = comp.filter(F.col("component") == F.col("doc_id")).select("doc_id")
    toks = tokenized(docs, "lang")
    _, score = quality_score_expr(F.col("toks"), F.col("norm"))
    scored = toks.filter(F.size("toks") > 0).select(
        "doc_id", "lang", score.alias("quality_score")
    )
    return (
        scored.join(survivors, "doc_id")
        .filter(F.col("quality_score") >= quality_threshold)
        .withColumn("split", split_expr())
    )


# ---------------------------------------------------------------------------
# length bucketing (batch-shape planning)
# ---------------------------------------------------------------------------

_BUCKET_BOUNDS = [16, 32, 64, 128, 256, 512, 1024, 2048]


def length_buckets(docs: DataFrame) -> DataFrame:
    """Token-length histogram over power-of-two padding buckets, with the
    padding waste a fixed-shape batcher would pay (sum of bucket_size −
    n_tokens).  The training-efficiency planning query: pick bucket
    boundaries / pack-vs-pad strategy from real length mass, not guesses.

    The bucket is a CASE ladder over integer token counts — no log2/float
    (libm results differ across engines); pure codegen, one shuffle on
    the (tiny) bucket key with map-side partial aggregation."""
    n = F.size(tokens_expr()).cast("long")
    bucket = F.when(n <= _BUCKET_BOUNDS[0], F.lit(_BUCKET_BOUNDS[0]))
    for b in _BUCKET_BOUNDS[1:]:
        bucket = bucket.when(n <= b, F.lit(b))
    bucket = bucket.otherwise(F.lit(-1))  # overlong: truncate/split upstream
    per_doc = docs.select(n.alias("n_tokens"), bucket.cast("long").alias("bucket"))
    return per_doc.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum(
            F.when(F.col("bucket") > 0, F.col("bucket") - F.col("n_tokens")).otherwise(0)
        ).alias("padding_waste"),
    )


def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_buckets(load(spark, sf_dir, "documents"))


def dup_rate_by_source(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Per-source duplication report: of each source's documents, how many
    participate in at least one verified near-dup pair — the observability
    number a crawl/ingest operator watches (a source whose dup_rate jumps
    is re-scraping itself or mirroring another source).

    Scale shape: ``pairs`` is the LSH-verified edge set (linear path); the
    endpoint set is two projections + distinct (one shuffle bounded by
    |dup docs|), the report one broadcast-joinable left join + a groupBy
    on source.  dup_rate is int/int → IEEE double, bit-exact in both
    engines.
    """
    dup = (
        pairs.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(dup, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("_dup").alias("n_dup_docs"),
        )
        .withColumn(
            "dup_rate",
            F.col("n_dup_docs").cast("double") / F.col("n_docs").cast("double"),
        )
    )


def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dup_rate_by_source(docs, minhash_verified_pairs(docs, n=3, threshold=0.5))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "corpus_dup_rate_by_source": corpus_dup_rate_by_source,
    "corpus_length_buckets": corpus_length_buckets,
    "dedup_connected_components": dedup_connected_components,
    "corpus_hash_split": corpus_hash_split,
    "corpus_pack_sequences": corpus_pack_sequences,
    "corpus_build_training_set": corpus_build_training_set,
    "corpus_decontaminate": corpus_decontaminate,
    "corpus_decontaminate_bloom": corpus_decontaminate_bloom,
    "corpus_redact_pii": corpus_redact_pii,
    "corpus_source_cap": corpus_source_cap,
    "corpus_quality_sample": corpus_quality_sample,
}

# import composes the LSH-verified pair SQL so the edge set stays
# definition-identical with dedup_minhash_verified's oracle
from .dedup import ORACLE as _DEDUP_ORACLE  # noqa: E402

ORACLE = {
    "corpus_dup_rate_by_source": f"""
        WITH pairs AS (
          SELECT * FROM ({_DEDUP_ORACLE["dedup_minhash_verified"]}) t
        ), dup AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id_a AS doc_id FROM pairs
            UNION ALL
            SELECT doc_id_b AS doc_id FROM pairs
          )
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(dup.doc_id) AS BIGINT) AS n_dup_docs,
               CAST(count(dup.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate
        FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
        GROUP BY d.source
    """,
    "dedup_connected_components": f"""
        WITH RECURSIVE pairs AS (
          SELECT * FROM ({_DEDUP_ORACLE["dedup_minhash_verified"]}) t
        ), edges AS (
          SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
          UNION ALL
          SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
        ), reach(root, node) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src
        )
        SELECT root AS doc_id, CAST(min(node) AS BIGINT) AS component
        FROM reach GROUP BY root
    """,
    "corpus_hash_split": f"""
        WITH b AS (
          SELECT doc_id, lang,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % {_SPLIT_BUCKETS} AS bucket
          FROM documents
        )
        SELECT doc_id, lang, bucket,
               CASE WHEN bucket < {_TRAIN_LT} THEN 'train'
                    WHEN bucket < {_VAL_LT} THEN 'validation'
                    ELSE 'test' END AS split
        FROM b
    """,
    "corpus_pack_sequences": f"""
        WITH t AS (
          SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
          FROM documents
        ), s AS (
          SELECT doc_id, lang, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS seq_start
          FROM t
        )
        SELECT doc_id, lang, n_tokens, seq_start,
               seq_start // {SEQ_CAPACITY} AS seq_id,
               seq_start % {SEQ_CAPACITY} AS seq_offset
        FROM s
    """,
}

# composed from the already-verified per-stage oracles (the CC subquery
# carries its own WITH RECURSIVE; quality SQL is text.ORACLE's)
from ..functions.text import ORACLE as _TEXT_ORACLE  # noqa: E402

_BUCKET_SQL = (
    f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {_SPLIT_BUCKETS}"
)
_SPLIT_CASE = split_case_sql("doc_id")

ORACLE["corpus_decontaminate"] = f"""
    WITH s AS (
      SELECT doc_id, lang, {_SPLIT_CASE} AS split, {_TOKS} AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, split,
             unnest(list_distinct(list_transform(range(1, len(toks) - {DECON_N} + 2),
                 i -> array_to_string(list_slice(toks, i, i + {DECON_N} - 1), ' ')))) AS gram
      FROM s WHERE len(toks) >= {DECON_N}
    ), tg AS (
      SELECT DISTINCT gram FROM g WHERE split = 'train'
    ), ev AS (
      SELECT doc_id, gram FROM g WHERE split <> 'train'
    )
    SELECT ev.doc_id, s.lang, s.split,
           count(DISTINCT ev.gram) AS n_shared_grams
    FROM ev JOIN tg USING (gram) JOIN s ON s.doc_id = ev.doc_id
    GROUP BY ev.doc_id, s.lang, s.split
"""

# the Bloom prefilter is a pure cost optimization — no false negatives,
# false positives die in the confirming equi-join — so the bloom variant
# answers to the SAME oracle as the plain operator
ORACLE["corpus_decontaminate_bloom"] = ORACLE["corpus_decontaminate"]

ORACLE["corpus_source_cap"] = f"""
    SELECT doc_id, lang, source, CAST(source_rank AS INTEGER) AS source_rank FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS source_rank
      FROM documents
    ) WHERE source_rank <= {SOURCE_CAP}
"""

ORACLE["corpus_quality_sample"] = f"""
    WITH q AS (
      SELECT doc_id, quality_score
      FROM ({_TEXT_ORACLE["text_quality_score"]}) t
    )
    SELECT q.doc_id, d.lang, q.quality_score
    FROM q JOIN documents d ON d.doc_id = q.doc_id
    WHERE ('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
            < floor(q.quality_score * 1000)
"""

ORACLE["corpus_redact_pii"] = f"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_ips,
      CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
          '{_PII_IPV4}', '<IP>', 'g'),
        '{_PII_PHONE}', '<PHONE>', 'g') AS redacted_text
    FROM documents
"""

ORACLE["corpus_build_training_set"] = f"""
    WITH cc AS (
      SELECT * FROM ({ORACLE["dedup_connected_components"]}) c
    ), q AS (
      SELECT doc_id, quality_score FROM ({_TEXT_ORACLE["text_quality_score"]}) t
    )
    SELECT d.doc_id, d.lang, q.quality_score,
           CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % {_SPLIT_BUCKETS} < {_TRAIN_LT} THEN 'train'
                WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % {_SPLIT_BUCKETS} < {_VAL_LT} THEN 'validation'
                ELSE 'test' END AS split
    FROM documents d
    JOIN cc ON cc.doc_id = d.doc_id AND cc.component = d.doc_id
    JOIN q ON q.doc_id = d.doc_id
    WHERE q.quality_score >= {QUALITY_THRESHOLD}
"""


_BUCKET_CASE = (
    "CASE "
    + " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in _BUCKET_BOUNDS
    )
    + " ELSE -1 END"
)

ORACLE["corpus_length_buckets"] = f"""
    WITH per_doc AS (
      SELECT CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
    ), bucketed AS (
      SELECT n_tokens, CAST({_BUCKET_CASE} AS BIGINT) AS bucket FROM per_doc
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(CASE WHEN bucket > 0 THEN bucket - n_tokens ELSE 0 END)
                AS BIGINT) AS padding_waste
    FROM bucketed GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# token-window chunking (overlapping)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # size - overlap


def chunk_documents(
    docs: DataFrame, *, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Split each doc into overlapping token windows (chunk c covers
    tokens [c·stride, c·stride + size)) — the retrieval/context-window
    chunking step.  Whole pipeline is array expressions on the tokenized
    column: sequence → transform(slice) → posexplode, no Python, no
    shuffle at all (chunking is embarrassingly row-local; downstream
    consumers repartition as they need).  The final chunk starts at the
    last offset with any token, so every token lands in ≥1 chunk."""
    toks = tokens_expr()
    n = F.size(toks)
    # number of chunks: ceil(max(n - size, 0) / stride) + 1 for non-empty
    n_chunks = F.when(
        n <= size, F.lit(1)
    ).otherwise(F.floor((n - size + stride - 1) / stride) + 1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.slice(toks, c * stride + 1, size),
    )
    out = docs.filter(n > 0).select(
        "doc_id",
        F.posexplode(chunks).alias("chunk_id", "chunk_toks"),
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("chunk_toks").cast("long").alias("n_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    )


def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load(spark, sf_dir, "documents"))


QUERIES["corpus_chunk_documents"] = corpus_chunk_documents

ORACLE["corpus_chunk_documents"] = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t, len({_TOKS}) AS n FROM documents
    ), sized AS (
      SELECT doc_id, t, n,
             CASE WHEN n <= {CHUNK_SIZE} THEN 1
                  ELSE CAST(floor((n - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1)
                       / {CHUNK_STRIDE}) AS BIGINT) + 1 END AS n_chunks
      FROM toks WHERE n > 0
    ), exploded AS (
      SELECT doc_id, t,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM sized
    ), sliced AS (
      SELECT doc_id, chunk_id,
             t[(chunk_id * {CHUNK_STRIDE} + 1):(chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE})] AS ct
      FROM exploded
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(ct) AS BIGINT) AS n_tokens,
           list_aggregate(ct, 'string_agg', ' ') AS chunk_text
    FROM sliced
"""


# ---------------------------------------------------------------------------
# stratified sampling (RNG-free)
# ---------------------------------------------------------------------------

STRATUM_QUOTA = 20


def sample_stratified(docs: DataFrame, quota: int = STRATUM_QUOTA) -> DataFrame:
    """Fixed quota per (lang, source) stratum, chosen by md5-60 hash order
    — the RNG-free stratified sample: deterministic, stable under corpus
    growth (a doc's hash never changes, so adding data only displaces the
    quota boundary), and balanced across strata regardless of their raw
    mix.  One window shuffle on the stratum key."""
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("lang", "source").orderBy(h, "doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .select("doc_id", "lang", "source", F.col("_rn").cast("long").alias("sample_rank"))
    )


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_stratified(load(spark, sf_dir, "documents"))


QUERIES["corpus_sample_stratified"] = corpus_sample_stratified

ORACLE["corpus_sample_stratified"] = f"""
    SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS sample_rank FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id) AS rn
      FROM documents
    ) WHERE rn <= {STRATUM_QUOTA}
"""


# ---------------------------------------------------------------------------
# token-budget selection (greedy quality prefix)
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 8000


def token_budget_select(docs: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """Greedy token-budget selection: walk documents in (quality desc,
    doc_id) order and keep the prefix whose running token total stays
    within ``budget`` — "fill the training budget with the best tokens
    first".  Prefix semantics (not knapsack): once the budget is crossed,
    everything after the boundary is dropped.

    A naive global running sum is a single-partition window sort — the
    classic scale-killer.  Instead: bucket docs by floor(quality × 1000)
    (ordering by bucket is EXACT — floor is monotone in quality), roll up
    per-bucket token totals (≤ 1001 rows at any corpus size — driver-safe
    by construction), compute bucket prefix offsets once on the driver,
    prune whole buckets past the budget BEFORE any sort, then run the
    running sum per-bucket (parallel windows) and add the broadcast
    offset.  Exactly the histogram prefix-sum trick; bit-identical to the
    oracle's global window.  Zero-token docs are excluded (they'd make
    the running total non-strictly-monotone and survive arbitrarily deep
    past the boundary)."""
    from ..functions.text import quality_score_expr, tokenized

    toks = tokenized(docs)
    _, score = quality_score_expr(F.col("toks"), F.col("norm"))
    scored = (
        toks.filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            score.alias("quality_score"),
        )
        .withColumn(
            "qb", F.floor(F.col("quality_score") * F.lit(1000.0)).cast("int")
        )
    )
    # barrier: feeds the histogram AND the selection pass (rotated out by
    # later invocations instead of accumulating — ADVICE r2)
    scored = bounded_cache(scored)
    hist = scored.groupBy("qb").agg(F.sum("n_tokens").alias("btok")).collect()
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(hist, key=lambda r: -r["qb"]):
        offsets[r["qb"]] = run
        run += r["btok"]
    keep = [qb for qb, off in offsets.items() if off < budget]
    off_map = F.create_map(
        *[
            lit
            for qb in keep
            for lit in (F.lit(qb), F.lit(int(offsets[qb])).cast("long"))
        ]
    )
    w = Window.partitionBy("qb").orderBy(F.desc("quality_score"), F.asc("doc_id"))
    return (
        scored.filter(F.col("qb").isin(keep))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w) + off_map[F.col("qb")])
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "quality_score", "cum_tokens")
    )


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_select(load(spark, sf_dir, "documents"))


QUERIES["corpus_token_budget"] = corpus_token_budget

ORACLE["corpus_token_budget"] = f"""
    SELECT doc_id, n_tokens, quality_score, cum_tokens FROM (
      SELECT doc_id,
             CAST(n_tokens AS INTEGER) AS n_tokens,
             quality_score,
             CAST(sum(n_tokens) OVER (
               ORDER BY quality_score DESC, doc_id ASC
             ) AS BIGINT) AS cum_tokens
      FROM ({_TEXT_ORACLE["text_quality_score"]}) t
    ) WHERE cum_tokens <= {TOKEN_BUDGET}
"""


# ---------------------------------------------------------------------------
# source interleaving (training-order mixing)
# ---------------------------------------------------------------------------


def interleave_sources(docs: DataFrame) -> DataFrame:
    """Deterministic round-robin training order across sources: reading in
    ``interleave_key`` order visits source A's 1st doc, B's 1st, C's 1st,
    then A's 2nd, ... — the standard guard against source-ordered training
    (a model that sees one crawl for its first N steps).

    No global sort is materialized: the key is
    ``(src_rank − 1) × n_sources + src_idx`` — per-source windows (one
    shuffle on source, parallel across sources) plus a broadcast join of
    the tiny distinct-source index.  Gaps appear once short sources
    exhaust; the key stays strictly ordering-correct.  All integer math,
    bit-exact against the oracle."""
    srcs = docs.select("source").distinct()
    n_src = srcs.count()
    idx = srcs.withColumn(
        "src_idx",
        F.row_number().over(Window.partitionBy().orderBy("source")),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("src_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(idx), "source")
        .withColumn(
            "interleave_key",
            ((F.col("src_rank") - 1) * n_src + F.col("src_idx")).cast("long"),
        )
        .select("doc_id", "source", "src_rank", "interleave_key")
    )


def corpus_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interleave_sources(load(spark, sf_dir, "documents"))


QUERIES["corpus_interleave_sources"] = corpus_interleave_sources

ORACLE["corpus_interleave_sources"] = """
    WITH r AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  AS BIGINT) AS src_rank
      FROM documents
    ), s AS (
      SELECT source,
             CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS src_idx,
             CAST(count(*) OVER () AS BIGINT) AS n_src
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT doc_id, r.source, src_rank,
           CAST((src_rank - 1) * n_src + src_idx AS BIGINT) AS interleave_key
    FROM r JOIN s USING (source)
"""


# ---------------------------------------------------------------------------
# exact-substring scrub (keep-first-copy span dedup)
# ---------------------------------------------------------------------------

SCRUB_W = 15  # window width, same as dedup_substring_pairs (SUBSTR_W)


def exact_substring_scrub(docs: DataFrame, w: int = SCRUB_W) -> DataFrame:
    """Span-level dedup that EDITS documents instead of dropping them: every
    ``w``-token window that occurs more than once in the corpus keeps only
    its first occurrence (min ``(doc_id, pos)``); tokens covered by any
    non-first occurrence are scrubbed and the remaining tokens re-joined in
    order.  This is the windowed approximation of the suffix-array
    ExactSubstr dedup in "Deduplicating Training Data Makes Language Models
    Better" (Lee et al., 2022) — ``dedup_substring_pairs`` reports the
    signal; this operator applies the fix, and doc-level near-dup families
    can't express it (a syndicated paragraph inside otherwise-unique pages
    is invisible to them).

    Scale shape, all linear: windows fingerprint to md5-60 longs (one
    narrow shuffle key); first-occurrence detection is a groupBy on the
    window hash with ``min(struct(doc_id, pos))`` — map-side partial
    aggregation, so a boilerplate window repeated a billion times combines
    within each task instead of sorting one giant window partition (why
    this is NOT a row_number window).  Non-first occurrences explode to
    covered token positions (≤ w rows each), the survivor set is one
    left-anti join on ``(doc_id, tokpos)``, and reassembly is a per-doc
    ``array_sort(collect_list(struct(pos, tok)))`` — grouped by doc_id, so
    sort cost is per-document, never global.  Over-removal note: a token
    inside a KEPT occurrence is still scrubbed if a *different* duplicated
    window's non-first occurrence covers it; the rule "scrub iff covered by
    any non-first occurrence" is deterministic and one-sided (never leaves
    a duplicated span un-deduplicated).
    """
    from .dedup import ngrams_expr

    par = docs.sparkSession.sparkContext.defaultParallelism
    base = bounded_cache(
        docs.repartition(par).select("doc_id", tokens_expr().alias("toks"))
    )
    # full 128-bit md5 as the window key (ADVICE r4): this key DELETES
    # text, so a cross-window collision would scrub unrelated tokens from
    # a kept document — and both engines computing the same hash means
    # the oracle gate could never catch it.  At 60 bits that's expected
    # once windows reach ~2^30 (well under the design point); at 128 bits
    # it's ~2^64 windows.  The key is a shuffle-only intermediate, so the
    # cost is 32-byte vs 8-byte shuffle keys on one exchange — identity-
    # grade correctness is worth it (same call as files.read_documents_text).
    occ = base.select(
        "doc_id",
        F.posexplode(ngrams_expr(F.col("toks"), w, distinct=False)).alias("pos", "win"),
    ).select("doc_id", "pos", F.md5("win").alias("wh"))
    firsts = (
        occ.groupBy("wh")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("first"),
        )
        .filter(F.col("n_occ") >= 2)
    )
    removed = occ.join(firsts, "wh").filter(
        ~(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
    )
    covered = removed.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1))).alias(
            "tokpos"
        ),
    ).distinct()
    tp = base.select("doc_id", F.posexplode("toks").alias("tokpos", "tok"))
    kept = tp.join(covered, ["doc_id", "tokpos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tokpos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    totals = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
        (F.col("n_tokens") - F.coalesce("n_tokens_kept", F.lit(0)))
        .cast("long")
        .alias("n_tokens_removed"),
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
    )


def corpus_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_substring_scrub(load(spark, sf_dir, "documents"))


QUERIES["corpus_exact_substring_dedup"] = corpus_exact_substring_dedup

ORACLE["corpus_exact_substring_dedup"] = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), occ AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(
                list_slice(toks, i, i + {SCRUB_W} - 1), ' ')) AS wh
      FROM toks, unnest(range(1, len(toks) - {SCRUB_W} + 2)) AS t(i)
      WHERE len(toks) >= {SCRUB_W}
    ), marked AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn
      FROM occ
    ), covered AS (
      SELECT DISTINCT doc_id, pos + j AS tokpos
      FROM marked, unnest(range(0, {SCRUB_W})) AS u(j)
      WHERE rn > 1
    ), tp AS (
      SELECT doc_id, i - 1 AS tokpos, toks[i] AS tok
      FROM toks, unnest(range(1, len(toks) + 1)) AS t(i)
    ), kept AS (
      SELECT tp.doc_id, tp.tokpos, tp.tok
      FROM tp ANTI JOIN covered USING (doc_id, tokpos)
    ), agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_kept,
             string_agg(tok, ' ' ORDER BY tokpos) AS text_dedup
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
           CAST(len(t.toks) - COALESCE(a.n_tokens_kept, 0) AS BIGINT)
             AS n_tokens_removed,
           COALESCE(a.text_dedup, '') AS text_dedup
    FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""


# ---------------------------------------------------------------------------
# keep-best-in-cluster canonical selection
# ---------------------------------------------------------------------------


def corpus_keep_best_in_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection by QUALITY: one doc per near-dup cluster,
    the member with the highest quality score (tie → min doc_id), with the
    cluster size carried for observability.  ``corpus_build_training_set``
    keeps the min-id member — correct when members are interchangeable;
    when they differ (a truncated mirror vs the full page, an ad-injected
    scrape vs the clean one) the curation literature keeps the best copy,
    which is this operator.

    Scale shape: clusters come from the LSH-verified CC labels (linear
    path); quality is the codegen score expression; the selection is one
    window over ``component`` — near-dup components are overwhelmingly
    singletons/pairs, so partitions are tiny, and the quality double is
    integer-derived (bit-exact across engines) so the rank order is
    engine-stable.
    """
    from ..functions.text import quality_score_expr, tokenized

    docs = load(spark, sf_dir, "documents")
    comp = dedup_connected_components(spark, sf_dir)
    toks = tokenized(docs, "source")
    _, score = quality_score_expr(F.col("toks"), F.col("norm"))
    scored = toks.filter(F.size("toks") > 0).select(
        "doc_id", "source", score.alias("quality_score")
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        scored.join(comp, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count("*").over(Window.partitionBy("component")).cast("long"),
        )
        .filter(F.col("rk") == 1)
        .select("doc_id", "component", "source", "quality_score", "n_members")
    )


QUERIES["corpus_keep_best_in_cluster"] = corpus_keep_best_in_cluster

ORACLE["corpus_keep_best_in_cluster"] = f"""
    WITH cc AS (
      SELECT * FROM ({ORACLE["dedup_connected_components"]}) c
    ), q AS (
      SELECT doc_id, quality_score
      FROM ({_TEXT_ORACLE["text_quality_score"]}) t
    )
    SELECT doc_id, component, source, quality_score, n_members FROM (
      SELECT d.doc_id, cc.component, d.source, q.quality_score,
             row_number() OVER (
               PARTITION BY cc.component
               ORDER BY q.quality_score DESC, d.doc_id ASC
             ) AS rk,
             CAST(count(*) OVER (PARTITION BY cc.component) AS BIGINT)
               AS n_members
      FROM documents d
      JOIN cc ON cc.doc_id = d.doc_id
      JOIN q ON q.doc_id = d.doc_id
    ) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# sharded sequence packing (the per-language-window scale path)
# ---------------------------------------------------------------------------


def pack_sequences_sharded(docs: DataFrame, capacity: int = SEQ_CAPACITY) -> DataFrame:
    """Bit-identical output to ``pack_sequences``, computed without the
    per-language single-task window — the scale caveat in this module's
    docstring ("shard the partition key if a single language exceeds an
    executor's sort budget"), closed.

    The running token offset is ``operators.ranking.grouped_running_sum``:
    range-partitioned on (lang, doc_id), local exclusive prefix sums in
    parallel, per-(partition, lang) totals prefix-summed on the driver
    (≤ partitions × |langs| rows) and broadcast back.  A language holding
    90% of the corpus spans many partitions instead of sorting in one
    task.  Registered under the SAME oracle as ``corpus_pack_sequences``
    — the hash gate proves the two formulations agree value-for-value.
    """
    from .ranking import grouped_running_sum

    base = docs.select(
        "doc_id", "lang", F.size(tokens_expr()).cast("long").alias("n_tokens")
    )
    gs = grouped_running_sum(
        base, ["lang"], [F.asc("doc_id")], "n_tokens", "seq_start"
    )
    return (
        gs.withColumn("seq_id", F.floor(F.col("seq_start") / capacity))
        .withColumn("seq_offset", F.col("seq_start") % capacity)
        .select("doc_id", "lang", "n_tokens", "seq_start", "seq_id", "seq_offset")
    )


def corpus_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences_sharded(load(spark, sf_dir, "documents"))


QUERIES["corpus_pack_sequences_sharded"] = corpus_pack_sequences_sharded
ORACLE["corpus_pack_sequences_sharded"] = ORACLE["corpus_pack_sequences"]


# ---------------------------------------------------------------------------
# incremental connected-components maintenance
# ---------------------------------------------------------------------------


def connected_components_incremental(
    nodes: DataFrame,
    old_labels: DataFrame,
    new_edges: DataFrame,
    *,
    node_col: str = "doc_id",
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
) -> DataFrame:
    """Update CC labels for a grown graph WITHOUT re-walking old edges:
    each existing component is already connectivity-equivalent to a star
    on its min-id label, so the prior run's ``(node, component)`` rows ARE
    a compressed edge set — union them with the new batch's edges and run
    the standard propagation.  The loop's subgraph is (old cluster
    members + new-edge endpoints), not the corpus, and the old edge list
    (arbitrarily large) is never touched again.

    Exactness: CC over (star edges ∪ new edges) has the same components
    as CC over (old edges ∪ new edges) — stars preserve old connectivity
    — and labels are min reachable ids in both, so the result is
    identical to a from-scratch run on the combined edge set.
    """
    label_edges = old_labels.filter(
        F.col("component") != F.col(node_col)
    ).select(
        F.col(node_col).alias(src_col), F.col("component").alias(dst_col)
    )
    edges = new_edges.select(src_col, dst_col).unionByName(label_edges)
    return connected_components(
        nodes, edges, node_col=node_col, src_col=src_col, dst_col=dst_col
    )


def dedup_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance end-to-end, under the hash gate:
    the standing corpus (doc_id % 10 < 8, the ``dedup_minhash_incremental``
    split) carries labels from its own prior CC run; the incoming batch
    contributes only the incremental LSH pairs (new×all candidates, caps
    judged over the union) pushed through the shared exact-Jaccard verify.
    The updated labels must equal a from-scratch CC over (old-run edges ∪
    incremental edges) — which is what the composed oracle computes.

    Per batch the work is: new-batch signatures + new×bucket candidates +
    verify on those + a propagation whose subgraph is touched clusters —
    nothing rescans or re-pairs the standing corpus.
    """
    from .dedup import (
        incremental_minhash_pairs,
        minhash_verified_pairs,
        verify_pairs_jaccard,
    )

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    # subgraph labels only: connected_components_incremental immediately
    # re-filters to component != doc_id (the star compression), so the
    # singleton-restore join over the full standing corpus would be
    # computed and thrown away (restore_singletons docstring)
    old_labels = connected_components(
        old.select("doc_id"),
        minhash_verified_pairs(old, n=3, threshold=0.5),
        restore_singletons=False,
    )
    inc_edges = verify_pairs_jaccard(
        incremental_minhash_pairs(old, new, n=3), docs, n=3, threshold=0.5
    )
    return connected_components_incremental(
        docs.select("doc_id"), old_labels, inc_edges
    )


QUERIES["dedup_cc_incremental"] = dedup_cc_incremental

_OLD_SCOPED_VERIFIED = _DEDUP_ORACLE["dedup_minhash_verified"].replace(
    "FROM documents",
    "FROM (SELECT * FROM documents WHERE doc_id % 10 < 8)",
)

ORACLE["dedup_cc_incremental"] = f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_id_a, doc_id_b FROM ({_OLD_SCOPED_VERIFIED}) o
      UNION
      SELECT doc_id_a, doc_id_b
      FROM ({_DEDUP_ORACLE["dedup_minhash_verified"]}) v
      WHERE NOT (doc_id_a % 10 < 8 AND doc_id_b % 10 < 8)
    ), edges AS (
      SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
      UNION ALL
      SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
    ), reach(root, node) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT root AS doc_id, CAST(min(node) AS BIGINT) AS component
    FROM reach GROUP BY root
"""


# ---------------------------------------------------------------------------
# corpus dedup dashboard (one-row observability summary)
# ---------------------------------------------------------------------------


def corpus_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dedup dashboard a corpus operator watches per ingest:
    corpus size, exact-duplicate docs (normalized byte identity),
    LSH-verified near-dup pairs and the docs they touch, cluster count
    and largest cluster from the transitive closure.  A release-over-
    release jump in any column is the re-scrape/mirror alarm before a
    training run wastes compute on duplicated mass.

    Composition of already-verified stages (exact fingerprints, the
    verified pair pipeline, CC) — each summarized to a 1-row aggregate
    and broadcast-cross-joined, so the dashboard costs the union of the
    pipelines it reports on and nothing more.
    """
    from .dedup import normalized_text

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    exact = docs.agg(
        (F.count("*") - F.countDistinct(F.md5(normalized_text())))
        .cast("long")
        .alias("n_exact_dup_docs")
    )
    pairs = bounded_cache(minhash_verified_pairs(docs, n=3, threshold=0.5))
    n_pairs = pairs.agg(F.count("*").cast("long").alias("n_near_dup_pairs"))
    n_dup_docs = (
        pairs.select(F.col("doc_id_a").alias("d"))
        .unionByName(pairs.select(F.col("doc_id_b").alias("d")))
        .agg(F.countDistinct("d").cast("long").alias("n_near_dup_docs"))
    )
    cc = connected_components(docs.select("doc_id"), pairs)
    clusters = cc.groupBy("component").agg(F.count("*").alias("sz")).agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.max("sz").cast("long").alias("max_cluster_size"),
    )
    out = n_docs
    for piece in (exact, n_pairs, n_dup_docs, clusters):
        out = out.crossJoin(F.broadcast(piece))
    return out


QUERIES["corpus_dedup_summary"] = corpus_dedup_summary

from .dedup import _NORM as _NORM_SQL  # noqa: E402

ORACLE["corpus_dedup_summary"] = f"""
    WITH pairs AS (
      SELECT * FROM ({_DEDUP_ORACLE["dedup_minhash_verified"]}) t
    ), cc AS (
      SELECT * FROM ({ORACLE["dedup_connected_components"]}) c
    ), clusters AS (
      SELECT CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(max(sz) AS BIGINT) AS max_cluster_size
      FROM (SELECT component, count(*) AS sz FROM cc GROUP BY component)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(count(*) - count(DISTINCT md5({_NORM_SQL})) AS BIGINT)
            FROM documents) AS n_exact_dup_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_near_dup_pairs,
           (SELECT CAST(count(DISTINCT d) AS BIGINT) FROM (
              SELECT doc_id_a AS d FROM pairs
              UNION ALL SELECT doc_id_b FROM pairs)) AS n_near_dup_docs,
           n_clusters, max_cluster_size
    FROM clusters
"""


# ---------------------------------------------------------------------------
# corpus composition (data-mixture table)
# ---------------------------------------------------------------------------


def corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixture table every training run documents: per source,
    document and token mass, mean document length, and the source's share
    of corpus tokens — the numbers that set sampling weights
    (`corpus_interleave_sources` / `corpus_source_cap` act on what this
    table reveals).

    One scan with integer token counts, one groupBy on the (tiny) source
    key, and the global total arrives by broadcast cross-join of a 1-row
    aggregate — no unpartitioned window.  All ratios are int/int double
    divisions, bit-exact in both engines.
    """
    per_doc = load(spark, sf_dir, "documents").select(
        "source", F.size(tokens_expr()).cast("long").alias("n_tok")
    )
    per_src = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    total = per_src.agg(F.sum("n_tokens").cast("long").alias("_tot"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (
                F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
            ).alias("avg_doc_tokens"),
            (
                F.col("n_tokens").cast("double") / F.col("_tot").cast("double")
            ).alias("token_share"),
        )
    )


QUERIES["corpus_source_stats"] = corpus_source_stats

ORACLE["corpus_source_stats"] = f"""
    WITH per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_doc_tokens,
           CAST(n_tokens AS DOUBLE)
             / CAST((SELECT SUM(n_tokens) FROM per_src) AS DOUBLE) AS token_share
    FROM per_src
"""


# ---------------------------------------------------------------------------
# repetition gate (MassiveText/Gopher-style keep/drop filter)
# ---------------------------------------------------------------------------

REP_DUP_TOKEN_MAX = 0.30  # Gopher Table A1: duplicate-mass ceilings
REP_TOP_BIGRAM_MAX = 0.18
# the bigram ceiling only binds on docs long enough for the statistic to
# mean anything — a perfectly diverse 6-token doc has top-bigram mass 1/5
# and would fail a naive gate (Gopher's fractions likewise assume docs
# past its 50-word minimum)
REP_MIN_TOKENS_BIGRAM = 20


def corpus_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of ``text_repetition_score``: Gopher-style
    repetition FILTER with per-document keep/drop and both signals
    carried for audit (Rae et al. 2021, Table A1 thresholds — duplicate
    token mass ≤ 0.30, top-bigram mass ≤ 0.18).  Score-only reporting
    (text_repetition_score) tells you the distribution; curation needs
    the decision, and keeping the signals on the row makes the drop
    auditable afterwards.

    Shape identical to the score operator (two partial-agg shuffles on
    doc_id, no doc×doc term); the gate is a codegen boolean on top.
    Docs under 2 tokens have no bigram signal and pass by definition.
    """
    from ..functions.text import tokenized
    from .dedup import ngrams_expr

    docs = tokenized(load(spark, sf_dir, "documents"))
    tok_stats = docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.when(F.size("toks") >= 2,
               (F.size("toks") - F.size("uniq")) / F.size("toks").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )
    bigrams = docs.filter(F.size("toks") >= 2).select(
        "doc_id", F.explode(ngrams_expr(F.col("toks"), 2, distinct=False)).alias("g")
    )
    per_doc = (
        bigrams.groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top"), F.sum("count").alias("total"))
        .select(
            "doc_id",
            (F.col("top") / F.col("total").cast("double")).alias("top_bigram_frac"),
        )
    )
    return (
        tok_stats.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("dup_token_frac") <= REP_DUP_TOKEN_MAX)
            & (
                (F.col("n_tokens") < REP_MIN_TOKENS_BIGRAM)
                | (F.col("top_bigram_frac") <= REP_TOP_BIGRAM_MAX)
            ),
        )
    )


QUERIES["corpus_repetition_gate"] = corpus_repetition_gate

ORACLE["corpus_repetition_gate"] = f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), tok_stats AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) >= 2
                  THEN (len(toks) - len(list_distinct(toks)))
                       / CAST(len(toks) AS DOUBLE)
                  ELSE 0.0 END AS dup_token_frac,
             toks
      FROM d
    ), bg AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, i, i + 1), ' ') AS g
      FROM d, unnest(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2
    ), counts AS (
      SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
    ), per_doc AS (
      SELECT doc_id, max(c) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
      FROM counts GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens, t.dup_token_frac,
           COALESCE(p.top_bigram_frac, 0.0) AS top_bigram_frac,
           (t.dup_token_frac <= {REP_DUP_TOKEN_MAX}
            AND (t.n_tokens < {REP_MIN_TOKENS_BIGRAM}
                 OR COALESCE(p.top_bigram_frac, 0.0) <= {REP_TOP_BIGRAM_MAX}))
             AS keep
    FROM tok_stats t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
"""


# ---------------------------------------------------------------------------
# blocklist gate (wordlist content filter)
# ---------------------------------------------------------------------------

BLOCKLIST = ("slow", "broken")  # stand-in wordlist; swap for the real one
BLOCK_FRAC_MAX = 0.05


def corpus_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordlist content gate: per-document count and fraction of
    blocklisted tokens, keep = fraction ≤ threshold — the standard
    coarse NSFW/toxicity prefilter (C4 applied exactly this shape with
    its 'bad words' list before any model-based scoring).

    Shape: the blocklist is a literal array in the plan (at production
    size, a broadcast variable feeding the same array_intersect-style
    membership) — the whole gate is one codegen projection over the
    corpus scan, no shuffle at all.  The fraction denominator is the
    doc's token count; empty docs pass with 0 hits.
    """
    # tokenize/filter ONCE in a first projection: the HOF subtrees are
    # non-cheap, so Catalyst's CollapseProject leaves the two-step shape
    # alone — a single select referencing `hits` six times would
    # re-tokenize every document per reference (review r5)
    counted = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", tokens_expr().alias("toks"))
        .select(
            "doc_id",
            "source",
            F.size(F.filter(F.col("toks"), lambda x: x.isin(*BLOCKLIST)))
            .cast("long")
            .alias("n_blocked"),
            F.size("toks").cast("long").alias("n_tok"),
        )
    )
    frac = F.when(
        F.col("n_tok") > 0, F.col("n_blocked") / F.col("n_tok").cast("double")
    ).otherwise(F.lit(0.0))
    return counted.select(
        "doc_id",
        "source",
        "n_blocked",
        frac.alias("blocked_frac"),
        (frac <= BLOCK_FRAC_MAX).alias("keep"),
    )


QUERIES["corpus_blocklist_filter"] = corpus_blocklist_filter

_BLOCK_IN = ", ".join(f"'{w}'" for w in BLOCKLIST)

ORACLE["corpus_blocklist_filter"] = f"""
    WITH d AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    )
    SELECT doc_id, source,
           CAST(len(list_filter(toks, x -> x IN ({_BLOCK_IN}))) AS BIGINT)
             AS n_blocked,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, x -> x IN ({_BLOCK_IN})))
                     / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END AS blocked_frac,
           (CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks, x -> x IN ({_BLOCK_IN})))
                      / CAST(len(toks) AS DOUBLE)
                 ELSE 0.0 END) <= {BLOCK_FRAC_MAX} AS keep
    FROM d
"""


# ---------------------------------------------------------------------------
# packing-efficiency report
# ---------------------------------------------------------------------------


def corpus_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source packing-utilization report at the training sequence
    length: chunks = ceil(tokens / capacity) per document (the no-
    cross-doc-packing layout), padding = chunks·capacity − tokens, and
    utilization = tokens / (chunks·capacity).  This is the number that
    justifies (or kills) greedy packing: a source full of short docs at
    30% utilization is paying 3× its token cost in padded compute, and
    this table says so per source BEFORE a packing job runs
    (``corpus_pack_sequences`` then fixes it).

    One scan, integer ceil-division in the projection, one groupBy on
    the tiny source key — all counts integral until the final division.
    """
    per_doc = load(spark, sf_dir, "documents").select(
        "source",
        F.size(tokens_expr()).cast("long").alias("n_tok"),
    ).select(
        "source",
        "n_tok",
        F.ceil(F.col("n_tok") / F.lit(SEQ_CAPACITY)).cast("long").alias("n_chunks"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chunks").cast("long").alias("n_seqs"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_seqs",
            (F.col("n_seqs") * SEQ_CAPACITY - F.col("n_tokens"))
            .cast("long")
            .alias("pad_tokens"),
            (
                F.col("n_tokens").cast("double")
                / (F.col("n_seqs") * SEQ_CAPACITY).cast("double")
            ).alias("utilization"),
        )
    )


QUERIES["corpus_packing_efficiency"] = corpus_packing_efficiency

ORACLE["corpus_packing_efficiency"] = f"""
    WITH per_doc AS (
      SELECT source, CAST(len({_TOKS}) AS BIGINT) AS n_tok,
             CAST(ceil(len({_TOKS}) / {SEQ_CAPACITY}.0) AS BIGINT) AS n_chunks
      FROM documents
    ), per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(n_chunks) AS BIGINT) AS n_seqs
      FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, n_tokens, n_seqs,
           CAST(n_seqs * {SEQ_CAPACITY} - n_tokens AS BIGINT) AS pad_tokens,
           CAST(n_tokens AS DOUBLE)
             / CAST(n_seqs * {SEQ_CAPACITY} AS DOUBLE) AS utilization
    FROM per_src
"""


# ---------------------------------------------------------------------------
# importance weights (DSIR-lite domain reweighting)
# ---------------------------------------------------------------------------

DSIR_TARGET_MOD = 10  # deterministic hash-slice of the corpus as the target

# 1e6 fixed-point DSIR ratio in DECIMAL(38,0): products exact to 1e38,
# quotient exact whenever it fits int64 (guarded below — Spark's div
# WRAPS past that; measured, see corpus_importance_weights docstring)
_R6_EXPR = (
    "CAST((CAST(1000000 AS DECIMAL(38,0)) * (c_t + 1) * (t_c + v))"
    " div (CAST(c_c + 1 AS DECIMAL(38,0)) * (t_t + v)) AS BIGINT)"
)


def _check_fixed_point_bound(t_c: int, t_t: int, v: int) -> None:
    """Raise when the global ratio bound 1e6·(t_c+v)/(t_t+v) — an upper
    bound on every per-token r6 because c_c ≥ c_t — exceeds int64."""
    if 1_000_000 * (t_c + v) // (t_t + v) > (1 << 63) - 1:
        raise FixedPointOverflowError(
            f"corpus_importance_weights: target slice holds {t_t} of "
            f"{t_c} token occurrences — the 1e6 fixed-point ratio bound "
            f"1e6*(t_c+v)/(t_t+v) exceeds int64, where Spark's div wraps "
            "silently. Use a larger target slice or rescale the "
            "fixed-point base."
        )


def corpus_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-selection importance weights, DSIR-style (Xie et al. 2023):
    score every document by how much its unigram distribution looks like
    a TARGET domain versus the corpus at large — the weights that drive
    importance resampling when you want "more like the good subset"
    without a trained classifier.  The target here is a deterministic
    md5 slice of the corpus (doc hash % {mod} == 0), standing in for a
    curated seed set; production swaps in its real target corpus.

    score(doc) = mean over token occurrences of p_target(tok)/p_corpus(tok),
    add-1 smoothed over the corpus vocabulary.  The DSIR paper works in
    log space; this variant keeps the LINEAR ratio mean because ln() is
    libm-dependent (not bit-portable across engines) while +,-,×,÷ are
    IEEE-exact — and monotone enough for rank-based resampling.  Each
    token's ratio is a 1e6 fixed-point integer (same trick as
    text_unigram_surprisal), so the per-doc aggregation is an EXACT
    integer sum — order-independent, hash-gate-safe — and only the final
    normalization divides in double.

    Fixed-point range contract (ADVICE r5): the numerator
    1e6·(c_t+1)·(T_c+V) overflows int64 at moderate corpus sizes for
    frequent tokens, and Spark (non-ANSI) would WRAP silently where
    DuckDB raises — so all products run in DECIMAL(38,0) on the Spark
    side and HUGEINT on the DuckDB side (both exact integer arithmetic
    to ≥1e38; a 100 TB corpus peaks around 6e32).  The remaining int64
    boundary is the QUOTIENT: Spark's ``div`` wraps when the integral
    quotient itself exceeds int64 (measured, not hypothetical).  Since
    c_c ≥ c_t for every token, r6 ≤ 1e6·(T_c+V)/(T_t+V) globally, so a
    1-row totals collect guards that bound and raises
    :class:`FixedPointOverflowError` — loudly, like QuadraticScaleError
    — when the target slice is too small a fraction of the corpus
    (< ~1e-13 of token mass) for the fixed-point quotient to stay exact.

    Shape: one explode (narrow), one token-keyed groupBy (Zipf-skewed —
    AQE splits), a token join back, and a 1-row broadcast of totals.
    No quadratic term anywhere.
    """
    docs = load(spark, sf_dir, "documents")
    key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    ex = docs.select(
        "doc_id",
        F.explode(tokens_expr()).alias("tok"),
        (key % DSIR_TARGET_MOD == 0).cast("long").alias("is_t"),
    )
    counts = bounded_cache(
        ex.groupBy("tok").agg(
            F.count("*").cast("long").alias("c_c"),
            F.sum("is_t").cast("long").alias("c_t"),
        )
    )
    totals = counts.agg(
        F.sum("c_c").cast("long").alias("t_c"),
        F.sum("c_t").cast("long").alias("t_t"),
        F.count("*").cast("long").alias("v"),
    )
    # quotient-bound guard (see docstring): 1-row collect, vocab-bounded
    # upstream (counts is cached so the guard pass is reused by the plan).
    # SUM over zero rows is NULL: an empty/token-less corpus skips the
    # guard and lazily returns the (empty) result like it always did.
    t_c, t_t, v = totals.collect()[0]
    if t_c is not None and (t_t + v) > 0:
        _check_fixed_point_bound(t_c, t_t, v)
    scored = (
        ex.join(counts, "tok")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", F.expr(_R6_EXPR).alias("r6"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        (
            # decimal(38,0) sum: exact and overflow-proof (a HUGEINT sum
            # on the oracle side), divided once in double at the end
            F.sum(F.col("r6").cast("decimal(38,0)")).cast("double")
            / (F.lit(1000000.0) * F.count("*").cast("double"))
        ).alias("importance"),
    )


QUERIES["corpus_importance_weights"] = corpus_importance_weights

ORACLE["corpus_importance_weights"] = f"""
    WITH ex AS (
      SELECT doc_id, unnest({_TOKS}) AS tok,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % {DSIR_TARGET_MOD} = 0 THEN 1 ELSE 0 END AS is_t
      FROM documents
    ), counts AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c_c,
             CAST(sum(is_t) AS BIGINT) AS c_t
      FROM ex GROUP BY tok
    ), totals AS (
      SELECT CAST(sum(c_c) AS BIGINT) AS t_c,
             CAST(sum(c_t) AS BIGINT) AS t_t,
             CAST(count(*) AS BIGINT) AS v
      FROM counts
    ), scored AS (
      -- HUGEINT intermediates mirror Spark's DECIMAL(38,0): both sides
      -- are exact integer arithmetic to >=1e38, and the quotient fits
      -- BIGINT under the Spark-side totals guard (ADVICE r5)
      SELECT doc_id,
             CAST((1000000::HUGEINT * (c_t + 1) * (t_c + v))
                  // ((c_c + 1)::HUGEINT * (t_t + v)) AS BIGINT) AS r6
      FROM ex JOIN counts USING (tok) CROSS JOIN totals
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(r6) AS DOUBLE)
             / (1000000.0 * CAST(count(*) AS DOUBLE)) AS importance
    FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# dedup yield curve (threshold tuning table)
# ---------------------------------------------------------------------------

CURVE_THRESHOLDS = tuple(t / 100.0 for t in range(50, 95, 5))


def corpus_dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield as a function of the Jaccard threshold: for each bar in
    0.50..0.90, how many verified near-dup pairs survive — the table you
    read BEFORE picking a production threshold (a cliff between 0.6 and
    0.7 means the corpus has a distinct boilerplate band there; a flat
    curve means the threshold hardly matters).

    Cost: the verified pair set is computed ONCE at the loosest bar
    (every tighter bar is a subset — jaccard is already on the edge), and
    the curve is a tiny broadcast cross-join of |thresholds| × one pass
    over the pairs with a conditional count.  No re-verification per bar.
    """
    from .dedup import minhash_verified_pairs

    pairs = minhash_verified_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=min(CURVE_THRESHOLDS)
    )
    bars = spark.createDataFrame(
        [(t,) for t in CURVE_THRESHOLDS], "threshold double"
    )
    # empty-pair-set shape (review r5, both passes): the aggregate runs
    # over pairs × broadcast(9-row bars) — the SMALL side broadcasts; an
    # unkeyed bars-left join would instead force a BNLJ that broadcasts
    # the UNBOUNDED pair set.  The 9-row aggregate result then left-joins
    # back onto bars on the threshold key so a corpus with ZERO verified
    # pairs still emits one row per bar with n_pairs=0 (the oracle's
    # LEFT JOIN shape).
    agg = (
        pairs.crossJoin(F.broadcast(bars))
        .groupBy("threshold")
        .agg(
            F.sum((F.col("jaccard") >= F.col("threshold")).cast("long"))
            .cast("long")
            .alias("n_pairs")
        )
    )
    return bars.join(agg, "threshold", "left").select(
        "threshold", F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs")
    )


QUERIES["corpus_dedup_rate_curve"] = corpus_dedup_rate_curve

_CURVE_BARS = ", ".join(f"({t})" for t in CURVE_THRESHOLDS)

ORACLE["corpus_dedup_rate_curve"] = f"""
    WITH ver AS (
      SELECT * FROM ({{MINHASH_VERIFIED}}) v
    ), bars(threshold) AS (VALUES {_CURVE_BARS})
    SELECT threshold,
           CAST(COALESCE(SUM(CASE WHEN ver.jaccard >= bars.threshold
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
    FROM bars LEFT JOIN ver ON true
    GROUP BY threshold
"""

from .dedup import ORACLE as _DD_ORC  # noqa: E402

ORACLE["corpus_dedup_rate_curve"] = ORACLE["corpus_dedup_rate_curve"].replace(
    "{MINHASH_VERIFIED}", _DD_ORC["dedup_minhash_verified"]
)


# ---------------------------------------------------------------------------
# bigram LM predictability score
# ---------------------------------------------------------------------------


def corpus_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram predictability: the mean corpus-level
    conditional probability P(tok | prev) across the doc's bigram
    positions — the cheap KenLM stand-in curation stacks use between the
    heuristic gates and a real model score.  Boilerplate scores high
    (its transitions dominate the corpus LM), genuinely novel text low;
    unlike ``text_unigram_surprisal`` this sees WORD ORDER, so shuffled
    token salad that fools a unigram score does not fool this one.

    Exactness: each position's probability is a 1e6 fixed-point integer
    ((1e6·c_bigram) // c_prev), so the per-doc aggregation is an exact
    integer sum (order-independent — hash-gate safe) and only the final
    normalization divides in double.  Shape: one explode, two
    Zipf-skewed groupBys (AQE splits), two key joins back — the same
    linear skeleton as the surprisal operator.  Docs under 2 tokens have
    no bigram positions and are excluded (score undefined).
    """
    from .dedup import ngrams_expr

    docs = load(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id",
        F.explode(ngrams_expr(tokens_expr(), 2, distinct=False)).alias("g"),
    ).withColumn("prev", F.split(F.col("g"), " ")[0])
    c2 = bg.groupBy("g").agg(F.count("*").cast("long").alias("c_bg"))
    c1 = bg.groupBy("prev").agg(F.count("*").cast("long").alias("c_prev"))
    scored = (
        bg.join(c2, "g")
        .join(c1, "prev")
        .select("doc_id", F.expr("(1000000 * c_bg) div c_prev").alias("r6"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (
            F.sum("r6").cast("double")
            / (F.lit(1000000.0) * F.count("*").cast("double"))
        ).alias("avg_cond_prob"),
    )


QUERIES["corpus_bigram_lm_score"] = corpus_bigram_lm_score

ORACLE["corpus_bigram_lm_score"] = f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), bg AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, i, i + 1), ' ') AS g,
             toks[i] AS prev
      FROM d, unnest(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2
    ), c2 AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY g
    ), c1 AS (
      SELECT prev, CAST(count(*) AS BIGINT) AS c_prev FROM bg GROUP BY prev
    ), scored AS (
      SELECT doc_id, (1000000 * c_bg) // c_prev AS r6
      FROM bg JOIN c2 USING (g) JOIN c1 USING (prev)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(sum(r6) AS BIGINT) AS DOUBLE)
             / (1000000.0 * CAST(count(*) AS DOUBLE)) AS avg_cond_prob
    FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# chunk-level dedup (RAG/window-granularity exact dedup)
# ---------------------------------------------------------------------------


def corpus_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at CHUNK granularity: fingerprint every retrieval
    chunk (full 128-bit md5 — identity keys get full width, r5
    discipline) and keep the first copy per fingerprint (min (doc_id,
    chunk_id)).  Document-level dedup misses this entirely: two distinct
    documents sharing one boilerplate window each stay, but a RAG index
    or context-window corpus should not embed the same chunk twice.
    Composition: ``chunk_documents`` (row-local, shuffle-free) → one
    groupBy on the fingerprint with ``min(struct(...))`` — map-side
    partial agg, same shape as the substring scrub's first-occurrence
    stage.
    """
    chunks = chunk_documents(load(spark, sf_dir, "documents"))
    # fp is both groupBy input and join probe side — uncached, the chunk
    # explosion + per-chunk md5 (the operator's dominant cost) runs
    # twice (review r5)
    fp = bounded_cache(
        chunks.select(
            "doc_id", "chunk_id", "n_tokens", F.md5("chunk_text").alias("fingerprint")
        )
    )
    firsts = fp.groupBy("fingerprint").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("first")
    )
    return (
        fp.join(firsts, "fingerprint")
        .select(
            "doc_id",
            "chunk_id",
            "n_tokens",
            "fingerprint",
            (
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("chunk_id") == F.col("first.chunk_id"))
            ).alias("keep"),
        )
    )


QUERIES["corpus_chunk_dedup"] = corpus_chunk_dedup

ORACLE["corpus_chunk_dedup"] = f"""
    WITH chunks AS ({ORACLE["corpus_chunk_documents"]}), fp AS (
      SELECT doc_id, chunk_id, n_tokens, md5(chunk_text) AS fingerprint
      FROM chunks
    ), marked AS (
      SELECT doc_id, chunk_id, n_tokens, fingerprint,
             row_number() OVER (PARTITION BY fingerprint
                                ORDER BY doc_id, chunk_id) AS rn
      FROM fp
    )
    SELECT doc_id, chunk_id, n_tokens, fingerprint, (rn = 1) AS keep
    FROM marked
"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve
# ---------------------------------------------------------------------------

VOCAB_COVERAGE_BARS = (10, 100, 1000, 10000)


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass coverage by vocabulary rank: for each k, the fraction
    of ALL token occurrences covered by the k most frequent types — the
    curve that sizes tokenizer vocabularies and stopword lists (a corpus
    whose top-100 covers 60% wants different filtering than one at 30%).

    Shape: one token groupBy builds the frequency table; each bar is a
    ``TakeOrderedAndProject`` (global top-k by count — no full sort, no
    single-partition window) followed by a 1-row sum, unioned.  Boundary
    ties are sum-invariant (tied types have EQUAL counts, so any k-row
    tie choice sums identically) — deterministic without a tie-break.
    """
    ex = load(spark, sf_dir, "documents").select(
        F.explode(tokens_expr()).alias("tok")
    )
    counts = bounded_cache(
        ex.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    )
    total = counts.agg(F.sum("c").cast("long").alias("total"))
    bars = None
    for k in VOCAB_COVERAGE_BARS:
        top = (
            counts.orderBy(F.desc("c"))
            .limit(k)
            .agg(
                F.lit(k).cast("long").alias("k"),
                F.sum("c").cast("long").alias("covered"),
            )
        )
        bars = top if bars is None else bars.unionByName(top)
    return bars.crossJoin(F.broadcast(total)).select(
        "k",
        "covered",
        "total",
        (F.col("covered").cast("double") / F.col("total").cast("double")).alias(
            "coverage"
        ),
    )


QUERIES["text_vocab_coverage"] = text_vocab_coverage

_COVERAGE_BARS_SQL = ", ".join(f"({k})" for k in VOCAB_COVERAGE_BARS)

ORACLE["text_vocab_coverage"] = f"""
    WITH counts AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
      GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total FROM counts
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC) AS rn FROM counts
    ), bars(k) AS (VALUES {_COVERAGE_BARS_SQL})
    SELECT CAST(bars.k AS BIGINT) AS k,
           CAST(COALESCE(sum(ranked.c), 0) AS BIGINT) AS covered,
           (SELECT total FROM tot) AS total,
           CAST(COALESCE(sum(ranked.c), 0) AS DOUBLE)
             / CAST((SELECT total FROM tot) AS DOUBLE) AS coverage
    FROM bars LEFT JOIN ranked ON ranked.rn <= bars.k
    GROUP BY bars.k
"""


# ---------------------------------------------------------------------------
# cluster-size histogram (dedup observability)
# ---------------------------------------------------------------------------


def corpus_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of near-dup cluster sizes: (cluster_size →
    n_clusters, n_docs) over the LSH-verified transitive closure — the
    curve behind the one-number dashboard (``corpus_dedup_summary``
    reports the LARGEST cluster; this shows whether dup mass sits in a
    few giant mirror families or a long tail of pairs, which decides
    keep-best vs drop-all-but-one strategy).

    Two bounded groupBys on top of the already-linear CC labels:
    component → size (≤ doc count rows), size → histogram (≤ distinct
    sizes rows).  Nothing quadratic, nothing collected.
    """
    from .dedup import minhash_verified_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_verified_pairs(docs, n=3, threshold=0.5)
    labels = connected_components(docs.select("doc_id"), pairs)
    sizes = labels.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
    )


QUERIES["corpus_cluster_size_histogram"] = corpus_cluster_size_histogram

ORACLE["corpus_cluster_size_histogram"] = f"""
    WITH cc AS (
      SELECT * FROM ({ORACLE["dedup_connected_components"]}) c
    ), sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
      FROM cc GROUP BY component
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
"""


# ---------------------------------------------------------------------------
# per-source distribution drift (total-variation distance)
# ---------------------------------------------------------------------------


def corpus_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram drift from the corpus-wide distribution, as
    TOTAL-VARIATION distance: TV(s) = ½ Σ_tok |p_s(tok) − p_corpus(tok)|
    — the distribution-shift alarm between ingest sources (a source
    whose TV jumps release-over-release changed its content mix; a
    source far from the corpus center dominates mixture corrections).
    TV instead of KL/JS: it needs no logarithm, and ln() is the one
    operation that is NOT bit-portable across engines — every term here
    is a 1e6 fixed-point integer, so the big per-token sum is EXACT and
    order-independent (hash-gate safe), with one double division at the
    end.

    Absent-token handling without a vocab×source grid: tokens a source
    never uses contribute p_corpus each, so TV_s = ½·(Σ_{{tok∈s}}
    (|p6_s−p6_c| − p6_c) + Σ_all p6_c) — the per-(source, token) table
    stays |observed pairs|, never |vocab|×|sources|.  Shape: one
    explode, three partial-agg groupBys, a token join, a 1-row
    broadcast.
    """
    ex = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokens_expr()).alias("tok")
    )
    # st feeds three consumers and tok_c another three — uncached, each
    # branch re-runs the full tokenize→explode→groupBy corpus pass
    # (~5 passes total; review r5)
    st = bounded_cache(
        ex.groupBy("source", "tok").agg(F.count("*").cast("long").alias("c_st"))
    )
    s_tot = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("t_s"))
    tok_c = bounded_cache(
        st.groupBy("tok").agg(F.sum("c_st").cast("long").alias("c_t"))
    )
    corpus_tot = tok_c.agg(F.sum("c_t").cast("long").alias("t_c"))
    # p6_c per token and the global Σ p6_c (both need t_c — broadcast it)
    joined = (
        st.join(s_tot, "source")
        .join(tok_c, "tok")
        .crossJoin(F.broadcast(corpus_tot))
        .select(
            "source",
            F.expr("(c_st * 1000000) div t_s").alias("p6_s"),
            F.expr("(c_t * 1000000) div t_c").alias("p6_c"),
        )
    )
    tot_p6c = (
        tok_c.crossJoin(F.broadcast(corpus_tot))
        .agg(F.sum(F.expr("(c_t * 1000000) div t_c")).cast("long").alias("sum_p6c"))
    )
    return (
        joined.groupBy("source")
        .agg(
            F.sum(
                F.abs(F.col("p6_s") - F.col("p6_c")) - F.col("p6_c")
            ).cast("long").alias("_partial")
        )
        .crossJoin(F.broadcast(tot_p6c))
        .select(
            "source",
            (
                (F.col("_partial") + F.col("sum_p6c")).cast("double")
                / F.lit(2_000_000.0)
            ).alias("tv_distance"),
        )
    )


QUERIES["corpus_source_drift"] = corpus_source_drift

ORACLE["corpus_source_drift"] = f"""
    WITH ex AS (
      SELECT source, unnest({_TOKS}) AS tok FROM documents
    ), st AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st
      FROM ex GROUP BY source, tok
    ), s_tot AS (
      SELECT source, CAST(sum(c_st) AS BIGINT) AS t_s FROM st GROUP BY source
    ), tok_c AS (
      SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok
    ), corpus_tot AS (
      SELECT CAST(sum(c_t) AS BIGINT) AS t_c FROM tok_c
    ), joined AS (
      SELECT st.source,
             (st.c_st * 1000000) // s_tot.t_s AS p6_s,
             (tok_c.c_t * 1000000) // corpus_tot.t_c AS p6_c
      FROM st JOIN s_tot USING (source)
              JOIN tok_c USING (tok)
              CROSS JOIN corpus_tot
    ), tot_p6c AS (
      SELECT CAST(sum((c_t * 1000000) // t_c) AS BIGINT) AS sum_p6c
      FROM tok_c CROSS JOIN corpus_tot
    )
    SELECT source,
           CAST(CAST(sum(abs(p6_s - p6_c) - p6_c) AS BIGINT)
                + (SELECT sum_p6c FROM tot_p6c) AS DOUBLE)
             / 2000000.0 AS tv_distance
    FROM joined GROUP BY source
"""


# ---------------------------------------------------------------------------
# dedup savings (the number the compute bill cares about)
# ---------------------------------------------------------------------------


def corpus_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row answer to "what does dedup buy us": token mass of the
    docs the min-id survivor rule would DROP (non-survivors of the
    LSH-verified transitive closure), as absolute tokens and a fraction
    of corpus mass — dashboards report pair counts, the training-run
    budget wants tokens.  Composition of verified stages (CC labels →
    survivor flag → token sum vs corpus sum), all partial-agg linear,
    1-row output."""
    from .dedup import minhash_verified_pairs

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.size(tokens_expr()).cast("long").alias("n_tok"))
    pairs = minhash_verified_pairs(docs, n=3, threshold=0.5)
    labels = connected_components(docs.select("doc_id"), pairs)
    dropped = labels.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    saved = dropped.join(toks, "doc_id").agg(
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("tokens_saved"),
        F.count("*").cast("long").alias("docs_dropped"),
    )
    total = toks.agg(F.sum("n_tok").cast("long").alias("tokens_total"))
    return saved.crossJoin(F.broadcast(total)).select(
        "docs_dropped",
        "tokens_saved",
        "tokens_total",
        (
            F.col("tokens_saved").cast("double")
            / F.col("tokens_total").cast("double")
        ).alias("savings_frac"),
    )


QUERIES["corpus_dedup_savings"] = corpus_dedup_savings

ORACLE["corpus_dedup_savings"] = f"""
    WITH cc AS (
      SELECT * FROM ({ORACLE["dedup_connected_components"]}) c
    ), toks AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok FROM documents
    ), dropped AS (
      SELECT cc.doc_id FROM cc WHERE cc.doc_id <> cc.component
    ), saved AS (
      SELECT CAST(COALESCE(sum(t.n_tok), 0) AS BIGINT) AS tokens_saved,
             CAST(count(*) AS BIGINT) AS docs_dropped
      FROM dropped d JOIN toks t ON t.doc_id = d.doc_id
    )
    SELECT docs_dropped, tokens_saved,
           (SELECT CAST(sum(n_tok) AS BIGINT) FROM toks) AS tokens_total,
           CAST(tokens_saved AS DOUBLE)
             / CAST((SELECT sum(n_tok) FROM toks) AS DOUBLE) AS savings_frac
    FROM saved
"""


# ---------------------------------------------------------------------------
# composed curation pipeline (the r5 gates, end to end)
# ---------------------------------------------------------------------------


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 curation gates composed end-to-end, per document:
    repetition gate → blocklist gate → exact-dup survivor → the final
    keep decision plus every intermediate verdict as audit columns.
    This is the shape a production run actually executes — one pass
    computing all gate signals, one boolean reduction — and composing
    the three SEPARATELY-verified entries under a single oracle pins
    that the composition itself (joins on doc_id, null handling for
    docs a stage never scored) introduces no drift.

    Shape: union of the three gates' linear plans joined on doc_id —
    nothing here is more than a partial-agg shuffle; the exact-dup
    survivor is the same min-doc_id-per-fingerprint groupBy as
    ``dedup_exact``.
    """
    from .dedup import normalized_text

    rep = corpus_repetition_gate(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_repetition")
    )
    blk = corpus_blocklist_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_blocklist")
    )
    docs = load(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5(normalized_text()).alias("fp"))
    firsts = fp.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    dup = fp.join(firsts, "fp").select(
        "doc_id", (F.col("doc_id") == F.col("first_doc")).alias("keep_exact_dup")
    )
    return (
        rep.join(blk, "doc_id")
        .join(dup, "doc_id")
        .select(
            "doc_id",
            "keep_repetition",
            "keep_blocklist",
            "keep_exact_dup",
            (
                F.col("keep_repetition")
                & F.col("keep_blocklist")
                & F.col("keep_exact_dup")
            ).alias("keep"),
        )
    )


QUERIES["corpus_curation_pipeline"] = corpus_curation_pipeline

ORACLE["corpus_curation_pipeline"] = f"""
    WITH rep AS (
      SELECT doc_id, keep AS keep_repetition
      FROM ({ORACLE["corpus_repetition_gate"]}) r
    ), blk AS (
      SELECT doc_id, keep AS keep_blocklist
      FROM ({ORACLE["corpus_blocklist_filter"]}) b
    ), fp AS (
      SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
    ), firsts AS (
      SELECT fp, min(doc_id) AS first_doc FROM fp GROUP BY fp
    ), dup AS (
      SELECT fp.doc_id, (fp.doc_id = firsts.first_doc) AS keep_exact_dup
      FROM fp JOIN firsts USING (fp)
    )
    SELECT rep.doc_id, keep_repetition, keep_blocklist, keep_exact_dup,
           (keep_repetition AND keep_blocklist AND keep_exact_dup) AS keep
    FROM rep JOIN blk USING (doc_id) JOIN dup USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Gopher-style rule filter (r6)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_MIN = 3  # rule: 3·n_words ≤ word_chars
GOPHER_MEAN_LEN_MAX = 10  # rule: word_chars ≤ 10·n_words
GOPHER_STOP_MIN_PCT = 2  # rule: 100·stop_cnt ≥ 2·n_words
GOPHER_TOP_MAX_PCT = 20  # rule: 100·max_tok_cnt ≤ 20·n_words


def corpus_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document rule gate (Rae et al. 2021 §A1.1, adapted to
    this corpus's whitespace-token shape): per document, the raw counts
    plus one boolean per rule — word-count bounds, mean-word-length
    bounds, minimum stopword density, and a repetition cap on the single
    most frequent token — and the conjunction ``keep``.  Unlike
    ``text_quality_score`` (a soft [0,1] blend for ranking), this is the
    HARD filter form production gates run, with per-rule observability
    so a corpus owner can see WHICH rule fires before tuning it.

    Every rule is an integer comparison on exact token counts (e.g. the
    mean-length band is ``3·n ≤ chars ≤ 10·n``, never ``chars/n``), so
    the verdicts are bit-portable across engines — no float thresholds
    under the hash gate.

    Shape: one explode (narrow), a (doc, tok) count, a doc-level
    aggregate — two shuffles, both on high-cardinality keys; no joins,
    no windows, linear at any corpus size.
    """
    from ..functions.text import STOPWORDS

    stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    docs = load(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", F.explode(tokens_expr()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.length("tok") * F.col("c")).cast("long").alias("word_chars"),
        F.max("c").cast("long").alias("max_tok_cnt"),
        F.sum(
            F.when(F.col("tok").isin(*stops), F.col("c")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("stop_cnt"),
    )
    n = F.col("n_words")
    flags = stats.select(
        "doc_id",
        "n_words",
        "word_chars",
        "stop_cnt",
        "max_tok_cnt",
        ((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)).alias("ok_word_count"),
        (
            (F.col("word_chars") >= GOPHER_MEAN_LEN_MIN * n)
            & (F.col("word_chars") <= GOPHER_MEAN_LEN_MAX * n)
        ).alias("ok_mean_word_len"),
        (F.col("stop_cnt") * 100 >= GOPHER_STOP_MIN_PCT * n).alias("ok_stopwords"),
        (F.col("max_tok_cnt") * 100 <= GOPHER_TOP_MAX_PCT * n).alias(
            "ok_repetition"
        ),
    )
    return flags.withColumn(
        "keep",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_stopwords")
        & F.col("ok_repetition"),
    )


QUERIES["corpus_gopher_rules"] = corpus_gopher_rules


def _gopher_oracle() -> str:
    from ..functions.text import STOPWORDS

    stops = ", ".join(
        f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws})
    )
    return f"""
    WITH per_tok AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ), stats AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(sum(length(tok) * c) AS BIGINT) AS word_chars,
             CAST(max(c) AS BIGINT) AS max_tok_cnt,
             CAST(sum(CASE WHEN tok IN ({stops}) THEN c ELSE 0 END) AS BIGINT)
               AS stop_cnt
      FROM per_tok GROUP BY doc_id
    )
    SELECT doc_id, n_words, word_chars, stop_cnt, max_tok_cnt,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
             AS ok_word_count,
           (word_chars >= {GOPHER_MEAN_LEN_MIN} * n_words
            AND word_chars <= {GOPHER_MEAN_LEN_MAX} * n_words)
             AS ok_mean_word_len,
           (stop_cnt * 100 >= {GOPHER_STOP_MIN_PCT} * n_words) AS ok_stopwords,
           (max_tok_cnt * 100 <= {GOPHER_TOP_MAX_PCT} * n_words)
             AS ok_repetition,
           ((n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
            AND (word_chars >= {GOPHER_MEAN_LEN_MIN} * n_words
                 AND word_chars <= {GOPHER_MEAN_LEN_MAX} * n_words)
            AND (stop_cnt * 100 >= {GOPHER_STOP_MIN_PCT} * n_words)
            AND (max_tok_cnt * 100 <= {GOPHER_TOP_MAX_PCT} * n_words)) AS keep
    FROM stats
"""


ORACLE["corpus_gopher_rules"] = _gopher_oracle()


# ---------------------------------------------------------------------------
# tokenizer fertility report (r6)
# ---------------------------------------------------------------------------


def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by (lang, source): sub-word tokens per
    whitespace word and chars per sub-word token — the table a tokenizer
    choice is judged on (fertility ≫ 1 for a language means the
    vocabulary under-serves it, so its documents burn more sequence
    budget per word; budget planners divide token targets by it).

    Uses the shared BPE-ish pre-tokenization (``bpe_ish_count_expr``) as
    the sub-word stand-in.  All sums are exact integer counts; the two
    ratios divide once in double at the end.  One narrow projection plus
    one tiny groupBy on (lang, source) — no joins, no explode.
    """
    from ..functions.text import bpe_ish_count_expr, token_count_expr

    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "source",
        token_count_expr().cast("long").alias("n_words"),
        bpe_ish_count_expr().cast("long").alias("n_bpe"),
        F.length(F.col("text")).cast("long").alias("n_chars"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_bpe").cast("long").alias("bpe_tokens"),
        F.sum("n_chars").cast("long").alias("chars"),
        # NULL, not 0/0: a group of all token-less docs divides 0.0/0.0,
        # where non-ANSI Spark returns NULL but DuckDB's IEEE float op
        # returns NaN — a hash-gate divergence on degenerate corpora
        # (ADVICE r6).  Both engines guard the denominator explicitly.
        F.when(
            F.sum("n_words") > 0,
            F.sum("n_bpe").cast("double") / F.sum("n_words").cast("double"),
        ).alias("fertility"),
        F.when(
            F.sum("n_bpe") > 0,
            F.sum("n_chars").cast("double") / F.sum("n_bpe").cast("double"),
        ).alias("chars_per_token"),
    )


QUERIES["corpus_tokenizer_fertility"] = corpus_tokenizer_fertility

def _fertility_oracle() -> str:
    from ..functions.text import _NORM, BPE_ISH_PATTERN

    return f"""
    WITH per_doc AS (
      SELECT lang, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all({_NORM}, '{BPE_ISH_PATTERN}'))
                  AS BIGINT) AS n_bpe,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS words,
           CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CASE WHEN sum(n_words) > 0 THEN
             CAST(CAST(sum(n_bpe) AS BIGINT) AS DOUBLE)
               / CAST(CAST(sum(n_words) AS BIGINT) AS DOUBLE)
           END AS fertility,
           CASE WHEN sum(n_bpe) > 0 THEN
             CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
               / CAST(CAST(sum(n_bpe) AS BIGINT) AS DOUBLE)
           END AS chars_per_token
    FROM per_doc GROUP BY lang, source
"""


ORACLE["corpus_tokenizer_fertility"] = _fertility_oracle()


# ---------------------------------------------------------------------------
# per-source safety profile (r6)
# ---------------------------------------------------------------------------


def corpus_safety_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source safety dashboard: PII span counts (email / IPv4 /
    phone-shaped, the ``corpus_redact_pii`` patterns) and blocklist
    pressure (the ``corpus_blocklist_filter`` gate), aggregated to one
    row per source — the table that decides which ingest feeds need
    redaction or exclusion BEFORE paying per-document treatment.  A
    source with pii_docs ≈ n_docs gets routed through redaction; one
    with a high blocked_docs share gets dropped wholesale.

    Per-document work is pure codegen regex/HOF projections over the
    corpus scan (no shuffle); the aggregate is one groupBy on the tiny
    source key.  The blocked-doc verdict reuses the blocklist gate's
    exact double comparison so the two entries can never disagree.
    """
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_IPV4), 0))
        .cast("long")
        .alias("ips"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), 0))
        .cast("long")
        .alias("phones"),
        tokens_expr().alias("toks"),
    ).select(
        "source",
        "emails",
        "ips",
        "phones",
        F.size(F.filter(F.col("toks"), lambda x: x.isin(*BLOCKLIST)))
        .cast("long")
        .alias("blocked"),
        F.size("toks").cast("long").alias("n_tok"),
    )
    frac = F.when(
        F.col("n_tok") > 0, F.col("blocked") / F.col("n_tok").cast("double")
    ).otherwise(F.lit(0.0))
    flagged = per_doc.withColumn(
        "is_pii", (F.col("emails") + F.col("ips") + F.col("phones")) > 0
    ).withColumn("is_blocked", frac > BLOCK_FRAC_MAX)
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("emails").cast("long").alias("email_hits"),
        F.sum("ips").cast("long").alias("ip_hits"),
        F.sum("phones").cast("long").alias("phone_hits"),
        F.sum(F.col("is_pii").cast("long")).cast("long").alias("pii_docs"),
        F.sum("blocked").cast("long").alias("blocked_tokens"),
        F.sum(F.col("is_blocked").cast("long")).cast("long").alias("blocked_docs"),
    )


QUERIES["corpus_safety_profile"] = corpus_safety_profile

ORACLE["corpus_safety_profile"] = f"""
    WITH per_doc AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
               AS emails,
             CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT)
               AS ips,
             CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
               AS phones,
             CAST(len(list_filter({_TOKS}, x -> x IN ({_BLOCK_IN})))
                  AS BIGINT) AS blocked,
             CAST(len({_TOKS}) AS BIGINT) AS n_tok
      FROM documents
    ), flagged AS (
      SELECT *,
             (emails + ips + phones) > 0 AS is_pii,
             (CASE WHEN n_tok > 0 THEN blocked / CAST(n_tok AS DOUBLE)
                   ELSE 0.0 END) > {BLOCK_FRAC_MAX} AS is_blocked
      FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(emails) AS BIGINT) AS email_hits,
           CAST(sum(ips) AS BIGINT) AS ip_hits,
           CAST(sum(phones) AS BIGINT) AS phone_hits,
           CAST(sum(CASE WHEN is_pii THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
           CAST(sum(blocked) AS BIGINT) AS blocked_tokens,
           CAST(sum(CASE WHEN is_blocked THEN 1 ELSE 0 END) AS BIGINT)
             AS blocked_docs
    FROM flagged GROUP BY source
"""


# ---------------------------------------------------------------------------
# composed curation pipeline v2 (the r6 gates folded in, VERDICT r6 #8)
# ---------------------------------------------------------------------------

# a source whose blocked-doc share exceeds this integer percentage is
# dropped wholesale (the corpus_safety_profile routing decision applied;
# the synthetic fixture's shares run 12-52%, so 35 drops a real minority
# of sources instead of none or all)
SAFETY_SOURCE_MAX_PCT = 35


def corpus_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production curation pipeline, v2: six sequential gates in
    production order — exact-dup survivor → source-safety (drop every
    doc of a source whose blocked share exceeds
    ``SAFETY_SOURCE_MAX_PCT``%) → repetition → blocklist → Gopher rules
    → 13-gram decontamination — with PER-STAGE DROP COUNTS as the
    output: one row
    per stage with (docs_in, dropped, docs_out) under sequential
    semantics (a doc dropped at stage i never counts against stage j>i).
    Composition is where operator interactions break, so this runs the
    separately-verified gates under ONE oracle.

    The r6 embedding-space cross-split check stays a separate entry:
    it is keyed by vec_id and the fixture has no doc↔vec mapping — in
    production it slots in exactly like the decontamination stage.

    Shape: each gate is its verified linear plan; verdicts join on
    doc_id (one shuffle each); the stage table is ONE single-row
    aggregate inlined to six rows — no window, no extra pass.
    """
    from .dedup import normalized_text

    docs = load(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5(normalized_text()).alias("fp"))
    firsts = fp.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    dup = fp.join(firsts, "fp").select(
        "doc_id", (F.col("doc_id") == F.col("first_doc")).alias("k1")
    )
    bad_src = corpus_safety_profile(spark, sf_dir).filter(
        F.col("blocked_docs") * 100 > F.lit(SAFETY_SOURCE_MAX_PCT) * F.col("n_docs")
    ).select("source", F.lit(False).alias("k2"))
    src = docs.select("doc_id", "source").join(
        F.broadcast(bad_src), "source", "left"
    ).select("doc_id", F.coalesce("k2", F.lit(True)).alias("k2"))
    rep = corpus_repetition_gate(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("k3")
    )
    blk = corpus_blocklist_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("k4")
    )
    gop = corpus_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("k5")
    )
    contaminated = corpus_decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(False).alias("k6")
    )
    decon = docs.select("doc_id").join(contaminated, "doc_id", "left").select(
        "doc_id", F.coalesce("k6", F.lit(True)).alias("k6")
    )
    v = (
        dup.join(src, "doc_id")
        .join(rep, "doc_id")
        .join(blk, "doc_id")
        .join(gop, "doc_id")
        .join(decon, "doc_id")
    )
    surv = [F.lit(True)]
    for i in range(1, 7):
        surv.append(surv[-1] & F.col(f"k{i}"))
    agg = v.agg(
        *[
            F.sum(surv[i].cast("long")).cast("long").alias(f"n{i}")
            for i in range(7)
        ]
    )
    stages = [
        "exact_dup",
        "source_safety",
        "repetition",
        "blocklist",
        "gopher_rules",
        "decontaminate",
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("stage"),
                F.lit(i + 1).cast("int").alias("stage_idx"),
                F.col(f"n{i}").alias("docs_in"),
                (F.col(f"n{i}") - F.col(f"n{i + 1}")).alias("dropped"),
                F.col(f"n{i + 1}").alias("docs_out"),
            )
            for i, name in enumerate(stages)
        ]
    )
    return agg.select(F.inline(rows))


QUERIES["corpus_curation_pipeline_v2"] = corpus_curation_pipeline_v2

ORACLE["corpus_curation_pipeline_v2"] = f"""
    WITH fp AS (
      SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
    ), firsts AS (
      SELECT fp, min(doc_id) AS first_doc FROM fp GROUP BY fp
    ), dup AS (
      SELECT fp.doc_id, (fp.doc_id = firsts.first_doc) AS k1
      FROM fp JOIN firsts USING (fp)
    ), bad_src AS (
      SELECT source FROM ({ORACLE["corpus_safety_profile"]}) s
      WHERE blocked_docs * 100 > {SAFETY_SOURCE_MAX_PCT} * n_docs
    ), src AS (
      SELECT d.doc_id, (bs.source IS NULL) AS k2
      FROM documents d LEFT JOIN bad_src bs ON bs.source = d.source
    ), rep AS (
      SELECT doc_id, keep AS k3 FROM ({ORACLE["corpus_repetition_gate"]}) r
    ), blk AS (
      SELECT doc_id, keep AS k4 FROM ({ORACLE["corpus_blocklist_filter"]}) b
    ), gop AS (
      SELECT doc_id, keep AS k5 FROM ({ORACLE["corpus_gopher_rules"]}) g
    ), decon AS (
      SELECT d.doc_id, (c.doc_id IS NULL) AS k6
      FROM documents d
      LEFT JOIN ({ORACLE["corpus_decontaminate"]}) c ON c.doc_id = d.doc_id
    ), v AS (
      SELECT dup.doc_id, k1, k1 AND k2 AS s2, k1 AND k2 AND k3 AS s3,
             k1 AND k2 AND k3 AND k4 AS s4,
             k1 AND k2 AND k3 AND k4 AND k5 AS s5,
             k1 AND k2 AND k3 AND k4 AND k5 AND k6 AS s6
      FROM dup JOIN src USING (doc_id) JOIN rep USING (doc_id)
      JOIN blk USING (doc_id) JOIN gop USING (doc_id)
      JOIN decon USING (doc_id)
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
             CAST(sum(CASE WHEN s5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
             CAST(sum(CASE WHEN s6 THEN 1 ELSE 0 END) AS BIGINT) AS n6
      FROM v
    )
    SELECT 'exact_dup' AS stage, CAST(1 AS INTEGER) AS stage_idx,
           n0 AS docs_in, n0 - n1 AS dropped, n1 AS docs_out FROM agg
    UNION ALL SELECT 'source_safety', 2, n1, n1 - n2, n2 FROM agg
    UNION ALL SELECT 'repetition', 3, n2, n2 - n3, n3 FROM agg
    UNION ALL SELECT 'blocklist', 4, n3, n3 - n4, n4 FROM agg
    UNION ALL SELECT 'gopher_rules', 5, n4, n4 - n5, n5 FROM agg
    UNION ALL SELECT 'decontaminate', 6, n5, n5 - n6, n6 FROM agg
"""


# ---------------------------------------------------------------------------
# multi-signal ensemble dedup (r8)
# ---------------------------------------------------------------------------


def multi_signal_components(docs: DataFrame) -> DataFrame:
    """Near-dup clusters over the UNION of two independent signals —
    MinHash-LSH-verified n-gram Jaccard edges AND SimHash Hamming-≤3
    edges — with connected components and min-id survivorship.  The
    curation-ensemble pattern: token-SET similarity (Jaccard) misses a
    doc whose dominant tokens match but whose set overlap is diluted;
    the frequency-weighted bit sketch (SimHash) misses a doc whose rare
    tokens moved; the union clusters what EITHER signal can see, and
    transitive closure merges chains that cross signals (a→b by Jaccard,
    b→c by SimHash ⇒ one cluster).

    Scale: both edge generators are the linear banded pipelines already
    in production (bucket-capped candidate joins, exact verifies); the
    union is edge-count additive; the CC loop touches only the
    edge-induced subgraph.  Deterministic end to end, so the ensemble
    sits under the same hash gate as its parts.
    """
    from .dedup import (
        _bands_from_sig,
        _candidates_from_bands,
        _simhash_pairs_from_sketch,
        dual_sketch_udf,
        verify_pairs_jaccard,
    )

    # ONE corpus scan, ONE tokenize (r9, VERDICT r8 #4): the dual-sketch
    # UDF computes both signatures per Arrow batch and the cached sketch
    # relation forks into the two (unchanged) band pipelines — the two
    # chains previously each re-read and re-tokenized the corpus.
    dual = dual_sketch_udf(3)
    sketch = bounded_cache(
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select("doc_id", dual(F.col("text")).alias("d"))
        .select(
            "doc_id",
            F.col("d.sig").alias("sig"),
            F.col("d.simhash").alias("simhash"),
        )
    )
    sig = sketch.filter(F.size("sig") > 0).select("doc_id", "sig")
    jac = verify_pairs_jaccard(
        _candidates_from_bands(_bands_from_sig(sig), max_bucket=64),
        docs,
        n=3,
        threshold=0.5,
    ).select("doc_id_a", "doc_id_b")
    sh = sketch.filter(F.col("simhash").isNotNull()).select("doc_id", "simhash")
    # COMPONENT-EQUIVALENT compression of the SimHash leg (r9): the
    # Hamming graph factors through sketch VALUES — docs sharing a
    # sketch are a guaranteed clique (Hamming 0), and every cross-sketch
    # doc edge is the same sketch-pair edge repeated |A|·|B| times.  For
    # CC, star each identical-sketch group to its min-id rep (a real
    # Hamming-0 edge) and Hamming-join the DISTINCT sketches once; the
    # compressed set is a subset of the verified edges with identical
    # connectivity.  Measured at 10× stress: 8.48M verified doc edges →
    # ~13k stars + rep pairs over 37k distinct sketches; the CC loop
    # stops paying for clique re-statement.  The full pair ENUMERATION
    # (``dedup_simhash_pairs``) is untouched — this is the CC feed only.
    groups = sh.groupBy("simhash").agg(F.min("doc_id").alias("rep"))
    stars = (
        sh.join(groups, "simhash")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(
            F.col("rep").alias("doc_id_a"), F.col("doc_id").alias("doc_id_b")
        )
    )
    reps = bounded_cache(
        groups.select(F.col("rep").alias("doc_id"), "simhash")
    )
    rep_pairs = _simhash_pairs_from_sketch(reps, max_hamming=3).select(
        "doc_id_a", "doc_id_b"
    )
    sim = rep_pairs.unionByName(stars)
    # NO distinct on the union: min-label propagation is insensitive to
    # duplicate edges (every aggregation is a min), the only dups are the
    # jac∩sim overlap (bounded 2×), and the distinct was a full exchange
    # of the edge set — 8.7M rows at 10× stress — bought for nothing the
    # CC loop doesn't already absorb.
    comp = connected_components(docs.select("doc_id"), jac.unionByName(sim))
    return comp.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("survivor"),
    )


def dedup_multi_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multi_signal_components(load(spark, sf_dir, "documents"))


QUERIES["dedup_multi_signal"] = dedup_multi_signal

# the edge CTEs are the registered oracles of BOTH signals verbatim, so
# the ensemble can never drift from its parts
ORACLE["dedup_multi_signal"] = f"""
    WITH RECURSIVE jac AS (
      SELECT doc_id_a, doc_id_b
      FROM ({_DEDUP_ORACLE["dedup_minhash_verified"]}) j
    ), sh AS (
      SELECT doc_id_a, doc_id_b
      FROM ({_DEDUP_ORACLE["dedup_simhash_pairs"]}) s
    ), pairs AS (
      SELECT doc_id_a, doc_id_b FROM jac
      UNION
      SELECT doc_id_a, doc_id_b FROM sh
    ), edges AS (
      SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
      UNION ALL
      SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
    ), reach(root, node) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT root AS doc_id, CAST(min(node) AS BIGINT) AS component,
           (root = CAST(min(node) AS BIGINT)) AS survivor
    FROM reach GROUP BY root
"""


# ---------------------------------------------------------------------------
# BPE tokenizer training under the hash gate (r9)
# ---------------------------------------------------------------------------

BPE_MERGES = 6


# Train-once memo: (sf_dir, corpus_fingerprint, rounds, tag) ->
# StagingWarehouse root holding the persisted tokenizer artifact
# (stg_bpe_merges + stg_bpe_vocab).  The production tokenizer lifecycle
# is train once, persist, encode many — retraining inside every encode
# was the r9 bench's most expensive entry (VERDICT r9 "what's wrong"
# #1).  The fingerprint (documents.parquet mtime) guards against a
# rewritten corpus at the same path silently serving a stale tokenizer
# (ADVICE r10).
_BPE_ARTIFACTS: dict[tuple[str, float, int, str], str] = {}


def _corpus_fingerprint(sf_dir: str) -> float:
    """mtime of the corpus parquet (or the sf_dir itself as a fallback):
    an in-process rewrite of the same path changes the fingerprint, so
    the memo retrains instead of serving the stale artifact."""
    import os as _os

    for cand in ("documents.parquet", ""):
        p = _os.path.join(sf_dir, cand) if cand else sf_dir
        try:
            return _os.path.getmtime(p)
        except OSError:
            continue
    return 0.0


def bpe_tokenizer_warehouse(
    spark,
    sf_dir,
    rounds: int = BPE_MERGES,
    *,
    docs: DataFrame | None = None,
    tag: str = "full",
):
    """Train-once-per-(corpus, rounds) BPE tokenizer artifact: on first
    call, run the training loop and persist BOTH halves of the tokenizer
    file through the atomic staging protocol —

    - ``stg_bpe_merges``: the learned merge table (iter, left, right,
      count) — the tokenizer file proper, what ships to other jobs;
    - ``stg_bpe_vocab``: the fully-merged word-TYPE segmentation
      (word, freq, toks) — the compiled form fast tokenizers cache, so
      encoding a corpus is ONE vocabulary-sized broadcast join instead
      of replaying the merge loop.

    Subsequent calls (any entry in the same session, e.g. the merges
    report and then an encode) reuse the stored artifact.  Returns the
    ``StagingWarehouse`` holding both tables.

    ``docs``/``tag`` train on an explicit corpus slice under a distinct
    artifact key (e.g. ``tag="train_even"`` for the held-out
    application entry) — the tag IS the memo identity, so pass a
    distinct tag for a distinct slice."""
    from ..util import scratch_dir
    from .staging import StagingWarehouse

    key = (sf_dir, _corpus_fingerprint(sf_dir), rounds, tag)
    root = _BPE_ARTIFACTS.get(key)
    if root is None:
        root = scratch_dir("spark_graft_bpe_")
        wh = StagingWarehouse(spark, root)
        cur, merges = _bpe_loop(spark, sf_dir, rounds, apply_last=True, docs=docs)
        wh.write(
            spark.createDataFrame(
                merges,
                "iter int, merge_left string, merge_right string,"
                " pair_count long",
            ),
            "bpe_merges",
            incremental=False,
        )
        wh.write(
            cur.select("word", "freq", "toks"), "bpe_vocab", incremental=False
        )
        _BPE_ARTIFACTS[key] = root
        return wh
    return StagingWarehouse(spark, root)


def corpus_bpe_merges(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_MERGES
) -> DataFrame:
    """Train the first ``rounds`` BPE merges over the corpus, engine-
    exact — the tokenizer-TRAINING half next to
    ``corpus_tokenizer_fertility``'s apply-side measurement.  Classic
    byte-pair encoding: start from character sequences per word TYPE
    (weighted by corpus frequency), and per round promote the most
    frequent adjacent symbol pair (ties: higher count, then lexicographic
    left, then right) and merge it greedily left-to-right everywhere.

    Scale shape: the corpus is scanned ONCE (the word-frequency groupBy
    — the only data-sized step); every merge round then runs on the word
    TYPE table (vocabulary-sized, ~10M rows at 100 TB, trivially
    distributed).  The greedy leftmost merge is NOT a sequential fold
    here: within a run of consecutive matching positions greedy takes
    every other one, so it is computed relationally as run-membership
    parity (posexplode -> lead -> run id = pos - row_number among
    matches -> odd rank within run merges), all window functions over
    (word, pos) — no UDF, no driver loop over rows.  The winning pair
    itself is a 1-row driver literal per round, the linreg/k-means
    primitive.  The DuckDB oracle unrolls the identical relational
    algebra per round (m{r}/t{r} CTEs), so the full merge-table
    trajectory hash-matches.

    Output: one row per round — (iter, merge_left, merge_right,
    pair_count), read back from the persisted tokenizer artifact
    (``bpe_tokenizer_warehouse``): this entry IS the train-and-persist
    step, and encode entries compose through the stored tables instead
    of retraining (VERDICT r9 #2)."""
    wh = bpe_tokenizer_warehouse(spark, sf_dir, rounds)
    if not wh.exists("bpe_merges"):
        # exhausted corpus learned zero merges: an empty write commits
        # no batch, so materialize the empty trajectory directly
        return spark.createDataFrame(
            [],
            "iter int, merge_left string, merge_right string, pair_count long",
        )
    return wh.read("bpe_merges")


def _apply_merge(cur: DataFrame, lft: str, rgt: str) -> DataFrame:
    """One greedy-leftmost merge rewrite over a (word, freq, toks) type
    table — the run-parity relational form (see ``corpus_bpe_merges``):
    posexplode → lead → match islands → odd rank merges → lag skips the
    consumed right token.  Shared by training (rewrite after each
    learned winner) and APPLICATION (replaying a stored merge list over
    new word types — the OOV-correct way to tokenize text the training
    corpus never saw)."""
    wp = Window.partitionBy("word").orderBy("pos")
    e = (
        cur.select("word", "freq", F.posexplode("toks").alias("pos", "t"))
        .withColumn("nxt", F.lead("t").over(wp))
        .withColumn(
            "match",
            F.coalesce(
                (F.col("t") == F.lit(lft)) & (F.col("nxt") == F.lit(rgt)),
                F.lit(False),
            ),
        )
    )
    # greedy leftmost within a run of consecutive matches = odd rank
    # in the run (run id: pos minus rank among the word's matches)
    e = e.withColumn(
        "grp",
        F.when(
            F.col("match"),
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("word", "match").orderBy("pos")
            ),
        ),
    ).withColumn(
        "mh",
        F.col("match")
        & (
            F.row_number().over(
                Window.partitionBy("word", "match", "grp").orderBy("pos")
            )
            % 2
            == 1
        ),
    )
    e = e.withColumn("pm", F.coalesce(F.lag("mh").over(wp), F.lit(False)))
    return (
        e.filter(~F.col("pm"))
        .withColumn(
            "v",
            F.when(F.col("mh"), F.concat("t", "nxt")).otherwise(F.col("t")),
        )
        .groupBy("word", "freq")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, v))), x -> x.v)")
            .alias("toks")
        )
    )


def _char_types(words: DataFrame) -> DataFrame:
    """Word-type table at the character segmentation (BPE round 0)."""
    return words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("toks"),
    )


def _bpe_loop(
    spark: SparkSession,
    sf_dir: str,
    rounds: int,
    *,
    apply_last: bool,
    docs: DataFrame | None = None,
) -> tuple[DataFrame, list]:
    """Shared BPE training loop: returns (final word-type table with its
    ``toks`` segmentation, [(iter, left, right, count), ...]).  The
    training entry skips the last rewrite (it only reports winners);
    the encode entry applies it (the segmentation must reflect ALL
    learned merges).  ``docs`` overrides the corpus (e.g. a train
    split for held-out application)."""
    if docs is None:
        docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens_expr()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    cur = bounded_cache(_char_types(freq))
    out = []
    for r in range(1, rounds + 1):
        pairs = cur.filter(F.size("toks") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS l, toks[i + 1] AS r))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .first()
        )
        if best is None:
            # corpus exhausted its adjacent pairs (e.g. every word a
            # single symbol after earlier merges) — return the merges
            # actually learnable rather than crashing on round r
            break
        lft, rgt, cnt = best["l"], best["r"], int(best["cnt"])
        out.append((r, lft, rgt, cnt))
        if r == rounds and not apply_last:  # training needs no last rewrite
            break
        cur = bounded_cache(_apply_merge(cur, lft, rgt))
    return cur, out


QUERIES["corpus_bpe_merges"] = corpus_bpe_merges


def _bpe_encode_with(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per-document word count and total BPE token count under a given
    word-type segmentation: one corpus scan + one vocabulary-sized
    broadcast join — the tokenizer-APPLICATION shape."""
    words = docs.select("doc_id", F.explode(tokens_expr()).alias("word"))
    return (
        words.join(
            F.broadcast(
                vocab.select(
                    "word", F.size("toks").cast("long").alias("bpe_len")
                )
            ),
            "word",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("bpe_len").alias("n_bpe_tokens"),
        )
    )


def corpus_bpe_encode(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_MERGES
) -> DataFrame:
    """Apply the learned BPE to the corpus — the encode half of
    ``corpus_bpe_merges``: per document, word count and total BPE token
    count under the fully-merged segmentation.  SELF-CONTAINED form:
    trains in-line, for callers that want one call and no artifact
    store.  Demoted from the registry in r10 (a conscious VERDICT r9 #2
    decision): retraining per encode is not the production shape and
    was the bench's most expensive entry — the registered encode is
    ``corpus_bpe_encode_pretrained``, which composes through the
    persisted tokenizer and carries the SAME oracle algebra."""
    cur, _ = _bpe_loop(spark, sf_dir, rounds, apply_last=True)
    return _bpe_encode_with(load(spark, sf_dir, "documents"), cur)


def corpus_bpe_encode_pretrained(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_MERGES
) -> DataFrame:
    """Encode the corpus from the PERSISTED tokenizer artifact — the
    production lifecycle: ``bpe_tokenizer_warehouse`` trains once per
    (corpus, rounds) and stores merge table + compiled segmentation
    through the atomic staging protocol; every encode after that is one
    corpus scan plus a vocabulary-sized broadcast join against the
    stored ``stg_bpe_vocab`` (no merge-loop replay).  Hash-gated by the
    same unrolled oracle as the self-contained encode: the stored
    segmentation is bit-identical to the training loop's, so composing
    through the artifact must not change a single count."""
    vocab = bpe_tokenizer_warehouse(spark, sf_dir, rounds).read("bpe_vocab")
    return _bpe_encode_with(load(spark, sf_dir, "documents"), vocab)


QUERIES["corpus_bpe_encode_pretrained"] = corpus_bpe_encode_pretrained


def bpe_segment_types(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Segment NEW word types by replaying a stored merge list in
    training order — how a tokenizer is actually APPLIED to text the
    training corpus never saw: each merge is the same greedy-leftmost
    relational rewrite used in training, so a word known to training
    segments identically to the stored vocab, and an out-of-vocabulary
    word gets the correct merge-rule segmentation (never dropped, never
    guessed).  Cost: ``len(merges)`` window passes over the NEW type
    table — vocabulary-sized, corpus-size-independent.

    ``words``: (word, freq) types; returns (word, freq, toks)."""
    cur = bounded_cache(_char_types(words))
    for lft, rgt in merges:
        cur = bounded_cache(_apply_merge(cur, lft, rgt))
    return cur


def corpus_bpe_apply_holdout(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_MERGES
) -> DataFrame:
    """Held-out tokenizer application — the cross-corpus half of the BPE
    lifecycle: TRAIN on the even-doc_id half of the corpus (persisted
    once via ``bpe_tokenizer_warehouse(tag='train_even')``), then encode
    the ODD half by REPLAYING the stored merge table over the holdout's
    own word types (``bpe_segment_types``).  This is what
    ``corpus_bpe_encode_pretrained``'s vocab join cannot do: a word the
    training half never saw has no stored segmentation — replaying the
    merge RULES segments it correctly instead of silently dropping it
    (exactly how production tokenizers handle unseen text).

    Scale shape: training is vocab-bound as before; application is
    ``rounds`` window passes over the HOLDOUT type table (vocabulary-
    sized) plus one corpus scan and one broadcast join-back.  Fully
    hash-gated: the oracle chains the train CTEs (filtered to the even
    half) with an apply chain of the same run-parity algebra over the
    odd half's types."""
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    hold = docs.filter(F.col("doc_id") % 2 == 1)
    wh = bpe_tokenizer_warehouse(
        spark, sf_dir, rounds, docs=train, tag="train_even"
    )
    merges: list[tuple[str, str]] = []
    if wh.exists("bpe_merges"):
        merges = [
            (r["merge_left"], r["merge_right"])
            for r in sorted(
                wh.read("bpe_merges").collect(), key=lambda r: r["iter"]
            )
        ]
    types = hold.select(F.explode(tokens_expr()).alias("word")).groupBy(
        "word"
    ).agg(F.count("*").alias("freq"))
    return _bpe_encode_with(hold, bpe_segment_types(types, merges))


QUERIES["corpus_bpe_apply_holdout"] = corpus_bpe_apply_holdout


def _bpe_oracle_parts(
    rounds: int = BPE_MERGES, *, encode: bool = False, where: str = ""
) -> list[str]:
    """CTE blocks of the unrolled BPE twin: p{r} pair counts, m{r} the
    winning pair (same ORDER BY tie rule), e/f/g/h/k{r} the run-parity
    greedy merge, t{r} the rewritten type table.  Everything
    MATERIALIZED — m{r} is referenced via scalar subqueries and t{r}
    feeds two consumers.  ``where`` filters the training corpus (the
    held-out twin trains on half)."""
    parts = [
        f"""freq AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest({_TOKS}) AS word FROM documents{where})
          GROUP BY word
        ), t0 AS MATERIALIZED (
          SELECT word, freq,
                 list_transform(generate_series(1, length(word)),
                                i -> substr(word, i, 1)) AS toks
          FROM freq
        )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
          SELECT l, r2, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT freq, toks[i] AS l, toks[i + 1] AS r2
            FROM t{r - 1}, unnest(generate_series(1, len(toks) - 1)) AS u(i)
          ) GROUP BY l, r2
        ), m{r} AS MATERIALIZED (
          SELECT l, r2, cnt FROM p{r} ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
        )"""
        )
        if r < rounds or encode:  # training needs no last rewrite
            parts.append(
                f"""e{r} AS MATERIALIZED (
          SELECT word, freq, i AS pos, toks[i] AS t,
                 CASE WHEN i < len(toks) THEN toks[i + 1] END AS nxt
          FROM t{r - 1}, unnest(generate_series(1, len(toks))) AS u(i)
        ), f{r} AS MATERIALIZED (
          SELECT *, COALESCE(t = (SELECT l FROM m{r})
                             AND nxt = (SELECT r2 FROM m{r}), FALSE) AS match
          FROM e{r}
        ), g{r} AS MATERIALIZED (
          SELECT *, CASE WHEN match THEN pos - ROW_NUMBER()
                   OVER (PARTITION BY word, match ORDER BY pos) END AS grp
          FROM f{r}
        ), h{r} AS MATERIALIZED (
          SELECT *, match AND (ROW_NUMBER()
                   OVER (PARTITION BY word, match, grp ORDER BY pos) % 2 = 1)
                   AS mh
          FROM g{r}
        ), k{r} AS MATERIALIZED (
          SELECT *, COALESCE(lag(mh) OVER (PARTITION BY word ORDER BY pos),
                             FALSE) AS pm
          FROM h{r}
        ), t{r} AS MATERIALIZED (
          SELECT word, freq,
                 list(CASE WHEN mh THEN t || nxt ELSE t END ORDER BY pos)
                   AS toks
          FROM k{r} WHERE NOT pm GROUP BY word, freq
        )"""
            )
    return parts


def _bpe_oracle(rounds: int = BPE_MERGES, *, encode: bool = False) -> str:
    """Full unrolled twin: the merge-table trajectory, or (``encode``)
    the per-document join-back through t{rounds}."""
    parts = _bpe_oracle_parts(rounds, encode=encode)
    if encode:
        sel = f"""SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(t.toks)) AS BIGINT) AS n_bpe_tokens
        FROM (SELECT doc_id, unnest({_TOKS}) AS word FROM documents) d
        JOIN t{rounds} t USING (word)
        GROUP BY d.doc_id"""
    else:
        sel = "\n        UNION ALL ".join(
            f"SELECT CAST({r} AS INTEGER) AS iter, l AS merge_left,"
            f" r2 AS merge_right, cnt AS pair_count FROM m{r}"
            for r in range(1, rounds + 1)
        )
    return "WITH " + ",\n        ".join(parts) + "\n        " + sel


def _bpe_holdout_oracle(rounds: int = BPE_MERGES) -> str:
    """Twin of ``corpus_bpe_apply_holdout``: the train chain filtered to
    the even half (merges only — no final rewrite needed), then an
    APPLY chain replaying each m{r} over the odd half's word types with
    the identical run-parity algebra (a0 char types -> a{r}), and the
    per-document join-back over the odd half."""
    parts = _bpe_oracle_parts(rounds, encode=False,
                              where=" WHERE doc_id % 2 = 0")
    parts.append(
        f"""a0 AS MATERIALIZED (
          SELECT word, CAST(1 AS BIGINT) AS freq,
                 list_transform(generate_series(1, length(word)),
                                i -> substr(word, i, 1)) AS toks
          FROM (SELECT DISTINCT unnest({_TOKS}) AS word
                FROM documents WHERE doc_id % 2 = 1)
        )"""
    )
    for r in range(1, rounds + 1):
        parts.append(
            f"""ae{r} AS MATERIALIZED (
          SELECT word, freq, i AS pos, toks[i] AS t,
                 CASE WHEN i < len(toks) THEN toks[i + 1] END AS nxt
          FROM a{r - 1}, unnest(generate_series(1, len(toks))) AS u(i)
        ), af{r} AS MATERIALIZED (
          SELECT *, COALESCE(t = (SELECT l FROM m{r})
                             AND nxt = (SELECT r2 FROM m{r}), FALSE) AS match
          FROM ae{r}
        ), ag{r} AS MATERIALIZED (
          SELECT *, CASE WHEN match THEN pos - ROW_NUMBER()
                   OVER (PARTITION BY word, match ORDER BY pos) END AS grp
          FROM af{r}
        ), ah{r} AS MATERIALIZED (
          SELECT *, match AND (ROW_NUMBER()
                   OVER (PARTITION BY word, match, grp ORDER BY pos) % 2 = 1)
                   AS mh
          FROM ag{r}
        ), ak{r} AS MATERIALIZED (
          SELECT *, COALESCE(lag(mh) OVER (PARTITION BY word ORDER BY pos),
                             FALSE) AS pm
          FROM ah{r}
        ), a{r} AS MATERIALIZED (
          SELECT word, freq,
                 list(CASE WHEN mh THEN t || nxt ELSE t END ORDER BY pos)
                   AS toks
          FROM ak{r} WHERE NOT pm GROUP BY word, freq
        )"""
        )
    sel = f"""SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(a.toks)) AS BIGINT) AS n_bpe_tokens
        FROM (SELECT doc_id, unnest({_TOKS}) AS word
              FROM documents WHERE doc_id % 2 = 1) d
        JOIN a{rounds} a USING (word)
        GROUP BY d.doc_id"""
    return "WITH " + ",\n        ".join(parts) + "\n        " + sel


ORACLE["corpus_bpe_merges"] = _bpe_oracle()
# the pretrained encode composes through the stored artifact, but its
# algebra is the training loop's own (the stored segmentation is the
# loop's output verbatim) — same unrolled twin
ORACLE["corpus_bpe_encode_pretrained"] = _bpe_oracle(encode=True)
ORACLE["corpus_bpe_apply_holdout"] = _bpe_holdout_oracle()


MIX_BUDGET_PCT = 60  # gate default: schedule 60% of the corpus tokens


def mix_waterfill(
    avail: DataFrame, budget: int, *, scale: int = 1_000_000
) -> DataFrame:
    """Token-budget WATERFILL across sources — the mixture-scheduling
    step of a training-data pipeline: given per-source available tokens
    and target mixture weights, allocate a total ``budget`` so every
    source gets tokens proportional to its weight until it SATURATES
    (runs out), with the shortfall redistributed to the others at the
    same water level.  Single-epoch form: allocation never exceeds
    availability (no oversampling), so the output is directly a
    per-source sampling rate.

    Relational closed form (no driver loop): sources sort by their
    saturation level r = avail·scale / w; a prefix scan finds the first
    source the remaining budget cannot fill to its level — the water
    level λ is the budget left at that point spread over the remaining
    weight.  Everything integer (fixed-point ``scale``), divisions on
    non-negative operands only (Spark ``div`` truncates, DuckDB ``//``
    floors — identical on non-negatives), so the schedule replays
    bit-for-bit in the oracle.  One 20-row window — at 100 TB the
    source table is still tiny (thousands of rows), while the token
    counts underneath it come from the one corpus scan.

    ``avail``: (source, w, avail) — weight and available tokens."""
    from pyspark.sql import Window

    tot = avail.agg(
        F.sum("w").cast("long").alias("_W"),
        F.sum("avail").cast("long").alias("_A"),
    )
    a = avail.crossJoin(F.broadcast(tot)).withColumn(
        "r", F.expr(f"CAST(avail AS BIGINT) * {scale} div w")
    )
    win = Window.orderBy("r", "source")
    a = (
        a.withColumn(
            "_pre_avail",
            F.coalesce(
                F.sum("avail").over(win.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "_pre_w",
            F.coalesce(
                F.sum("w").over(win.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("_w_from", F.col("_W") - F.col("_pre_w"))
        .withColumn(
            "_test",
            F.when(F.col("_pre_avail") > budget, F.lit(-1).cast("long")).otherwise(
                F.expr(f"({budget} - _pre_avail) * {scale} div _w_from")
            ),
        )
    )
    lam = (
        a.filter(F.col("_test") < F.col("r"))
        .orderBy("r", "source")
        .limit(1)
        .select(F.col("_test").alias("_lam"))
    )
    # no unsaturated source: the budget covers everything — λ = +inf
    lam = lam.unionByName(
        a.sparkSession.createDataFrame([(None,)], "_lam long")
    ).select(F.first("_lam", ignorenulls=True).alias("_lam"))
    # greatest(_lam, 0): in the exhausted-budget branch the sentinel water
    # level is -1, and a negative operand under div/​// diverges between
    # engines (Spark truncates toward zero, DuckDB floors) — clamping at
    # zero allocates 0 to exhausted rows in all implementations
    # identically (ADVICE r10)
    out = a.crossJoin(F.broadcast(lam)).withColumn(
        "alloc",
        F.when(F.col("_lam").isNull() | (F.col("r") <= F.col("_lam")),
               F.col("avail").cast("long"))
        .otherwise(F.expr(f"w * greatest(_lam, 0) div {scale}")),
    )
    return out.select(
        "source",
        F.col("w").cast("int").alias("w"),
        F.col("avail").cast("long").alias("avail_tokens"),
        F.col("alloc").cast("long").alias("alloc_tokens"),
        (F.col("_lam").isNull() | (F.col("r") <= F.col("_lam"))).alias("saturated"),
        F.expr(f"CAST(alloc * {scale} div avail AS BIGINT)").alias(
            "sampling_rate_x1e6"
        ),
        F.lit(budget).cast("long").alias("budget_tokens"),
    )


def _mix_inputs(spark: SparkSession, sf_dir: str):
    """(per_doc, avail) for the mixture family — one corpus scan shape,
    gate weights w = 1 + source_number % 4 (non-uniform so saturation
    and redistribution are REAL under the gate)."""
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id", "source", F.size(tokens_expr()).cast("long").alias("n_tok")
    )
    avail = (
        per_doc.groupBy("source")
        .agg(F.sum("n_tok").alias("avail"))
        .withColumn("w", F.expr("1 + CAST(substring(source, 4) AS INT) % 4"))
    )
    return per_doc, avail


# Schedule-once memo, the BPE-artifact pattern (VERDICT r10 #4): the
# waterfill is computed once per (corpus, budget) and PERSISTED through
# the atomic staging protocol as ``stg_mix_schedule`` — the production
# shape, where the scheduling job ships a tiny table and every consumer
# (apply, packing, audits) reads the artifact instead of recomputing the
# allocation it was supposed to be bound by.
_MIX_ARTIFACTS: dict[tuple[str, float, int], str] = {}


def mix_schedule_warehouse(
    spark: SparkSession, sf_dir: str, budget_pct: int = MIX_BUDGET_PCT
):
    """Compute-once-persist for the mixture schedule: first call runs
    the waterfill and writes it as ``stg_mix_schedule``; later calls
    (apply, the composed pipeline, other sessions pointed at the same
    root) read the stored 20-row table.  Keyed on the corpus
    fingerprint like the BPE memo, so a rewritten corpus reschedules."""
    from ..util import scratch_dir
    from .staging import StagingWarehouse

    key = (sf_dir, _corpus_fingerprint(sf_dir), budget_pct)
    root = _MIX_ARTIFACTS.get(key)
    if root is None:
        root = scratch_dir("spark_graft_mix_")
        wh = StagingWarehouse(spark, root)
        _, avail = _mix_inputs(spark, sf_dir)
        # one corpus scan: the ~20-row per-source aggregate is
        # materialized once; the budget .first() and the waterfill's
        # tot/lam broadcast subplans all reuse it instead of each
        # re-tokenizing the corpus (5 scans -> 1)
        avail = avail.localCheckpoint()
        total = avail.agg(F.sum("avail").cast("long")).first()[0]
        budget = int(total) * budget_pct // 100
        wh.write(mix_waterfill(avail, budget), "mix_schedule", incremental=False)
        _MIX_ARTIFACTS[key] = root
        return wh
    return StagingWarehouse(spark, root)


def corpus_mix_schedule(
    spark: SparkSession, sf_dir: str, budget_pct: int = MIX_BUDGET_PCT
) -> DataFrame:
    """Registry entry: waterfill a token budget (``budget_pct`` of the
    corpus) across sources with deterministic non-uniform weights
    (w = 1 + source_number % 4, so some sources saturate and the
    algorithm's redistribution is REAL under the gate).  One corpus
    scan for the per-source token counts, then the 20-row waterfill."""
    _, avail = _mix_inputs(spark, sf_dir)
    # one corpus scan instead of 5 — see mix_schedule_warehouse
    avail = avail.localCheckpoint()
    total = avail.agg(F.sum("avail").cast("long")).first()[0]
    budget = int(total) * budget_pct // 100
    return mix_waterfill(avail, budget)


QUERIES["corpus_mix_schedule"] = corpus_mix_schedule

ORACLE["corpus_mix_schedule"] = f"""
    WITH av AS MATERIALIZED (
      SELECT source,
             CAST(1 + CAST(substring(source, 4) AS INT) % 4 AS BIGINT) AS w,
             CAST(sum(len({_TOKS})) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ), tot AS MATERIALIZED (
      SELECT CAST(sum(w) AS BIGINT) AS W_tot,
             CAST(sum(avail) AS BIGINT) AS A_tot,
             CAST(sum(avail) AS BIGINT) * {MIX_BUDGET_PCT} // 100 AS B
      FROM av
    ), scan AS MATERIALIZED (
      SELECT source, w, avail,
             avail * 1000000 // w AS r,
             COALESCE(CAST(sum(avail) OVER (ORDER BY avail * 1000000 // w, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS pre_avail,
             COALESCE(CAST(sum(w) OVER (ORDER BY avail * 1000000 // w, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS pre_w
      FROM av
    ), tested AS MATERIALIZED (
      SELECT s.*, t.B,
             CASE WHEN s.pre_avail > t.B THEN CAST(-1 AS BIGINT)
                  ELSE (t.B - s.pre_avail) * 1000000 // (t.W_tot - s.pre_w)
             END AS test
      FROM scan s CROSS JOIN tot t
    ), lam AS MATERIALIZED (
      SELECT test AS lam FROM tested WHERE test < r
      ORDER BY r, source LIMIT 1
    )
    SELECT source, CAST(w AS INTEGER) AS w, avail AS avail_tokens,
           CASE WHEN (SELECT count(*) FROM lam) = 0
                     OR r <= (SELECT lam FROM lam)
                THEN avail ELSE w * greatest((SELECT lam FROM lam), 0) // 1000000
           END AS alloc_tokens,
           ((SELECT count(*) FROM lam) = 0 OR r <= (SELECT lam FROM lam))
             AS saturated,
           CAST((CASE WHEN (SELECT count(*) FROM lam) = 0
                           OR r <= (SELECT lam FROM lam)
                      THEN avail ELSE w * greatest((SELECT lam FROM lam), 0) // 1000000
                 END) * 1000000 // avail AS BIGINT) AS sampling_rate_x1e6,
           B AS budget_tokens
    FROM tested
"""


def _mix_sample_key():
    """Deterministic per-document sampling key in [0, 1e6): md5-60 of
    the SALTED doc id — the ``mix_`` salt keeps this hash role
    independent of every other md5 role in the engine (shard ids,
    split buckets)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long") % 1_000_000


def corpus_mix_apply(
    spark: SparkSession, sf_dir: str, budget_pct: int = MIX_BUDGET_PCT
) -> DataFrame:
    """EXECUTE the mixture schedule — the sampling half that turns
    ``corpus_mix_schedule``'s per-source rates into an actual training
    subset: each document keeps with probability rate via deterministic
    md5 thresholding (md5-60 of the salted doc id mod 1e6 < rate), so
    the selection is reproducible bit-for-bit, independent of every
    other hash role in the engine (the ``mix_`` salt), and requires no
    shuffle — one broadcast of the 20-row schedule against the corpus
    scan.  Output is the per-source reconciliation a pipeline logs:
    scheduled allocation vs achieved docs/tokens (sampling is binomial
    around the rate; the report makes the realized mix observable
    in-band rather than assumed).

    At 100 TB this is the production shape: the schedule is a PERSISTED
    artifact (``mix_schedule_warehouse`` — written once through the
    atomic staging protocol, read here as one broadcast of the stored
    20-row table, never recomputed inline), the corpus scan is one pass
    with a map-side filter, and the selected subset streams straight
    into packing/sharding (``corpus_mix_pipeline``)."""
    per_doc, _ = _mix_inputs(spark, sf_dir)
    sched = mix_schedule_warehouse(spark, sf_dir, budget_pct).read(
        "mix_schedule"
    )
    sel = (
        per_doc.join(
            F.broadcast(sched.select("source", "sampling_rate_x1e6")), "source"
        )
        .filter(_mix_sample_key() < F.col("sampling_rate_x1e6"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs_selected"),
            F.sum("n_tok").cast("long").alias("tokens_selected"),
        )
    )
    return (
        sched.join(sel, "source", "left")
        .select(
            "source",
            "w",
            "avail_tokens",
            "alloc_tokens",
            "sampling_rate_x1e6",
            F.coalesce("n_docs_selected", F.lit(0)).cast("long").alias(
                "n_docs_selected"
            ),
            F.coalesce("tokens_selected", F.lit(0)).cast("long").alias(
                "tokens_selected"
            ),
        )
    )


QUERIES["corpus_mix_apply"] = corpus_mix_apply

_MIX_SCHED_CTE = ORACLE["corpus_mix_schedule"].strip()
ORACLE["corpus_mix_apply"] = f"""
    WITH sched AS MATERIALIZED (
      {_MIX_SCHED_CTE}
    ), perdoc AS MATERIALIZED (
      SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tok,
             ('0x' || substr(md5('mix_' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 AS key
      FROM documents
    ), sel AS MATERIALIZED (
      SELECT p.source,
             CAST(count(*) AS BIGINT) AS n_docs_selected,
             CAST(sum(p.n_tok) AS BIGINT) AS tokens_selected
      FROM perdoc p JOIN sched s ON p.source = s.source
      WHERE p.key < s.sampling_rate_x1e6
      GROUP BY p.source
    )
    SELECT s.source, s.w, s.avail_tokens, s.alloc_tokens,
           s.sampling_rate_x1e6,
           COALESCE(l.n_docs_selected, 0) AS n_docs_selected,
           COALESCE(l.tokens_selected, 0) AS tokens_selected
    FROM sched s LEFT JOIN sel l ON s.source = l.source
"""


def corpus_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture lifecycle END TO END (VERDICT r10 #4): schedule →
    apply → pack.  The waterfill schedule comes from the PERSISTED
    artifact (``mix_schedule_warehouse``), document selection is the
    deterministic salted-md5 threshold against the broadcast stored
    table (map-side filter, no shuffle), and the surviving subset flows
    straight into ``pack_sequences`` — per-language concat-and-chunk
    (seq_id, seq_offset) assignments, the tensors-on-disk layout a
    training job reads.  One corpus scan feeds the whole chain; the
    only shuffle is the packing window's range partition."""
    docs = load(spark, sf_dir, "documents")
    sched = mix_schedule_warehouse(spark, sf_dir).read("mix_schedule")
    sel = docs.join(
        F.broadcast(sched.select("source", "sampling_rate_x1e6")), "source"
    ).filter(_mix_sample_key() < F.col("sampling_rate_x1e6"))
    return pack_sequences(sel.select("doc_id", "lang", "text"))


QUERIES["corpus_mix_pipeline"] = corpus_mix_pipeline

# twin: the schedule CTE (itself the verified corpus_mix_schedule SQL),
# the same salted-md5 selection, then the pack window over the subset
ORACLE["corpus_mix_pipeline"] = f"""
    WITH sched AS MATERIALIZED (
      {_MIX_SCHED_CTE}
    ), sel AS MATERIALIZED (
      SELECT d.doc_id, d.lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents d JOIN sched s ON d.source = s.source
      WHERE ('0x' || substr(md5('mix_' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < s.sampling_rate_x1e6
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS seq_start
      FROM sel
    )
    SELECT doc_id, lang, n_tokens, seq_start,
           seq_start // {SEQ_CAPACITY} AS seq_id,
           seq_start % {SEQ_CAPACITY} AS seq_offset
    FROM packed
"""
