"""Similarity search over embedding columns (BASELINE.json north star).

Two paths:

- **brute-force cosine top-k** — the exact baseline: the (small) query set
  is collected once and broadcast; each corpus partition computes an exact
  int64 block-matmul against it inside an Arrow batch, then a window picks
  top-k per query.  Cost: one pass over the corpus per query batch — the
  right baseline for recall evaluation, and the quantized integer math
  makes every cosine bit-identical to the DuckDB oracle (see
  operators.dedup.QUANT).
- **LSH-bucketed ANN** — random-hyperplane signatures (hyperplanes derived
  from a splitmix-style mix, no RNG state), 16 tables × 6 sign bits;
  candidate generation is an equi-join on (table, bucket) so the quadratic
  term is per-bucket.  The 100 TB path: probes × occupancy ≪ n².

The ANN result is approximate by construction → no SQL oracle (driver does
rows-only); recall vs the exact baseline is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..plans.tables import load
from .dedup import QUANT, dot_expr, quantize_expr

N_QUERIES = 10  # vec_id < 10 are the benchmark query vectors
TOP_K = 5

# 6 sign bits × 16 tables: for a neighbor at cosine ~0.4 (angle ~66°,
# per-plane agreement p = 1-θ/π ≈ 0.63) recall ≈ 1-(1-p^6)^16 ≈ 0.65 while
# each table only has 64 buckets → candidate set ≈ tables × occupancy, far
# below n².  Raise N_PLANES as the corpus grows (occupancy ∝ n/2^planes).
N_TABLES = 16
N_PLANES = 6


def _collect_quantized(emb: DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    pdf = emb.select("vec_id", quantize_expr().alias("q")).toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["q"].map(lambda v: np.asarray(v, dtype=np.int64)))
    return ids, mat, (mat * mat).sum(axis=1)


_SCORED_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    Query set broadcasts; the corpus scan stays partitioned and each Arrow
    batch contributes a block-matmul of scores. Ranking is total
    (cosine desc, vec_id asc) so results are deterministic.
    """
    spark = emb.sparkSession
    q_ids, q_mat, q_norms = _collect_quantized(queries)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norms))

    def score(it):
        ids_q, mat_q, norms_q = bc.value
        sqrt_q = np.sqrt(norms_q.astype(np.float64))
        for pdf in it:
            if len(pdf) == 0:
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["q"].map(lambda v: np.asarray(v, dtype=np.int64)))
            c_norms = (c_mat * c_mat).sum(axis=1)
            dots = c_mat @ mat_q.T  # exact int64
            cos = dots / (np.sqrt(c_norms.astype(np.float64))[:, None] * sqrt_q[None, :])
            ci, qi = np.nonzero(c_ids[:, None] != ids_q[None, :])
            yield pd.DataFrame(
                {"query_id": ids_q[qi], "vec_id": c_ids[ci], "cosine": cos[ci, qi]}
            )

    scored = emb.select("vec_id", quantize_expr().alias("q")).mapInPandas(score, _SCORED_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), k=TOP_K)


# ---------------------------------------------------------------------------
# LSH ANN
# ---------------------------------------------------------------------------


def _hyperplane_matrix(dim: int) -> np.ndarray:
    """(N_TABLES*N_PLANES, dim) deterministic pseudo-random integer planes
    (splitmix64 over (t, p, i) — reproducible with no RNG state)."""
    planes = np.empty((N_TABLES * N_PLANES, dim), dtype=np.int64)
    for t in range(N_TABLES):
        for p in range(N_PLANES):
            for i in range(dim):
                x = (t * 1_000_003 + p * 10_007 + i * 101 + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
                x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
                x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
                x = x ^ (x >> 31)
                planes[t * N_PLANES + p, i] = (x % 2001) - 1000
    return planes


def bucket_ids_udf(dim: int):
    """pandas UDF: quantized vector → N_TABLES bucket ids (sign bits of the
    hyperplane dots, packed per table). One numpy matmul per batch instead
    of 96 interpreted aggregate expressions."""
    from pyspark.sql.pandas.functions import pandas_udf

    planes = _hyperplane_matrix(dim)  # (96, dim) int64
    weights = (1 << np.arange(N_PLANES, dtype=np.int64))[None, :]

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _buckets(qs: pd.Series) -> pd.Series:
        mat = np.stack(qs.map(lambda v: np.asarray(v, dtype=np.int64)))
        signs = (mat @ planes.T) > 0  # (n, 96) — exact int64 dots
        signs = signs.reshape(len(mat), N_TABLES, N_PLANES)
        buckets = (signs * weights[None, :, :]).sum(axis=2).astype(np.int32)
        return pd.Series(list(buckets))

    return _buckets


def ann_lsh_topk(emb: DataFrame, queries: DataFrame, dim: int, k: int = TOP_K) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of the
    N_TABLES hash tables; exact cosine + window top-k over candidates only.

    Scale: the corpus is hashed once (narrow pandas-UDF pass), candidates
    come from an equi-join on (table_id, bucket) — no cross product. Recall
    grows with N_TABLES; cost with bucket occupancy, not corpus size."""
    buckets = bucket_ids_udf(dim)

    def with_buckets(df: DataFrame, id_out: str) -> DataFrame:
        q = df.select(
            F.col("vec_id").alias(id_out), quantize_expr().alias("q")
        ).withColumn("buckets", buckets(F.col("q")))
        return q.select(
            id_out, "q", F.posexplode("buckets").alias("table_id", "bucket")
        )

    c = with_buckets(emb, "vec_id").withColumnRenamed("q", "cq")
    qb = with_buckets(queries, "query_id").withColumnRenamed("q", "qq")
    cand = (
        c.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )

    # exact cosine on the candidate set (same integer kernel as dedup)
    cos = dot_expr(F.col("qq"), F.col("cq")) / (
        F.sqrt(dot_expr(F.col("qq"), F.col("qq")).cast("double"))
        * F.sqrt(dot_expr(F.col("cq"), F.col("cq")).cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return ann_lsh_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), dim, k=TOP_K)


QUERIES = {
    "sim_cosine_topk": sim_cosine_topk,
    "sim_ann_lsh_topk": sim_ann_lsh_topk,
}

ORACLE = {
    "sim_cosine_topk": f"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS qv
          FROM embeddings
        ), n AS (
          SELECT vec_id, qv, list_dot_product(qv, qv) AS norm2 FROM q
        ), scored AS (
          SELECT que.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(que.qv, c.qv) / (sqrt(que.norm2) * sqrt(c.norm2)) AS cosine
          FROM n que JOIN n c ON c.vec_id <> que.vec_id
          WHERE que.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= {TOP_K}
    """,
    # sim_ann_lsh_topk: approximate → rows-only driver check; recall vs
    # brute force asserted in unit tests.
}


# ---------------------------------------------------------------------------
# IVF ANN (inverted-file index over coarse clusters)
# ---------------------------------------------------------------------------

N_PROBE = 4


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
    dim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: the corpus is inverted-listed by its coarse
    cluster id (the ``label`` column — in production the assignment step is
    a k-means fit); each query probes only its ``nprobe`` nearest
    centroids' lists.

    On this near-random test corpus the labels are weak clusters, so
    recall needs nprobe≈4 of 10 lists (real embedding spaces cluster far
    tighter and probe 1-5% of lists).

    Scale shape: centroids are tiny (k_clusters × dim, driver+broadcast);
    the probe decision is numpy on the query batch; candidate retrieval is
    a broadcast equi-join on ``label`` — the corpus is scanned once and
    only probed lists leave the scan (predicate `label IN (...)` pushes
    down). Search cost ∝ corpus/k_clusters × nprobe instead of corpus."""
    spark = emb.sparkSession
    if dim is None:
        dim = len(emb.select("embedding").first()[0])

    # centroids: mean of quantized vectors per label — exact int sums, then
    # one double division (deterministic; tiny table collected to driver)
    q_all = emb.select("vec_id", "label", quantize_expr().alias("q"))
    cent_pdf = (
        q_all.groupBy("label")
        .agg(
            F.array(*[F.sum(F.element_at("q", i + 1)) for i in range(dim)]).alias("sums"),
            F.count("*").alias("n"),
        )
        .toPandas()
    )
    labels = cent_pdf["label"].to_numpy()
    cents = np.stack(
        cent_pdf["sums"].map(lambda v: np.asarray(v, dtype=np.float64))
    ) / cent_pdf["n"].to_numpy(dtype=np.float64)[:, None]

    # probe assignment: nearest nprobe centroids per query (cosine, numpy)
    q_ids, q_mat, q_norms = _collect_quantized(queries)
    cent_norm = np.sqrt((cents * cents).sum(axis=1))
    cos_qc = (q_mat.astype(np.float64) @ cents.T) / (
        np.sqrt(q_norms.astype(np.float64))[:, None] * cent_norm[None, :]
    )
    order = np.argsort(-cos_qc, axis=1)[:, :nprobe]
    probe_rows = [
        (int(q_ids[i]), int(labels[j])) for i in range(len(q_ids)) for j in order[i]
    ]
    probes = spark.createDataFrame(probe_rows, "query_id long, label int")

    # candidates: corpus rows in a probed list of the query
    cand = q_all.join(F.broadcast(probes), "label").filter(
        F.col("vec_id") != F.col("query_id")
    )

    # exact cosine over candidates with the broadcast query matrix
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norms))

    def score(it):
        ids_q, mat_q, norms_q = bc.value
        sqrt_q = np.sqrt(norms_q.astype(np.float64))
        pos = {int(v): i for i, v in enumerate(ids_q)}
        for pdf in it:
            if len(pdf) == 0:
                continue
            c_mat = np.stack(pdf["q"].map(lambda v: np.asarray(v, dtype=np.int64)))
            c_norms = (c_mat * c_mat).sum(axis=1)
            qi = pdf["query_id"].map(pos).to_numpy()
            dots = np.einsum("ij,ij->i", c_mat, mat_q[qi])
            cos = dots / (np.sqrt(c_norms.astype(np.float64)) * sqrt_q[qi])
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"], "cosine": cos}
            )

    scored = cand.select("query_id", "vec_id", "q").mapInPandas(score, _SCORED_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), k=TOP_K)


QUERIES["sim_ivf_topk"] = sim_ivf_topk
# approximate → rows-only; recall vs brute force asserted in tests
