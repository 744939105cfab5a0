"""Similarity search over embedding columns (BASELINE.json north star).

Two paths:

- **brute-force cosine top-k** — the exact baseline: query set × corpus
  cross join, integer-quantized dot products (bit-deterministic across
  engines — see operators.dedup.QUANT), window top-k per query.  At scale
  the corpus side stays partitioned and the (small) query set broadcasts:
  cost is one pass over the corpus per query batch, the right baseline for
  recall evaluation.
- **LSH-bucketed ANN** — random-hyperplane signatures (hyperplanes derived
  from xxhash64, no RNG state), multi-probe via per-table sub-signatures;
  candidate generation is an equi-join on (table, signature) so the
  quadratic term is per-bucket.  The 100 TB path: probes × buckets ≪ n².

The ANN result is approximate by construction → no SQL oracle (driver does
rows-only); the brute-force path is oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.tables import load
from .dedup import QUANT, cosine_expr, dot_expr, quantize_expr

N_QUERIES = 10  # vec_id < 10 are the benchmark query vectors
TOP_K = 5


def _quantized(emb: DataFrame) -> DataFrame:
    # cache = optimizer barrier + reuse: downstream the LSH path references
    # `q` 96 times (8 tables × 12 hyperplane dots); without the barrier each
    # reference inlines the whole quantize transform (see
    # operators.dedup.minhash_signature for the same pathology)
    return (
        emb.select("vec_id", quantize_expr().alias("q"))
        .withColumn("norm2", dot_expr(F.col("q"), F.col("q")))
        .cache()
    )


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    queries is small → broadcast; corpus scan stays partitioned. Ranking is
    total (cosine desc, vec_id asc) so results are deterministic.
    """
    corpus = _quantized(emb)
    qs = _quantized(queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("norm2").alias("qnorm2")
    )
    cos = cosine_expr(F.col("qq"), F.col("q"), F.col("qnorm2"), F.col("norm2"))
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
    )
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

# 6 sign bits × 16 tables: for a neighbor at cosine ~0.4 (angle ~66°,
# per-plane agreement p = 1-θ/π ≈ 0.63) recall ≈ 1-(1-p^6)^16 ≈ 0.65 while
# each table only has 64 buckets → candidate set ≈ tables × occupancy, far
# below n².  Raise N_PLANES as the corpus grows (occupancy ∝ n/2^planes).
N_TABLES = 16
N_PLANES = 6


def _hyperplane(table: int, plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane: splitmix64 over (t, p, i),
    mapped to a small signed integer per dimension. Integer components keep
    the sign-dot exact."""
    out = []
    for i in range(dim):
        x = (table * 1_000_003 + plane * 10_007 + i * 101 + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x = x ^ (x >> 31)
        out.append((x % 2001) - 1000)
    return out


def signature_expr(q: Column, table: int, dim: int) -> Column:
    """12-bit bucket id: sign bits of integer dots with 12 hyperplanes."""
    sig = F.lit(0)
    for p in range(N_PLANES):
        plane = _hyperplane(table, p, dim)
        d = F.aggregate(
            F.zip_with(q, F.array(*[F.lit(c) for c in plane]), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def ann_lsh_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = TOP_K
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of the
    N_TABLES hash tables; exact cosine + window top-k over candidates only.

    Scale: corpus is hashed once per table (narrow), the join is an
    equi-join on (table_id, bucket) — no cross product. Recall grows with
    N_TABLES; cost with bucket occupancy, not corpus size."""
    corpus = _quantized(emb)
    qs = _quantized(queries)

    def with_buckets(df: DataFrame, id_out: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    signature_expr(F.col("q"), t, dim).alias("bucket"),
                )
                for t in range(N_TABLES)
            ]
        )
        return df.select(
            F.col("vec_id").alias(id_out), "q", "norm2", F.explode(buckets).alias("b")
        ).select(id_out, "q", "norm2", "b.table_id", "b.bucket")

    c = with_buckets(corpus, "vec_id").withColumnRenamed("q", "cq").withColumnRenamed(
        "norm2", "cnorm2"
    )
    qb = with_buckets(qs, "query_id").withColumnRenamed("q", "qq").withColumnRenamed(
        "norm2", "qnorm2"
    )
    cand = (
        c.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cq", "cnorm2", "qq", "qnorm2")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cos = cosine_expr(F.col("qq"), F.col("cq"), F.col("qnorm2"), F.col("cnorm2"))
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
    # sim_ann_lsh_topk: approximate + xxhash-free-but-custom hyperplanes →
    # rows-only driver check; recall vs brute force asserted in unit tests.
}
