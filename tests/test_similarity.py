"""Similarity search: exact brute-force top-k properties + ANN recall
against the exact baseline on the real embeddings fixture."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)


def test_cosine_topk_known_vectors(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1]),
        Row(vec_id=2, embedding=[0.5, 0.5]),
        Row(vec_id=3, embedding=[0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows)
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]  # by decreasing cosine to [1, 0]
    assert all(r["query_id"] == 0 for r in out)


def test_cosine_topk_excludes_self_and_ranks_densely(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        cs = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)


def test_ann_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_lsh_topk(emb, queries, dim=64, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # deterministic hyperplanes → recall is a fixed number for this fixture;
    # assert a conservative floor (bucketed ANN trades recall for scale)
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"
    for r in approx:
        assert r["neighbor_id"] != r["query_id"]


def test_ivf_recall_vs_exact(spark, sf_dir):
    from priority_data_pipeline_postgres_db_spark.operators.similarity import ivf_topk

    # drop the fixture's label column: ivf_topk must fit its own coarse
    # quantizer (sampled spherical k-means) and run on ANY embeddings table
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").drop("label")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries, k=5).collect()}
    approx_rows = ivf_topk(emb, queries, k=5, nprobe=4).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    # fitted k-means clusters → probing 4 of 10 lists catches a fair share
    # of true neighbors; deterministic fit for this fixture
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    for r in approx_rows:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 5


def test_semantic_pairs_subset_of_bruteforce(spark, sf_dir):
    """Every semantic pair passes the exact cosine verify, so the pair set
    must be a subset of the brute-force near-dup pairs at the same
    threshold — and non-empty on the fixture (recall sanity)."""
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        SEM_THRESHOLD,
        semantic_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    sem = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs(emb, dim).collect()
    }
    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=SEM_THRESHOLD).collect()
    }
    assert sem, "no semantic pairs found on the fixture"
    assert sem <= exact
    # SRP recall on this fixture is deterministic; keep a floor so plane
    # changes that silently destroy recall fail loudly
    assert len(sem) >= 0.5 * len(exact)


def test_dedup_semantic_planted_duplicates(spark):
    """Two near-identical vectors end in one component with exactly one
    survivor; an orthogonal vector stays a singleton."""
    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        connected_components,
    )
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        semantic_pairs,
    )

    dim = 8
    a = [1.0] + [0.0] * (dim - 1)
    a2 = [0.999] + [0.01] * (dim - 1)
    b = [0.0] * (dim - 1) + [1.0]
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=a), Row(vec_id=1, embedding=a2), Row(vec_id=2, embedding=b)]
    )
    pairs = semantic_pairs(emb, dim, threshold=0.9)
    comp = connected_components(
        emb.select("vec_id"), pairs,
        node_col="vec_id", src_col="vec_id_a", dst_col="vec_id_b",
    )
    got = {r["vec_id"]: r["component"] for r in comp.collect()}
    assert got[0] == got[1] == 0
    assert got[2] == 2


def test_incremental_semantic_pairs_identity(spark, sf_dir):
    """Incremental embedding near-dup = the full verified pair set minus
    old×old — exactly, because bucket caps are judged over the union
    (the same identity dedup_minhash_incremental pins)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        incremental_semantic_pairs,
        semantic_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    full = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs(emb, dim).collect()
    }
    old = emb.filter(F.col("vec_id") % 10 < 8)
    new = emb.filter(F.col("vec_id") % 10 >= 8)
    inc = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in incremental_semantic_pairs(old, new, dim).collect()
    }
    expected = {p for p in full if not (p[0] % 10 < 8 and p[1] % 10 < 8)}
    assert inc == expected
    assert inc  # fixture actually produces new-batch pairs

@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_ivf_registry_entry_carries_recall_floor(spark, sf):
    """The registry's sim_ivf_topk emits recall@5 vs the exact top-5 as an
    in-band column (the gate-adjacent evidence for a rows-only entry).
    The IVF fit is deterministic, so recall is a fixed number per fixture:
    with spill assignment (r8 — each vector files into its 2 nearest
    lists) AND nprobe at the measured knee of 5 (r9, VERDICT r8 #3 —
    adaptive probing measured and rejected, see the N_PROBE comment),
    measured avg 0.96/min 0.8 at sf0.1 and avg ≥0.92/min ≥0.8 at
    sf0.01 — floors below assert with margin against plane/fit
    regressions."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import sim_ivf_topk

    df = sim_ivf_topk(spark, sf)
    per_q = df.groupBy("query_id").agg(F.first("recall_at_5").alias("r"))
    rows = per_q.collect()
    assert len(rows) == 10
    avg = sum(r["r"] for r in rows) / len(rows)
    assert avg >= 0.85, f"IVF avg recall@5 collapsed: {avg}"
    assert min(r["r"] for r in rows) >= 0.7


def test_knn_join_covers_corpus_and_agrees_with_exact(spark, sf_dir):
    """The ANN kNN join profiles the whole corpus: near-full coverage on
    the fixture, ranks total-ordered per vector, and for the benchmark
    query vectors its neighbor sets overlap the exact brute-force top-k
    (same floor discipline as the query-set ANN)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        ann_knn_join,
        cosine_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    out = ann_knn_join(emb, dim, k=5).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(r)
    n = emb.count()
    assert len(by_vec) >= 0.95 * n  # near-full coverage (capped buckets)
    for rows in list(by_vec.values())[:50]:
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        cs = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r["vec_id"], r["neighbor_id"]) for r in out if r["vec_id"] < 5}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"kNN-join recall collapsed: {recall}"


def test_knn_join_full_coverage_residue_pass(spark, sf_dir):
    """full_coverage=True (VERDICT r4 #4) hands isolated vectors their
    exact top-k.  max_bucket=1 makes EVERY vector isolated (any bucket
    with a co-occupant is pruned by the cap), so the residue pass must
    produce the exact kNN join for the whole corpus."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        ann_knn_join,
        cosine_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 40
    )
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()

    # every vector isolated → approx path empty, residue covers all
    out = ann_knn_join(emb, dim, k=3, max_bucket=1, full_coverage=True).collect()
    assert {r["vec_id"] for r in out} == {r["vec_id"] for r in emb.collect()}
    got = {(r["vec_id"], r["neighbor_id"], r["rank"]) for r in out}
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk(emb, emb, k=3).collect()
    }
    assert got == exact
    assert len(out) == 3 * n  # every vector receives exactly k rows

    # default approximate path is unchanged by the flag's existence
    approx = ann_knn_join(emb, dim, k=3).collect()
    full = ann_knn_join(emb, dim, k=3, full_coverage=True).collect()
    assert {(r["vec_id"], r["neighbor_id"]) for r in approx} <= {
        (r["vec_id"], r["neighbor_id"]) for r in full
    }
    assert {r["vec_id"] for r in full} == {r["vec_id"] for r in emb.collect()}


def test_knn_join_residue_guard_refuses_oversized(spark, sf_dir):
    """A residue larger than max_residue must refuse, pointing at the SRP
    config — brute force is not the fix for a mistuned gate."""
    import pytest

    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        QuadraticScaleError,
    )
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        ann_knn_join,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 40
    )
    dim = len(emb.select("embedding").first()[0])
    with pytest.raises(QuadraticScaleError):
        ann_knn_join(
            emb, dim, k=3, max_bucket=1, full_coverage=True, max_residue=10
        )


def test_diversity_sample_covers_all_vectors_once(spark, sf_dir):
    """Every vector belongs to exactly one region of the sampled table;
    representatives are the min member id; dense regions emit one row."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        _srp_bucketed,
        sim_diversity_sample,
    )

    rows = sim_diversity_sample(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vecs = emb.count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert len({r["bucket"] for r in rows}) == len(rows)
    dim = len(emb.select("embedding").first()[0])
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        n_planes_for,
    )

    members = (
        _srp_bucketed(emb, dim, n_planes_for(n_vecs))
        .filter(F.col("table_id") == 0)
        .groupBy("bucket")
        .agg(F.min("vec_id").alias("lo"))
        .collect()
    )
    lo = {r["bucket"]: r["lo"] for r in members}
    for r in rows:
        assert r["rep_vec_id"] == lo[r["bucket"]]


def test_embedding_health_accounts_for_corpus(spark, sf_dir):
    """Mass conservation + norm sanity: every vector counted once per its
    label; bounds order correctly; a planted zero vector is flagged."""
    from pyspark.sql import Row, functions as F

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        embedding_health,
        sim_embedding_health,
    )

    rows = sim_embedding_health(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert 0 <= r["min_norm2"] <= r["max_norm2"]
        assert r["n_zero_vecs"] == 0  # fixture has no degenerate vectors
        assert r["avg_norm"] > 0

    planted = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 0.0], label=7),
         Row(vec_id=2, embedding=[3.0, 4.0], label=7)]
    )
    got = embedding_health(planted).collect()[0]
    assert got["n_zero_vecs"] == 1 and got["n_vecs"] == 2
    assert got["min_norm2"] == 0
    assert abs(got["avg_norm"] - 2.5) < 1e-9  # (0 + 5)/2


def test_srp_recall_report_ground_truth(spark, sf_dir):
    """Measured recall is consistent: srp pairs are a subset of exact
    ground truth, sample size matches the hash predicate, and the floor
    holds at gate scale."""
    import hashlib

    from priority_data_pipeline_postgres_db_spark.operators.dedup import _auto_mod
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        sim_srp_recall_report,
    )

    row = sim_srp_recall_report(spark, sf_dir).collect()[0]
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    mod = _auto_mod(len(emb))
    n_sample = sum(
        1
        for r in emb
        if int(hashlib.md5(str(r["vec_id"]).encode()).hexdigest()[:15], 16) % mod
        == 0
    )
    assert row["n_sample_vecs"] == n_sample
    assert 0 <= row["n_srp_found"] <= row["n_exact_pairs"]
    # VERDICT r4 #3 floor: the 24×5 SRP config measures 0.91 at sf0.1 and
    # 0.87 at sf0.01 — pin ≥0.8 so a plane regression fails loudly
    assert 0.8 <= row["recall"] <= 1.0


def test_srp_recall_stable_across_mods(spark, sf_dir):
    """The recall estimate is a ratio — two different sample mods must
    land on comparable values (the auto-mod contract, VERDICT r4 #5)."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        srp_recall_report,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    r2 = srp_recall_report(emb, dim, mod=2).collect()[0]["recall"]
    r3 = srp_recall_report(emb, dim, mod=3).collect()[0]["recall"]
    assert abs(r2 - r3) < 0.2, f"recall unstable across mods: {r2} vs {r3}"


def test_ivf_persisted_matches_in_memory(spark, sf_dir, tmp_path):
    """The persisted index answers identically to the in-memory path
    (same centroids, assignment, scoring), and the partition filter lands
    on the hive label column (pruned file listing)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        N_QUERIES,
        build_ivf_index,
        ivf_topk,
        ivf_topk_persisted,
    )
    from priority_data_pipeline_postgres_db_spark.operators.staging import (
        StagingWarehouse,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    wh = StagingWarehouse(spark, str(tmp_path))
    build_ivf_index(emb, wh)
    persisted = ivf_topk_persisted(wh, queries, k=5)
    fresh = ivf_topk(emb, queries, k=5)
    p = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in persisted.collect()}
    f = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in fresh.collect()}
    assert p == f and len(p) > 0
    plan = persisted._jdf.queryExecution().executedPlan().toString()
    assert "label" in plan  # probe filter reaches the partitioned scan


def test_zero_norm_vectors_excluded_everywhere(spark):
    """A planted all-zero embedding must vanish from every similarity
    surface — as query and as neighbor — instead of NaN-poisoning ranks
    (Spark sorts NaN FIRST under desc) or batch-local thresholds; the
    oracles filter norm2 > 0 to match (review r5)."""
    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        ann_knn_join,
        ann_lsh_topk,
        cosine_topk,
    )

    dim = 8
    rows = [
        Row(vec_id=0, embedding=[1.0] + [0.0] * (dim - 1)),
        Row(vec_id=1, embedding=[0.9, 0.1] + [0.0] * (dim - 2)),
        Row(vec_id=2, embedding=[0.0] * (dim - 1) + [1.0]),
        Row(vec_id=3, embedding=[0.0] * dim),  # zero-norm plant
    ]
    emb = spark.createDataFrame(rows)

    exact = cosine_topk(emb, emb, k=3).collect()
    assert all(r["neighbor_id"] != 3 for r in exact)
    assert all(r["query_id"] != 3 for r in exact)
    assert {r["query_id"] for r in exact} == {0, 1, 2}

    lsh = ann_lsh_topk(emb, emb, dim, k=3).collect()
    assert all(r["neighbor_id"] != 3 and not (r["cosine"] != r["cosine"]) for r in lsh)

    knn = ann_knn_join(emb, dim, k=3, full_coverage=True).collect()
    assert all(r["neighbor_id"] != 3 for r in knn)


def test_source_centroid_similarity_planted_geometry(spark, tmp_path):
    """Labels with identical mean direction hit cosine 1.0; orthogonal
    centroids hit 0.0 - computed without ever materializing a float
    centroid (integer-sum scale invariance)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        sim_source_centroid_similarity,
    )

    rows = []
    vid = 0
    # label 0 and 1: same direction e0 (different magnitudes/counts)
    for scale, lab in ((1.0, 0), (0.5, 1)):
        for _ in range(3 + lab):
            rows.append((vid, [scale, 0.0, 0.0, 0.0], lab))
            vid += 1
    # label 2: orthogonal direction e1
    for _ in range(5):
        rows.append((vid, [0.0, 2.0, 0.0, 0.0], 2))
        vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(f"{tmp_path}/embeddings.parquet")
    got = {
        (r["label_a"], r["label_b"]): r
        for r in sim_source_centroid_similarity(spark, str(tmp_path)).collect()
    }
    assert got[(0, 1)]["cosine"] == 1.0
    assert got[(0, 2)]["cosine"] == 0.0
    assert got[(1, 2)]["cosine"] == 0.0
    assert got[(0, 1)]["n_a"] == 3 and got[(0, 1)]["n_b"] == 4


def test_source_centroid_similarity_full_matrix(spark, sf_dir):
    """All label pairs present exactly once (a<b), cosines bounded."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        sim_source_centroid_similarity,
    )

    rows = sim_source_centroid_similarity(spark, sf_dir).collect()
    labs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "label"
    ).distinct().count()
    assert len(rows) == labs * (labs - 1) // 2
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)
    assert all(r["label_a"] < r["label_b"] for r in rows)


def test_adaptive_plane_count_formula_and_sql_parity():
    """n_planes_for holds expected occupancy at/under TARGET_OCCUPANCY
    with the minimum plane count, clamps to [1, 30], and the oracle's
    pure-integer SQL twin agrees at every corpus size."""
    import duckdb

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        TARGET_OCCUPANCY,
        n_planes_for,
    )

    assert n_planes_for(500) == 2       # sf0.01
    assert n_planes_for(5000) == 5      # sf0.1 — keeps r5 recall numbers valid
    assert n_planes_for(50000) == 9     # 10x — where fixed 5 planes capped out
    assert n_planes_for(1) == 1         # clamp floor
    assert n_planes_for(10**12) == 30   # clamp ceiling (int32 bucket packing)
    for n in (1, 159, 160, 161, 500, 5000, 50000, 12345, 10**7):
        p = n_planes_for(n)
        # minimality: occupancy fits at p, not at p-1 (unless clamped)
        assert (n + TARGET_OCCUPANCY - 1) // TARGET_OCCUPANCY <= 1 << p
        if p > 1:
            assert (n + TARGET_OCCUPANCY - 1) // TARGET_OCCUPANCY > 1 << (p - 1)
        got = duckdb.sql(
            f"""SELECT LEAST(GREATEST(CAST((SELECT count(*) FROM range(0, 62) r(i)
                 WHERE (CAST(1 AS BIGINT) << CAST(r.i AS INTEGER))
                       < ({n} + {TARGET_OCCUPANCY - 1}) // {TARGET_OCCUPANCY})
               AS INTEGER), 1), 30)"""
        ).fetchone()[0]
        assert got == p, (n, p, got)


def test_semantic_pairs_survive_dense_corpus(spark, sf_dir):
    """The r6 stress catch: on a corpus dense with near-copies (every
    vector replicated 4x with a tiny perturbation) the adaptive plane
    count keeps bucket occupancy under the cap, so the pair pipeline
    still finds the replicas — a fixed plane count tuned to the base
    corpus capped out and returned ZERO pairs here."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        semantic_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    reps = spark.range(4).withColumnRenamed("id", "rep")
    dense = (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * (n * 10))
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: x + F.col("rep").cast("float") * 0.001),
        )
        .drop("rep")
    )
    dim = len(emb.select("embedding").first()[0])
    pairs = semantic_pairs(dense, dim).count()
    assert pairs > 0


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_cell_recall_report_floors(spark, sf):
    """The IVF-cell pair path's in-band instrument (r8): overall recall
    at gate scale must stay high (0.942 measured at sf0.1 — cells are
    coarse there), and the tight-pair recall column must be present
    (its stress-scale floor lives in test_stress_floor against the
    committed STRESS artifacts, where tight pairs actually exist)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        sim_cell_recall_report,
    )

    row = sim_cell_recall_report(spark, sf).first()
    assert row["n_exact_pairs"] >= 0 and row["n_cell_found"] <= row["n_exact_pairs"]
    assert row["recall"] >= 0.85, row.asDict()
    assert 0.0 <= row["recall_tight"] <= 1.0


# ---------------------------------------------------------------------------
# Sharded semantic dedup (r9: the past-envelope scale-out)
# ---------------------------------------------------------------------------


def test_sharded_one_shard_is_identity(spark, sf_dir):
    """S=1 sharding must be EXACTLY semantic_pairs: the fold becomes
    bucket·1 + 0 and every pair is same-shard — any divergence means the
    fold or cap semantics drifted from the unsharded pipeline."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        semantic_pairs,
        semantic_pairs_sharded,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    def pset(df):
        return {(r["vec_id_a"], r["vec_id_b"], r["cosine"]) for r in df.collect()}

    base = pset(semantic_pairs(emb, dim))
    sharded = pset(semantic_pairs_sharded(emb, dim, n_shards=1))
    assert base == sharded
    assert base


def test_sharded_equals_union_of_per_shard_runs(spark, sf_dir):
    """The definitional property: the one-plan sharded pipeline must
    equal the union of an independent semantic_pairs run over each
    shard's subset (same plane count).  This pins that the folded bucket
    key really partitions candidate generation, capping, and probing
    per shard — the claim the 100 TB design rests on."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        n_planes_for,
        semantic_pairs,
        semantic_pairs_sharded,
        shard_expr,
    )

    S = 3
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    planes = n_planes_for(-(-n // S))
    def pset(df):
        return {(r["vec_id_a"], r["vec_id_b"], r["cosine"]) for r in df.collect()}

    sharded = pset(semantic_pairs_sharded(emb, dim, n_shards=S, n_planes=planes))
    per_shard = set()
    for s in range(S):
        sub = emb.filter(shard_expr(S) == s)
        per_shard |= pset(semantic_pairs(sub, dim, n_planes=planes))
    assert sharded == per_shard
    assert sharded


def test_sharded_pairs_are_same_shard_only(spark, sf_dir):
    """Every emitted pair's members share a shard (the structural
    contract the miss-rate accounting depends on)."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        GATE_SHARDS,
        semantic_pairs_sharded,
        shard_expr,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    pairs = semantic_pairs_sharded(emb, dim, n_shards=GATE_SHARDS)
    cross = pairs.filter(
        shard_expr(GATE_SHARDS, "vec_id_a")
        != shard_expr(GATE_SHARDS, "vec_id_b")
    )
    assert cross.count() == 0


def test_cascade_flags_and_leg_consistency(spark, sf_dir):
    """Cascade rows: every shard_pass pair appears in the sharded leg's
    own output; every tight_pass row carries cosine ≥ the tight bar;
    every row has at least one flag set."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        CELL_TIGHT_COSINE,
        GATE_SHARDS,
        semantic_pairs_cascade,
        semantic_pairs_sharded,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    casc = semantic_pairs_cascade(emb, dim, n_shards=GATE_SHARDS).cache()
    assert casc.filter(~F.col("tight_pass") & ~F.col("shard_pass")).count() == 0
    assert (
        casc.filter(
            F.col("tight_pass") & (F.col("cosine") < CELL_TIGHT_COSINE)
        ).count()
        == 0
    )
    shard_leg = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs_sharded(emb, dim, n_shards=GATE_SHARDS)
        .select("vec_id_a", "vec_id_b").collect()
    }
    flagged = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in casc.filter(F.col("shard_pass"))
        .select("vec_id_a", "vec_id_b").collect()
    }
    assert flagged == shard_leg
    casc.unpersist()


def test_sharded_recall_report_floors(spark, gate_dir):
    """Gate-scale floors for the in-band instrument (sf0.01, GATE_SHARDS):
    within-shard recall must hold the in-envelope ≥0.8 floor, tight
    recall the cascade's ≥0.8 acceptance, and the measured cross-shard
    miss can never exceed the structural (S-1)/S bound (cells can only
    claw pairs BACK from it).  The probabilistic amplification-gain
    assertion keeps the n_cross_missed==0 escape hatch as its primary
    slack on small samples (ADVICE r9)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        GATE_SHARDS,
        sim_sharded_recall_report,
    )

    row = sim_sharded_recall_report(spark, gate_dir).first().asDict()
    assert row["n_exact_pairs"] > 0, "degenerate sample: no ground truth"
    assert row["n_same_shard"] > 0, "degenerate sharding: no same-shard pairs"
    assert row["recall_within_shard"] >= 0.8, row
    assert row["recall_tight"] >= 0.8, row
    structural = (GATE_SHARDS - 1) / GATE_SHARDS
    assert row["cross_shard_miss_rate"] <= structural + 1e-9, row
    # OR-amplification can only add coverage, and at R rounds the
    # expected co-shard mass is 1-(1-1/S)^R — require at least half of
    # the additional expected mass to materialize (sampling slack)
    assert row["recall_overall_resharded"] >= row["recall_overall"], row
    r_rounds = row["reshard_rounds"]
    expect = 1 - (structural ** r_rounds)
    single = 1 / GATE_SHARDS
    gain_floor = (expect - single) * 0.5 * row["recall_within_shard"]
    assert (
        row["recall_overall_resharded"] >= row["recall_overall"] + gain_floor
        or row["n_cross_missed"] == 0
    ), row


def test_resharded_union_identity_and_monotonicity(spark, sf_dir):
    """OR-amplified sharding invariants: rounds=1 IS the canonical
    sharded pass (same salt), more rounds only ADD pairs, and every
    added pair still clears the verify threshold (it comes from the
    same verified pipeline under a different assignment)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        GATE_SHARDS,
        semantic_pairs_resharded,
        semantic_pairs_sharded,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    one = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs_sharded(emb, dim, n_shards=GATE_SHARDS).collect()
    }
    r1 = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs_resharded(
            emb, dim, rounds=1, n_shards=GATE_SHARDS
        ).collect()
    }
    r2 = semantic_pairs_resharded(emb, dim, rounds=2, n_shards=GATE_SHARDS).collect()
    r2_keys = {(r["vec_id_a"], r["vec_id_b"]) for r in r2}
    assert r1 == one  # round 0 is the canonical assignment
    assert r2_keys >= one  # amplification only adds
    assert len(r2_keys) == len(r2)  # union deduped exactly


def test_planner_laws_and_artifact_pin():
    """plan_semantic_dedup codifies the measured sharding laws (VERDICT
    r9 #1): S = ceil(n/shard_target), planes from the per-shard size, R
    the minimal OR-amplification rounds reaching the target under
    1-(1-1/S)^R x within-shard recall.  Predictions are pinned within
    ±0.05 against the STRESS_x100_r9 measurements that calibrated them
    (within-shard 0.871, resharded-overall 0.384 at 200k/S=4/R=2)."""
    import json
    import os

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        MAX_PLANNED_ROUNDS,
        SHARD_TARGET,
        plan_semantic_dedup,
        predicted_resharded_recall,
    )

    # law shape: S, planes, monotone R in the target
    p = plan_semantic_dedup(200_000, 0.38)
    assert (p.n_shards, p.n_planes, p.reshard_rounds) == (4, 9, 2)
    assert p.achievable and p.cost_multiple == 2.0
    lo = plan_semantic_dedup(200_000, 0.2)
    hi = plan_semantic_dedup(200_000, 0.6)
    assert lo.reshard_rounds < p.reshard_rounds < hi.reshard_rounds

    # single shard: no amplification needed, R=1
    one = plan_semantic_dedup(50_000, 0.8)
    assert one.n_shards == 1 and one.reshard_rounds == 1

    # tight regime: corpus-wide cell path, one pass at ANY size
    t = plan_semantic_dedup(10**9, 0.9, threshold=0.92)
    assert t.regime == "tight" and t.cost_multiple == 1.0 and t.achievable

    # unreachable targets are flagged, not silently under-planned; with
    # S>1 the prediction strictly increases in R, so the best reachable
    # configuration IS max_rounds
    u = plan_semantic_dedup(1_000_000, 0.99)
    assert not u.achievable and u.reshard_rounds == MAX_PLANNED_ROUNDS
    assert u.predicted_overall < 0.99

    # unreachable at S=1: recall is R-independent (every salted
    # assignment is the same single shard), so the plan must clamp to
    # R=1 instead of burning max_rounds identical passes (ADVICE r10)
    u1 = plan_semantic_dedup(50_000, 0.99)
    assert u1.n_shards == 1 and not u1.achievable
    assert u1.reshard_rounds == 1
    assert u1.predicted_overall == predicted_resharded_recall(1, 1)

    # production default shard sizing
    assert plan_semantic_dedup(500_000, 0.3).n_shards == -(
        -500_000 // SHARD_TARGET
    )

    # artifact pin: the calibration measurements themselves
    art = "/root/repo/STRESS_x100_r9.json"
    if os.path.isfile(art):
        row = json.load(open(art))["results"]["sharded_recall"]["100x"]
        assert abs(p.predicted_within_shard - row["recall_within_shard"]) <= 0.05
        assert row["reshard_rounds"] == 2
        pred = predicted_resharded_recall(row["n_shards"], 2)
        assert abs(pred - row["recall_overall_resharded"]) <= 0.05


def test_planner_drives_resharded_execution(spark, sf_dir):
    """The plan object is the execution config: a planner-sized
    resharded run equals the same run with the plan's fields passed
    explicitly, and R=3 is a superset of the R=2 rounds (round salts
    are shared prefixes of the same sequence)."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        GATE_PLAN_SHARD_TARGET,
        GATE_PLAN_TARGET_RECALL,
        plan_semantic_dedup,
        semantic_pairs_resharded,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    plan = plan_semantic_dedup(
        n, GATE_PLAN_TARGET_RECALL, shard_target=GATE_PLAN_SHARD_TARGET
    )
    assert plan.n_shards == 4 and plan.reshard_rounds == 3

    via_plan = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs_resharded(emb, dim, plan=plan)
        .select("vec_id_a", "vec_id_b")
        .collect()
    }
    explicit = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs_resharded(
            emb,
            dim,
            rounds=plan.reshard_rounds,
            threshold=plan.threshold,
            n_shards=plan.n_shards,
            n_planes=plan.n_planes,
        )
        .select("vec_id_a", "vec_id_b")
        .collect()
    }
    assert via_plan == explicit and via_plan
    two = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs_resharded(
            emb, dim, rounds=2, n_shards=plan.n_shards,
            n_planes=plan.n_planes,
        )
        .select("vec_id_a", "vec_id_b")
        .collect()
    }
    assert two <= via_plan


def test_planner_handoff_cascade_and_report(spark, sf_dir):
    """The plan object drives all three consumers: cascade and the
    recall report pick up (threshold, S, R) from it — the report row
    must echo the plan's S and R."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        plan_semantic_dedup,
        semantic_pairs_cascade,
        sharded_recall_report,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    plan = plan_semantic_dedup(emb.count(), 0.5, shard_target=125)
    row = sharded_recall_report(emb, dim, plan=plan).first()
    assert row["n_shards"] == plan.n_shards
    assert row["reshard_rounds"] == plan.reshard_rounds
    pairs = semantic_pairs_cascade(emb, dim, plan=plan)
    assert {"vec_id_a", "vec_id_b", "cosine", "tight_pass", "shard_pass"} <= set(
        pairs.columns
    )
    assert pairs.count() > 0


def test_ivf_centroids_memo_fit_once_and_identical(spark, sf_dir, monkeypatch):
    """VERDICT r11 #2: the recall instruments' centroid fit is memoized
    through the warehouse — the first call fits + persists, subsequent
    calls on the same corpus load the artifact WITHOUT refitting, and
    memo-vs-refit is bit-identical (the fit is deterministic)."""
    import numpy as np

    import priority_data_pipeline_postgres_db_spark.operators.similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.drop("label") if "label" in emb.columns else emb
    fresh = sim.fit_ivf_centroids(emb, 8)

    sim._CENTROID_ARTIFACTS.clear()
    calls = []
    orig = sim.fit_ivf_centroids

    def counting(e, k, *a, **kw):
        calls.append(k)
        return orig(e, k, *a, **kw)

    monkeypatch.setattr(sim, "fit_ivf_centroids", counting)
    c1 = sim.ivf_centroids_memo(emb, 8)
    c2 = sim.ivf_centroids_memo(emb, 8)
    assert calls == [8], "second call must read the artifact, not refit"
    assert np.array_equal(c1, fresh) and np.array_equal(c2, fresh)
    # a different k is a different artifact
    sim.ivf_centroids_memo(emb, 4)
    assert calls == [8, 4]
