"""Margin-directed multi-probe (r7): the driver's sf0.01/sf0.1 corpora
derive ≤4 planes, where the probe width is 0 — so the hash gate never
exercises the probed path.  These tests build a corpus big enough for 5
planes (probe_k_for → 2) and run the SAME engine-vs-DuckDB comparison
the driver runs, plus the pinned incremental identity, at that operating
point."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

N = 2600  # ceil(2600/160) = 17 > 2^4 → 5 planes → probe_k_for = 2
DIM = 16


def test_probe_k_law():
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        probe_k_for,
    )

    assert [probe_k_for(p) for p in (1, 2, 3, 4)] == [0, 0, 0, 0]
    assert [probe_k_for(p) for p in (5, 6, 7, 8)] == [2, 2, 2, 2]
    assert [probe_k_for(p) for p in (9, 12, 30)] == [4, 4, 4]


@pytest.fixture(scope="module")
def probe_corpus(spark, tmp_path_factory):
    """Deterministic ~N-vector corpus written to parquet so Spark and
    DuckDB read the identical bits (the driver's setup)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N - 200, DIM))
    # 200 perturbed near-dups so the pair set has real structure
    dups = base[:200] + rng.normal(scale=0.05, size=(200, DIM))
    mat = np.concatenate([base, dups]).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(N, dtype=np.int64), "embedding": list(mat)}
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    path = str(tmp_path_factory.mktemp("probe") / "embeddings.parquet")
    spark.createDataFrame(pdf, schema).coalesce(2).write.parquet(path)
    return path


def test_probed_pairs_match_oracle(spark, probe_corpus):
    """Full engine-vs-oracle hash-gate replica at 5 planes / probe k=2
    (the asserted ``probe_k_for(5)`` operating point): the Spark probed
    pair pipeline and the DuckDB probes-CTE oracle must agree
    row-for-row, cosine bit-for-bit."""
    import duckdb

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        ORACLE,
        n_planes_for,
        probe_k_for,
        semantic_pairs,
    )

    assert probe_k_for(n_planes_for(N)) == 2  # the config under test

    emb = spark.read.parquet(probe_corpus)
    got = (
        semantic_pairs(emb, DIM)
        .toPandas()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{probe_corpus}/*.parquet'"
    )
    want = (
        con.execute(ORACLE["dedup_embedding_pairs"])
        .df()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )

    assert len(got) == len(want) and len(got) > 0
    assert got["vec_id_a"].tolist() == want["vec_id_a"].astype("int64").tolist()
    assert got["vec_id_b"].tolist() == want["vec_id_b"].astype("int64").tolist()
    # bit-exact: int64 dots, same double division order
    assert got["cosine"].tolist() == want["cosine"].tolist()


def test_incremental_identity_at_probe_scale(spark, probe_corpus):
    """incremental = full minus old×old must survive the probed path
    (both orientations of either-side probing covered)."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        incremental_semantic_pairs,
        semantic_pairs,
    )

    emb = spark.read.parquet(probe_corpus)
    full = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_pairs(emb, DIM).collect()
    }
    old = emb.filter(F.col("vec_id") % 10 < 8)
    new = emb.filter(F.col("vec_id") % 10 >= 8)
    inc = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in incremental_semantic_pairs(old, new, DIM).collect()
    }
    expected = {p for p in full if not (p[0] % 10 < 8 and p[1] % 10 < 8)}
    assert inc == expected
    assert inc


def test_probed_knn_join_matches_oracle(spark, probe_corpus):
    """Directed kNN probing (query role probes, home side stays) must
    replay in the oracle at 5 planes / k=2 (probe_k_for(5))."""
    import duckdb

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        ORACLE,
        TOP_K,
        ann_knn_join,
    )

    emb = spark.read.parquet(probe_corpus)
    got = (
        ann_knn_join(emb, DIM, k=TOP_K)
        .toPandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{probe_corpus}/*.parquet'"
    )
    want = (
        con.execute(ORACLE["sim_knn_join"])
        .df()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for col in ("vec_id", "neighbor_id", "rank"):
        assert got[col].tolist() == want[col].astype("int64").tolist(), col
    assert got["cosine"].tolist() == want["cosine"].tolist()


def test_probed_ann_topk_matches_oracle(spark, probe_corpus):
    """The qprobes CTE of the sim_ann_lsh_topk oracle (query-side k>0
    probing) is never exercised by the sf0.01/sf0.1 gates (k=0 there) —
    compare engine vs DuckDB at 5 planes / k=2 so drift in that CTE
    can't hide until a large-corpus hash gate (ADVICE r7)."""
    import duckdb

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        N_QUERIES,
        ORACLE,
        TOP_K,
        ann_lsh_topk,
    )

    emb = spark.read.parquet(probe_corpus)
    got = (
        ann_lsh_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), DIM, k=TOP_K)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{probe_corpus}/*.parquet'"
    )
    want = (
        con.execute(ORACLE["sim_ann_lsh_topk"])
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for col in ("query_id", "neighbor_id", "rank"):
        assert got[col].tolist() == want[col].astype("int64").tolist(), col
    assert got["cosine"].tolist() == want["cosine"].tolist()


def test_probed_recall_curve_matches_oracle(spark, probe_corpus):
    """sim_srp_recall_curve's probed first-t pipeline vs its oracle at
    5 planes / k=2 (ADVICE r7 — the other instrument whose probed branch
    the gate corpora never reach)."""
    import duckdb

    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        ORACLE,
        srp_recall_curve,
    )

    emb = spark.read.parquet(probe_corpus)
    got = (
        srp_recall_curve(emb, DIM)
        .toPandas()
        .sort_values("n_tables")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{probe_corpus}/*.parquet'"
    )
    want = (
        con.execute(ORACLE["sim_srp_recall_curve"])
        .df()
        .sort_values("n_tables")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for col in ("n_tables", "n_exact_pairs", "n_found"):
        assert got[col].tolist() == want[col].astype("int64").tolist(), col
    assert got["recall"].tolist() == want["recall"].tolist()


def test_legacy_verify_path_identical(spark, probe_corpus, monkeypatch):
    """Above _INLINE_VERIFY_MAX the pair/kNN families run the legacy
    distinct-then-join verify — a branch every gate corpus now skips
    (all ≤250k vectors).  Force it via monkeypatch and pin that both
    shapes return identical rows, so the scale path can't rot unseen."""
    from priority_data_pipeline_postgres_db_spark.operators import similarity as sim

    emb = spark.read.parquet(probe_corpus)

    def pairs_set():
        return {
            (r["vec_id_a"], r["vec_id_b"], r["cosine"])
            for r in sim.semantic_pairs(emb, DIM).collect()
        }

    def knn_set():
        return {
            (r["vec_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in sim.ann_knn_join(emb, DIM, k=3).collect()
        }

    inline_pairs, inline_knn = pairs_set(), knn_set()
    monkeypatch.setattr(sim, "_INLINE_VERIFY_MAX", 0)
    assert pairs_set() == inline_pairs and inline_pairs
    assert knn_set() == inline_knn and inline_knn


def test_stress_recall_floor():
    """Pin SRP recall >= 0.8 at every measured stress operating point
    (VERDICT r6 #3).  Occupancy is held by n_planes_for, but recall at
    grown plane counts is only what scripts/stress_scale.py MEASURED —
    this test makes any recorded cliff (like the pre-r6 10x zero-pairs
    one) a red suite, not a buried artifact row."""
    import glob
    import json
    import os

    from tests.test_stress_floor import SUPPORTED_MAX_PLANES

    root = os.path.join(os.path.dirname(__file__), "..")
    rows = []
    for path in glob.glob(os.path.join(root, "STRESS_x*.json")):
        with open(path) as f:
            rec = json.load(f).get("results", {}).get("srp_recall")
        if not rec:
            continue
        for tag, row in rec.items():
            # rows past the measured single-bit envelope are saturation
            # probes, asserted separately (test_stress_floor requires
            # their artifact to carry an explanatory note)
            if "recall" in row and row.get("planes", 0) <= SUPPORTED_MAX_PLANES:
                rows.append((os.path.basename(path), tag, row["recall"]))
    assert rows, "no stress artifact records srp_recall — run scripts/stress_scale.py"
    bad = [r for r in rows if r[2] < 0.8]
    assert not bad, f"SRP recall below 0.8 floor: {bad}"


def test_knn_recall_report_shape_and_bounds(spark, sf_dir):
    """The kNN top-k instrument returns one row of integer counts with
    found <= exact and a recall in (0, 1]; at sf0.001 the probed path
    should find most true neighbors."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        sim_knn_recall_report,
    )

    row = sim_knn_recall_report(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_queries"] > 0 and r["n_exact"] > 0
    assert 0 <= r["n_found"] <= r["n_exact"]
    assert r["recall"] is not None and 0.0 < r["recall"] <= 1.0
