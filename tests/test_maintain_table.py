"""maintain_table: the hands-free warehouse maintenance turn (one heavy
action per turn, chosen from cheap metadata only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.staging import (
    StagingWarehouse,
)


def _rows(df):
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def test_deep_history_upsert_compacts(spark, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="mt1")
    wh.set_upsert_keys("t", ["id"], "v")
    for i in range(6):
        wh.write(
            spark.createDataFrame([(j, i, float(i)) for j in range(4)],
                                  "id long, v long, val double"),
            "t", incremental=True,
        )
    logical = _rows(wh.read("t"))
    turn = wh.maintain_table("t", compact_after=4)
    assert turn["action"] == "compact"
    assert turn["batches_before"] == 6 and turn["batches_after"] == 1
    assert _rows(wh.read("t")) == logical
    # next turn: nothing left to do
    assert wh.maintain_table("t", compact_after=4)["action"] == "none"


def test_deep_history_append_only_bin_packs(spark, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="mt2")
    for i in range(6):
        wh.write(spark.range(i * 10, i * 10 + 10), "t", incremental=True)
    raw = _rows(wh.read("t"))
    turn = wh.maintain_table("t", compact_after=4)
    assert turn["action"] == "bin_pack"
    assert turn["batches_after"] == 1
    assert _rows(wh.read("t")) == raw  # verbatim rows


def test_smallfile_ratio_triggers_bin_pack(spark, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="mt3")
    wh.write(spark.range(2000).repartition(24), "t", incremental=True)
    wh.write(spark.range(2000, 4000).repartition(24), "t", incremental=True)
    turn = wh.maintain_table("t", compact_after=16, smallfile_ratio=4.0)
    assert turn["action"] == "bin_pack"
    assert turn["files_after"] < turn["files_before"]
    assert wh.read("t").count() == 4000


def test_snapshot_retention_turn(spark, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="mt4")
    for bid in ("b1", "b2", "b3"):
        wh.write(spark.range(5), "t", incremental=True, batch_id=bid)
    turn = wh.maintain_table("t", compact_after=16, smallfile_ratio=100.0,
                             keep_last=1)
    assert turn["action"] == "expire"
    assert turn["expired"] == 2
    assert wh.read("t").count() == 15
    assert (
        wh.maintain_table("t", compact_after=16, smallfile_ratio=100.0,
                          keep_last=1)["action"]
        == "none"
    )


def test_quiet_table_is_none(spark, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="mt5")
    wh.write(spark.range(10).coalesce(1), "t", incremental=True)
    assert wh.maintain_table("t")["action"] == "none"
