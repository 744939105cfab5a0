"""Write-path data-quality expectations (staging._split_expectations +
write(expectations=...)): drop / quarantine / fail actions, NULL-as-
violation semantics, the __quarantine twin's content and commit
ordering, idempotent retries, and report counts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.staging import (
    QUARANTINE_SUFFIX,
    ExpectationFailedError,
    StagingWarehouse,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 500.0),     # fails value_cap → quarantine
            (3, "zz", 20.0),     # fails known_label → drop
            (4, "zz", 900.0),    # fails both → quarantine (both names)
            (5, "b", None),      # NULL condition result → violation
        ],
        "id long, label string, value double",
    )


RULES = [
    ("value_cap", "value <= 200.0", "quarantine"),
    ("known_label", "label IN ('a', 'b')", "drop"),
]


def test_split_and_quarantine_content(spark, frame, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="dq")
    rep = wh.write(frame, "t", incremental=True, batch_id="b1",
                   expectations=RULES)
    valid = wh.read("t")
    assert sorted(r["id"] for r in valid.collect()) == [1]
    assert "_dq_violations" not in valid.columns
    assert rep.records_written == 1
    assert rep.records_quarantined == 3  # ids 2, 4, 5
    quar = wh.read("t" + QUARANTINE_SUFFIX)
    got = {r["id"]: sorted(r["_dq_violations"]) for r in quar.collect()}
    assert got == {2: ["value_cap"], 4: ["value_cap"], 5: ["value_cap"]}
    # id 3 fails only the drop rule: removed, not retained anywhere
    assert 3 not in got


def test_fail_action_aborts_with_counts(spark, frame, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="dqf")
    with pytest.raises(ExpectationFailedError) as ei:
        wh.write(frame, "t", incremental=True,
                 expectations=[("positive", "value > 0", "fail")])
    assert ei.value.violations == {"positive": 1}  # the NULL row
    assert not wh.exists("t")
    assert not wh.exists("t" + QUARANTINE_SUFFIX)


def test_idempotent_retry_covers_both_sinks(spark, frame, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="dqi")
    wh.write(frame, "t", incremental=True, batch_id="b1", expectations=RULES)
    rep2 = wh.write(frame, "t", incremental=True, batch_id="b1",
                    expectations=RULES)
    assert rep2.records_written == 0 and rep2.records_quarantined == 0
    assert wh.read("t").count() == 1
    assert wh.read("t" + QUARANTINE_SUFFIX).count() == 3


def test_unknown_action_raises(spark, frame, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="dqu")
    with pytest.raises(ValueError, match="action must be"):
        wh.write(frame, "t", incremental=True,
                 expectations=[("x", "value > 0", "warn")])


def test_streaming_ingest_with_expectations(spark, frame, tmp_path):
    # the gates compose with Structured Streaming unchanged: each
    # foreachBatch micro-batch writes through the same expectations,
    # deterministic batch ids keep both sinks exactly-once under replay
    land = os.path.join(str(tmp_path), "landing")
    frame.filter(F.col("id") <= 2).write.mode("append").parquet(land)
    frame.filter(F.col("id") > 2).write.mode("append").parquet(land)
    wh = StagingWarehouse(spark, str(tmp_path), account_id="dqs")
    stream = (
        spark.readStream.schema("id long, label string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )

    def sink(bdf, bid):
        wh.write(bdf, "t", incremental=True, batch_id=f"s-{bid:06d}",
                 expectations=RULES)

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["id"] for r in wh.read("t").collect()) == [1]
    quar = {r["id"] for r in wh.read("t" + QUARANTINE_SUFFIX).collect()}
    assert quar == {2, 4, 5}


def test_full_refresh_with_expectations(spark, frame, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="dqr")
    wh.write(frame, "t", incremental=True, batch_id="b1", expectations=RULES)
    # refresh replaces the main table; the quarantine twin is an
    # append-only audit log and keeps accumulating
    wh.write(frame.filter(F.col("id") <= 2), "t", incremental=False,
             expectations=RULES)
    assert sorted(r["id"] for r in wh.read("t").collect()) == [1]
    assert wh.read("t" + QUARANTINE_SUFFIX).count() == 4  # 3 + id=2 again
