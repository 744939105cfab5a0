"""Staging warehouse K1/K4: append vs overwrite, naming contract, teardown
(reference priorityDataSource.py:847-889, sqlDwh.py:85-123)."""

from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.staging import StagingWarehouse


def test_overwrite_then_append(spark, orders, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="t1")
    full = orders.filter(F.col("o_orderdate") < "2024-06-01")
    inc = orders.filter(F.col("o_orderdate") >= "2024-06-01")

    r1 = wh.write(full, "ORDERS", incremental=False)
    assert r1.table_name == "stg_orders"
    assert r1.records_written == full.count()

    r2 = wh.write(inc, "ORDERS", incremental=True)
    assert r2.records_written == inc.count()
    assert wh.read("orders").count() == orders.count()

    # full refresh replaces everything (if_exists='replace' semantics)
    r3 = wh.write(full, "ORDERS", incremental=False)
    assert wh.read("orders").count() == full.count() == r3.records_written


def test_tables_listing_and_drop_all(spark, orders, tmp_path):
    wh = StagingWarehouse(spark, str(tmp_path), account_id="t2")
    wh.write(orders.limit(5), "ORDERS", incremental=False)
    wh.write(orders.limit(5), "CTYPE", incremental=False)
    assert wh.tables() == ["stg_ctype", "stg_orders"]
    dropped = wh.drop_all()
    assert dropped == ["stg_ctype", "stg_orders"]
    assert wh.tables() == []
    assert not wh.exists("orders")


def test_crashed_write_leaves_no_phantom_rows(spark, orders, tmp_path):
    """Batch-commit protocol: a write that dies before its atomic rename
    leaves an orphan scratch dir that readers, counts, exists() and the
    next report all ignore (VERDICT r1: idempotent appends sans Delta)."""
    import os
    import shutil

    wh = StagingWarehouse(spark, str(tmp_path), account_id="t4")
    wh.write(orders.limit(8), "ORDERS", incremental=False)
    n_committed = wh.read("orders").count()
    assert n_committed == 8

    # simulate a crash mid-append: a fully-written scratch dir that never
    # reached its commit rename (real partial files, hidden dir name)
    base = os.path.join(str(tmp_path), "acc_t4", "stg_orders")
    committed = next(d for d in os.listdir(base) if d.startswith("ingest_batch="))
    orphan = os.path.join(base, ".tmp-deadbeef")
    shutil.copytree(os.path.join(base, committed), orphan)
    assert any(f.endswith(".parquet") for f in os.listdir(orphan))

    # readers and counts exclude the orphan
    assert wh.read("orders").count() == n_committed
    assert wh.exists("orders") and wh.tables() == ["stg_orders"]

    # the next committed append reports only its own rows
    r = wh.write(orders.limit(3), "ORDERS", incremental=True)
    assert r.records_written == 3
    assert wh.read("orders").count() == n_committed + 3

    # a table that has ONLY an orphan doesn't exist yet
    empty_base = os.path.join(str(tmp_path), "acc_t4", "stg_ghost")
    shutil.copytree(orphan, os.path.join(empty_base, ".tmp-dead"))
    assert not wh.exists("ghost")
    assert "stg_ghost" not in wh.tables()


def test_empty_incremental_append_commits_nothing(spark, orders, tmp_path):
    """An incremental batch the exactly-once guard emptied must not leave
    a schema-less committed dir behind (parquet can't re-read one)."""
    wh = StagingWarehouse(spark, str(tmp_path), account_id="t5")
    wh.write(orders.limit(5), "ORDERS", incremental=False)
    r = wh.write(orders.limit(0), "ORDERS", incremental=True)
    assert r.records_written == 0
    assert wh.read("orders").count() == 5


def test_partitioned_staging_layout_and_pruning(spark, tmp_path, sf_dir):
    """Hive-partitioned staging: directory layout by derived date column,
    and a date-bounded read prunes to the matching partitions."""
    import io
    import contextlib
    import os

    from priority_data_pipeline_postgres_db_spark.plans.tables import load

    wh = StagingWarehouse(spark, str(tmp_path), account_id="t3")
    ev = load(spark, sf_dir, "events").withColumn("event_day", F.to_date("ts"))
    wh.write(ev, "EVENTS", incremental=False, partition_by=["event_day"])

    # partition dirs nest inside the committed batch dir
    base = os.path.join(str(tmp_path), "acc_t3", "stg_events")
    batches = [d for d in os.listdir(base) if d.startswith("ingest_batch=")]
    assert len(batches) == 1
    days = [d for d in os.listdir(os.path.join(base, batches[0])) if d.startswith("event_day=")]
    assert len(days) == ev.select("event_day").distinct().count()

    scan = wh.read("events").filter(F.col("event_day") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    # partition filter prunes directories at planning time
    assert "PartitionFilters: [isnotnull(event_day" in plan
    assert scan.count() == ev.filter(F.col("event_day") == "2024-01-05").count()


def test_compact_newest_wins_merge(spark, tmp_path):
    """compact() collapses batches to latest-per-pk through the atomic
    protocol; read() then returns upsert semantics with no window."""
    from priority_data_pipeline_postgres_db_spark.operators.staging import StagingWarehouse

    wh = StagingWarehouse(spark, str(tmp_path))
    b1 = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-01")], "id long, v string, ts string"
    )
    b2 = spark.createDataFrame(
        [(2, "b2", "2024-01-02"), (3, "c", "2024-01-02")], "id long, v string, ts string"
    )
    wh.write(b1, "t", incremental=True)
    wh.write(b2, "t", incremental=True)
    rep = wh.compact("t", ["id"], "ts")
    assert rep.records_written == 3
    got = {r["id"]: r["v"] for r in wh.read("t").collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}
    # exactly one committed batch remains
    assert len(wh._batches(wh._path("t"))) == 1


def test_upsert_contract_read_view_and_plan(spark, tmp_path):
    """A table with a registered upsert contract reads newest-wins by
    default; the compact-on-read window partitions by the PK (never a
    global-order window), and raw=True bypasses the view."""
    import contextlib
    import io

    from priority_data_pipeline_postgres_db_spark.operators.staging import StagingWarehouse

    wh = StagingWarehouse(spark, str(tmp_path), account_id="t7")
    b1 = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-01")], "id long, v string, ts string"
    )
    b2 = spark.createDataFrame([(2, "b2", "2024-01-02")], "id long, v string, ts string")
    wh.write(b1, "t", incremental=True)
    wh.write(b2, "t", incremental=True)
    wh.set_upsert_keys("t", ["id"], "ts")

    got = {r["id"]: r["v"] for r in wh.read("t").collect()}
    assert got == {1: "a", 2: "b2"}
    assert wh.read("t", raw=True).count() == 3  # all physical versions

    view = wh.read("t")
    plan = view._jdf.queryExecution().executedPlan().toString()
    # every window spec partitions by the pk — never a global-order window
    specs = [seg for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs and all(seg.startswith("id#") for seg in specs), plan
    # and Spark pushes the rn=1 filter down as a per-group limit
    assert "WindowGroupLimit [id#" in plan, plan


def test_upsert_tie_break_is_ingestion_order(spark, tmp_path):
    """Two versions of a PK with an UNCHANGED order_col (a late correction
    that didn't touch the watermark column) must resolve to the later-
    ingested batch — auto batch ids are timestamp-prefixed so the
    BATCH_COL desc tie-break reflects commit order, not uuid luck."""
    from priority_data_pipeline_postgres_db_spark.operators.staging import StagingWarehouse

    wh = StagingWarehouse(spark, str(tmp_path), account_id="t8")
    wh.set_upsert_keys("t", ["id"], "ts")
    for i in range(6):  # several writes: a lexicographic fluke won't pass 6x
        df = spark.createDataFrame([(1, f"v{i}", "2024-01-01")], "id long, v string, ts string")
        wh.write(df, "t", incremental=True)
    [row] = wh.read("t").collect()
    assert row["v"] == "v5"
    compacted = wh.compact("t")
    assert compacted.records_written == 1
    [row] = wh.read("t").collect()
    assert row["v"] == "v5"


def test_vacuum_reaps_old_orphans_only(spark, orders, tmp_path):
    """vacuum() removes crash-orphaned scratch dirs past the age guard and
    leaves fresh (possibly in-flight) ones plus committed data alone."""
    import os
    import shutil
    import time

    wh = StagingWarehouse(spark, str(tmp_path), account_id="t6")
    wh.write(orders.limit(8), "ORDERS", incremental=False)

    base = os.path.join(str(tmp_path), "acc_t6", "stg_orders")
    committed = next(d for d in os.listdir(base) if d.startswith("ingest_batch="))
    old = os.path.join(base, ".tmp-dead")
    fresh = os.path.join(base, ".tmp-inflight")
    shutil.copytree(os.path.join(base, committed), old)
    shutil.copytree(os.path.join(base, committed), fresh)
    past = time.time() - 7200
    os.utime(old, (past, past))

    removed = wh.vacuum(min_age_sec=3600)
    assert removed == [old]
    assert not os.path.isdir(old) and os.path.isdir(fresh)
    assert wh.read("orders").count() == 8

    # age 0 reaps the rest; committed batch survives
    assert wh.vacuum("ORDERS", min_age_sec=0) == [fresh]
    assert wh.read("orders").count() == 8


def test_vacuum_covers_tables_with_no_committed_batch(spark, orders, tmp_path):
    """A FIRST write that crashes leaves a table dir holding only a
    scratch orphan; the no-arg vacuum must still find it."""
    import os

    wh = StagingWarehouse(spark, str(tmp_path), account_id="t7")
    base = os.path.join(str(tmp_path), "acc_t7", "stg_ghost")
    orphan = os.path.join(base, ".tmp-dead")
    os.makedirs(orphan)
    assert wh.tables() == []  # no committed batch -> not a table
    assert wh.vacuum(min_age_sec=0) == [orphan]
    assert not os.path.isdir(orphan)


def test_time_travel_read_sees_historical_upsert_state(spark, tmp_path):
    """as_of pins the newest-wins view to the batches committed by then:
    snapshot ids, epoch-ns ints, and datetimes all address it; the cutoff
    reaches the scan as a partition filter; compact() collapses history."""
    import datetime as dt
    import time

    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators.staging import (
        StagingWarehouse,
    )

    wh = StagingWarehouse(spark, str(tmp_path), account_id="tt")
    wh.set_upsert_keys("t", ["pk"], "v")
    for version in (1, 2, 3):
        wh.write(
            spark.createDataFrame([Row(pk=1, v=version), Row(pk=100 + version, v=0)]),
            "t",
            incremental=True,
        )
        time.sleep(0.01)
    snaps = wh.snapshots("t")
    assert len(snaps) == 3 and snaps == sorted(snaps)

    def state(df):
        return {r["pk"]: r["v"] for r in df.collect()}

    assert state(wh.read("t"))[1] == 3
    assert state(wh.read("t", as_of=snaps[0])) == {1: 1, 101: 0}
    assert state(wh.read("t", as_of=snaps[1])) == {1: 2, 101: 0, 102: 0}
    # int cutoff: ns just after the second commit (its id's ns prefix)
    ns2 = int(snaps[1].split("-")[0])
    assert state(wh.read("t", as_of=ns2)) == {1: 2, 101: 0, 102: 0}
    # datetime cutoff (μs-grained): midpoint between commits 2 and 3 —
    # well clear of the float round-trip error in timestamp()
    ns3 = int(snaps[2].split("-")[0])
    when = dt.datetime.fromtimestamp((ns2 + ns3) / 2 / 1e9, dt.timezone.utc)
    assert state(wh.read("t", as_of=when)) == {1: 2, 101: 0, 102: 0}
    # raw + as_of: physical rows of the first two batches only
    assert wh.read("t", raw=True, as_of=snaps[1]).count() == 4
    # the cutoff prunes partitions at the scan
    plan = (
        wh.read("t", as_of=snaps[0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "ingest_batch" in plan
    # compact collapses history: old snapshots no longer addressable
    wh.compact("t")
    assert len(wh.snapshots("t")) == 1
    assert state(wh.read("t"))[1] == 3


def test_schema_evolution_across_batches(spark, tmp_path):
    """A column added by a later incremental batch must appear on read
    (null-filled for earlier rows), survive compact(), and not disturb
    upsert resolution — not silently vanish to whichever batch's footer
    Spark happened to pick."""
    from pyspark.sql import Row

    from priority_data_pipeline_postgres_db_spark.operators.staging import (
        StagingWarehouse,
    )

    wh = StagingWarehouse(spark, str(tmp_path), account_id="ev")
    wh.set_upsert_keys("t", ["pk"], "v")
    wh.write(spark.createDataFrame([Row(pk=1, v=1, a="x")]), "t", incremental=True)
    wh.write(
        spark.createDataFrame([Row(pk=1, v=2, a="x2", c=9), Row(pk=2, v=1, a="y", c=7)]),
        "t",
        incremental=True,
    )
    got = {r["pk"]: r for r in wh.read("t").collect()}
    assert "c" in wh.read("t").columns
    assert got[1]["v"] == 2 and got[1]["c"] == 9  # newest wins, new col carried
    assert got[2]["c"] == 7
    raw = wh.read("t", raw=True)
    assert raw.count() == 3 and raw.filter("c is null").count() == 1
    wh.compact("t")
    after = {r["pk"]: (r["v"], r["c"]) for r in wh.read("t").collect()}
    assert after == {1: (2, 9), 2: (1, 7)}


def _three_event_batches(spark, wh, table):
    rows = [
        (1, "2024-01-01", "a"),
        (2, "2024-01-02", "b"),
        (3, "2024-01-03", "c"),
        (4, "2024-01-04", "d"),
    ]
    df = spark.createDataFrame(rows, "id long, day string, payload string")
    wh.write(df.filter("id = 1"), "EV", incremental=True, batch_id="b1")
    wh.write(df.filter("id = 2"), "EV", incremental=True, batch_id="b2")
    wh.write(df.filter("id >= 3"), "EV", incremental=True, batch_id="b3")
    return df


def test_expire_snapshots_preserves_reachable_reads(spark, tmp_path):
    """Expiry folds b1+b2 into a retention base: the latest read and the
    horizon read are bit-identical before/after, the expired dirs are
    gone, snapshots() shows base + retained, and a pre-horizon as_of
    raises instead of returning a partial frame."""
    import os

    import pytest

    from priority_data_pipeline_postgres_db_spark.operators.staging import (
        BATCH_COL,
        SnapshotExpiredError,
    )

    wh = StagingWarehouse(spark, str(tmp_path), account_id="exp1")
    _three_event_batches(spark, wh, "EV")
    before_latest = {tuple(r) for r in wh.read("ev").collect()}
    before_b2 = {tuple(r) for r in wh.read("ev", as_of="b2").collect()}

    out = wh.expire_snapshots("EV", keep_last=1)
    assert out["expired"] == ["b1", "b2"] and out["horizon"] == "b2"
    assert {tuple(r) for r in wh.read("ev").collect()} == before_latest
    assert {tuple(r) for r in wh.read("ev", as_of="b2").collect()} == before_b2
    assert wh.snapshots("EV") == ["b2~base", "b3"]
    path = wh._path("EV")
    assert not os.path.isdir(os.path.join(path, f"{BATCH_COL}=b1"))
    with pytest.raises(SnapshotExpiredError):
        wh.read("ev", as_of="b1")
    # idempotent: nothing left to expire at the same retention
    assert wh.expire_snapshots("EV", keep_last=1)["expired"] == []


def test_expire_snapshots_crash_window_visibility(spark, tmp_path):
    """The marker is THE commit: a base dir without a marker (crash
    between rename and marker write) is invisible — readers still see
    the pre-expiry state exactly — and the next expiry pass converges."""
    import os
    import shutil

    from priority_data_pipeline_postgres_db_spark.operators.staging import BATCH_COL

    wh = StagingWarehouse(spark, str(tmp_path), account_id="exp2")
    _three_event_batches(spark, wh, "EV")
    before = {tuple(r) for r in wh.read("ev").collect()}
    path = wh._path("EV")
    # simulate the crash window: an orphan base holding b1+b2's rows,
    # no marker
    src = os.path.join(path, f"{BATCH_COL}=b1")
    shutil.copytree(src, os.path.join(path, f"{BATCH_COL}=b2~base"))
    assert {tuple(r) for r in wh.read("ev").collect()} == before  # no dup
    assert wh.snapshots("EV") == ["b1", "b2", "b3"]
    out = wh.expire_snapshots("EV", keep_last=1)  # converges
    assert out["expired"] == ["b1", "b2"]
    assert {tuple(r) for r in wh.read("ev").collect()} == before


def test_expire_snapshots_upsert_fold_drops_dead_versions(spark, tmp_path):
    """With an upsert contract the fold applies newest-wins WITHIN the
    expired range: the superseded version physically disappears (space
    actually reclaimed) while every reachable read is unchanged."""
    wh = StagingWarehouse(spark, str(tmp_path), account_id="exp3")
    v = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new"), (2, 1, "z")], "id long, v long, s string"
    )
    wh.write(v.filter("s = 'old'"), "U", incremental=True, batch_id="b1")
    wh.write(v.filter("s = 'new'"), "U", incremental=True, batch_id="b2")
    wh.write(v.filter("s = 'z'"), "U", incremental=True, batch_id="b3")
    wh.set_upsert_keys("U", ["id"], "v")
    before = {tuple(r) for r in wh.read("u").collect()}

    wh.expire_snapshots("U", keep_last=1)
    assert {tuple(r) for r in wh.read("u").collect()} == before
    raw = [tuple(r) for r in wh.read("u", raw=True).collect()]
    assert len(raw) == 2  # (1,2,'new') in the base + (2,1,'z') retained
    assert (1, 1, "old") not in raw  # dead version reclaimed


def test_expire_snapshots_chains(spark, tmp_path):
    """A second expiry can fold the previous base itself: horizons
    advance, the old base dies, and reads stay exact."""
    wh = StagingWarehouse(spark, str(tmp_path), account_id="exp4")
    _three_event_batches(spark, wh, "EV")
    wh.write(
        spark.createDataFrame([(9, "2024-01-09", "i")], "id long, day string, payload string"),
        "EV",
        incremental=True,
        batch_id="b5",
    )
    before = {tuple(r) for r in wh.read("ev").collect()}
    wh.expire_snapshots("EV", keep_last=2)  # folds b1+b2, keeps b3,b5
    assert wh.snapshots("EV") == ["b2~base", "b3", "b5"]
    wh.expire_snapshots("EV", keep_last=1)  # folds base+b3, keeps b5
    assert wh.snapshots("EV") == ["b3~base", "b5"]
    assert {tuple(r) for r in wh.read("ev").collect()} == before
    assert {tuple(r) for r in wh.read("ev", as_of="b3").collect()} == {
        (1, "2024-01-01", "a"),
        (2, "2024-01-02", "b"),
        (3, "2024-01-03", "c"),
        (4, "2024-01-04", "d"),
    }


def test_zorder_rewrite_prunes_both_dimensions(spark, tmp_path, sf_dir):
    """The layout claim behind rewrite_clustered: after a Z-order
    rewrite, a range scan on EITHER clustered dimension (and on both)
    touches a strict subset of the files, while a random-layout rewrite
    of the same data makes every file straddle the full key range (no
    pruning possible).  Content equality under the filter is the
    k1_zorder_scan oracle's job; this pins the physical property the
    oracle can't see."""
    import os

    from priority_data_pipeline_postgres_db_spark.operators.staging import BATCH_COL

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wh = StagingWarehouse(spark, str(tmp_path), account_id="z1")
    wh.write(ev, "EVZ", incremental=False)
    wh.rewrite_clustered("EVZ", zorder_by=["user_id", "event_id"], n_files=16)

    batch = wh.snapshots("EVZ")[-1]
    bdir = os.path.join(wh._path("EVZ"), f"{BATCH_COL}={batch}")
    n_files = sum(1 for f in os.listdir(bdir) if f.endswith(".parquet"))
    assert n_files > 4  # enough granularity for pruning to mean anything

    def touched(df) -> int:
        return (
            df.select(F.input_file_name().alias("f")).distinct().count()
        )

    # narrow windows in both dims (sf0.001 keyspace: user 0-14,
    # event 0-999; scales are proportional at larger sf)
    full = wh.read("EVZ")
    lo_u, hi_u = 3, 6
    lo_e, hi_e = 100, 300
    both = touched(full.filter(F.col("user_id").between(lo_u, hi_u)
                               & F.col("event_id").between(lo_e, hi_e)))
    dim_u = touched(full.filter(F.col("user_id").between(lo_u, hi_u)))
    dim_e = touched(full.filter(F.col("event_id").between(lo_e, hi_e)))
    # the 2-D scan must skip files; each 1-D scan can be no worse than
    # the 2-D one (subset rows -> subset files) and z-order's guarantee
    # per dim is partial locality, so only bound them loosely
    assert both < n_files
    assert both <= min(dim_u, dim_e)

    # control: identical rows, random layout — every file straddles the
    # key space, so the same scan reads (essentially) everything
    wh2 = StagingWarehouse(spark, str(tmp_path), account_id="z2")
    wh2.write(ev.repartition(16), "EVR", incremental=False)
    ctl = touched(
        wh2.read("EVR").filter(F.col("user_id").between(lo_u, hi_u)
                               & F.col("event_id").between(lo_e, hi_e))
    )
    assert both < ctl


def test_full_refresh_resets_expiry_marker(spark, tmp_path):
    """A full refresh (and compact(), which routes through it) on an
    expired table must clear the retention marker with the history it
    described — a stale horizon compares against the NEW batch's auto
    ns id (which sorts below explicit ids like 'b2') and silently
    filtered the fresh data out before the fix."""
    wh = StagingWarehouse(spark, str(tmp_path), account_id="mreset")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, s string")
    for i, bid in enumerate(["b1", "b2", "b3"]):
        wh.write(df.filter(f"id = {i + 1}"), "T", incremental=True, batch_id=bid)
    wh.expire_snapshots("T", keep_last=1)

    wh.write(df, "T", incremental=False)  # full refresh, auto ns id
    assert wh.read("t").count() == 3
    assert len(wh.snapshots("T")) == 1

    # compact() after expiry: same path, same guarantee
    wh2 = StagingWarehouse(spark, str(tmp_path), account_id="mreset2")
    for i, bid in enumerate(["b1", "b2", "b3"]):
        wh2.write(df.filter(f"id <= {i + 1}").withColumn("v", F.lit(i)),
                  "U", incremental=True, batch_id=bid)
    wh2.set_upsert_keys("U", ["id"], "v")
    wh2.expire_snapshots("U", keep_last=1)
    wh2.compact("U")
    got = {r["id"]: r["v"] for r in wh2.read("u").collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_expire_snapshots_preserves_hive_layout(spark, tmp_path, sf_dir):
    """Expiry on a hive-partitioned table: the retention base must mirror
    the batches' nested `col=val` layout (partition discovery refuses a
    flat dir next to partitioned siblings), and the partition column
    keeps pruning after the fold."""
    import os

    from priority_data_pipeline_postgres_db_spark.operators.staging import BATCH_COL
    from priority_data_pipeline_postgres_db_spark.plans.tables import (
        load,
        normalize_events_ts,
    )

    wh = StagingWarehouse(spark, str(tmp_path), account_id="hive1")
    ev = load(spark, sf_dir, "events").withColumn("event_day", F.to_date("ts"))
    for bid, pred in (
        ("b1", "ts < '2024-01-10'"),
        ("b2", "ts >= '2024-01-10' and ts < '2024-01-20'"),
        ("b3", "ts >= '2024-01-20'"),
    ):
        wh.write(ev.filter(pred), "EVP", incremental=True, batch_id=bid,
                 partition_by=["event_day"])
    before = {tuple(r) for r in wh.read("evp").select("event_id", "event_day").collect()}

    out = wh.expire_snapshots("EVP", keep_last=1)
    assert out["expired"] == ["b1", "b2"]
    after = {tuple(r) for r in wh.read("evp").select("event_id", "event_day").collect()}
    assert after == before
    base_dir = os.path.join(wh._path("EVP"), f"{BATCH_COL}=b2~base")
    assert any(d.startswith("event_day=") for d in os.listdir(base_dir))


def test_zorder_rewrite_preserves_hive_partitioning(spark, tmp_path, sf_dir):
    """rewrite_clustered(partition_by=...) keeps the hive layout: z-order
    runs WITHIN each partition dir and the partition column still prunes."""
    import os

    from priority_data_pipeline_postgres_db_spark.operators.staging import BATCH_COL
    from priority_data_pipeline_postgres_db_spark.plans.tables import load

    wh = StagingWarehouse(spark, str(tmp_path), account_id="zhive")
    ev = load(spark, sf_dir, "events").withColumn("event_day", F.to_date("ts"))
    wh.write(ev, "EVZ", incremental=False, partition_by=["event_day"])
    before = wh.read("evz").count()

    wh.rewrite_clustered(
        "EVZ", zorder_by=["user_id", "event_id"], n_files=8,
        partition_by=["event_day"],
    )
    assert wh.read("evz").count() == before
    batch = wh.snapshots("EVZ")[-1]
    bdir = os.path.join(wh._path("EVZ"), f"{BATCH_COL}={batch}")
    assert any(d.startswith("event_day=") for d in os.listdir(bdir))


def test_table_changes_cdf_types(spark, tmp_path):
    """Derived change feed: inserts/updates on the forward diff, deletes
    reachable via the reverse diff (a pk present at `from` and absent at
    `to`); unchanged keys never emit; no contract -> loud error."""
    import pytest

    wh = StagingWarehouse(spark, str(tmp_path), account_id="cdf1")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "uid long, ver long, s string"
    )
    b2 = spark.createDataFrame(
        [(2, 21, "b2"), (3, 30, "c")], "uid long, ver long, s string"
    )
    wh.write(b1, "S", incremental=True, batch_id="b1")
    wh.write(b2, "S", incremental=True, batch_id="b2")
    wh.set_upsert_keys("S", ["uid"], "ver")

    fwd = {r["uid"]: (r["_change_type"], r["ver"], r["s"])
           for r in wh.table_changes("S", "b1", "b2").collect()}
    assert fwd == {2: ("update_postimage", 21, "b2"), 3: ("insert", 30, "c")}
    # uid 1 unchanged -> absent

    rev = {r["uid"]: r["_change_type"]
           for r in wh.table_changes("S", "b2", "b1").collect()}
    assert rev == {2: "update_postimage", 3: "delete"}

    # no upsert contract -> the APPEND-ONLY feed: batches are immutable,
    # so the diff is the rows of batches in (from, to], all 'insert'
    wh.write(b1, "NOPK", incremental=True, batch_id="b1")
    wh.write(b2, "NOPK", incremental=True, batch_id="b2")
    assert wh.table_changes("NOPK", "b1", "b1").count() == 0  # empty window
    app = wh.table_changes("NOPK", "b1", "b2").collect()
    assert {r["uid"] for r in app} == {2, 3}  # b2's rows only
    assert {r["_change_type"] for r in app} == {"insert"}


def test_incremental_after_expiry_survives(spark, tmp_path):
    """ADVICE r9 (medium): an incremental commit whose auto-generated ns
    id sorts at or below the standing retention horizon (possible when
    history used explicit alpha ids like 'b2') must not be silently
    hidden from reads and reaped by the next expiry — the id REBASES
    above the horizon.  Explicit ids in the dead range raise loudly."""
    import pytest

    wh = StagingWarehouse(spark, str(tmp_path), account_id="exp5")
    _three_event_batches(spark, wh, "EV")
    wh.expire_snapshots("EV", keep_last=1)  # horizon=b2; ns ids sort < 'b2'

    late = spark.createDataFrame(
        [(9, "2024-01-09", "late")], "id long, day string, payload string"
    )
    r = wh.write(late, "EV", incremental=True)  # auto id
    assert r.records_written == 1
    assert (9, "2024-01-09", "late") in {
        tuple(x) for x in wh.read("ev").collect()
    }
    # the next expiry folds it into the new base instead of reaping it
    wh.expire_snapshots("EV", keep_last=1)
    assert (9, "2024-01-09", "late") in {
        tuple(x) for x in wh.read("ev").collect()
    }
    # explicit id in the dead range = caller error, loud
    with pytest.raises(ValueError, match="retention horizon"):
        wh.write(late, "EV", incremental=True, batch_id="a1")


def test_table_changes_null_order_value_is_not_delete(spark, tmp_path):
    """ADVICE r9: presence is an explicit flag, not order-col nullness —
    a live row whose order value is NULL at `to` must classify by
    null-safe comparison (update if it changed, absent if unchanged),
    never as a delete; order_col inside the pk raises."""
    import pytest

    wh = StagingWarehouse(spark, str(tmp_path), account_id="cdf2")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, None, "c")],
        "uid long, ver long, s string",
    )
    b2 = spark.createDataFrame(
        [(1, None, "a2"), (2, 20, "b"), (3, None, "c"), (4, 40, "d")],
        "uid long, ver long, s string",
    )
    wh.write(b1, "S", incremental=True, batch_id="b1")
    wh.write(b2, "S", incremental=True, batch_id="b2")
    wh.set_upsert_keys("S", ["uid"], "ver")

    fwd = {r["uid"]: r["_change_type"]
           for r in wh.table_changes("S", "b1", "b2").collect()}
    # uid 1: the NULL-ver b2 row never supersedes under the contract
    # (desc NULLS LAST), so the logical view keeps ver=10 — unchanged;
    # uid 2 unchanged; uid 3 lives with a NULL ver on BOTH sides —
    # unchanged (the pre-fix code inferred presence from ver nullness
    # and emitted it every diff); uid 4 new
    assert fwd == {4: "insert"}
    rev = {r["uid"]: r["_change_type"]
           for r in wh.table_changes("S", "b2", "b1").collect()}
    assert rev == {4: "delete"}

    wh.set_upsert_keys("S", ["uid", "ver"], "ver")
    with pytest.raises(ValueError, match="part of the pk"):
        wh.table_changes("S", "b1", "b2")


def test_rewrite_clustered_degenerate_stats(spark, tmp_path):
    """ADVICE r9: an empty table or an all-NULL z-dim has no min/max to
    bucket — fall back to a plain rewrite (reads identical, no crash);
    a non-numeric dim raises a clear TypeError."""
    import pytest

    wh = StagingWarehouse(spark, str(tmp_path), account_id="zdeg")
    empty = spark.createDataFrame([], "a long, b long, s string")
    wh.write(empty, "E", incremental=False)
    wh.rewrite_clustered("E", zorder_by=["a", "b"])  # no crash
    assert wh.read("e").count() == 0

    rows = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y")], "a long, b long, s string"
    )
    wh.write(rows, "N", incremental=False)
    before = {tuple(r) for r in wh.read("n").collect()}
    wh.rewrite_clustered("N", zorder_by=["a", "b"])  # b all-NULL
    assert {tuple(r) for r in wh.read("n").collect()} == before

    with pytest.raises(TypeError, match="non-numeric"):
        wh.rewrite_clustered("N", zorder_by=["s"])

    # DecimalType dims are numeric (min() returns decimal.Decimal) and
    # clustered fine before the r10 guard — pinned working (ADVICE r10)
    dec_rows = spark.createDataFrame(
        [(i, i * 7 % 5) for i in range(20)], "a long, p long"
    ).selectExpr("a", "CAST(p AS DECIMAL(12,2)) AS p")
    wh.write(dec_rows, "D", incremental=False)
    before_d = {(r["a"], float(r["p"])) for r in wh.read("d").collect()}
    wh.rewrite_clustered("D", zorder_by=["a", "p"])
    assert {(r["a"], float(r["p"])) for r in wh.read("d").collect()} == before_d


def test_append_feed_composes_with_keyed_cdc_apply(spark, tmp_path):
    """End-to-end CDC on plain parquet (VERDICT r9 #6): an append-only
    SOURCE table's batch-watermark change feed, applied batch-by-batch
    into a TARGET under an upsert contract, reproduces exactly the
    latest-per-key state of the source — capture needs no pk, apply
    resolves newest-wins."""
    src = StagingWarehouse(spark, str(tmp_path / "src"), account_id="cdc")
    tgt = StagingWarehouse(spark, str(tmp_path / "tgt"), account_id="cdc")
    rows = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"),      # b1
         (1, 11, "a2"), (3, 30, "c"),     # b2: update uid1 + insert uid3
         (2, 22, "b2")],                  # b3: update uid2
        "uid long, ver long, s string",
    )
    src.write(rows.filter("ver IN (10, 20)"), "RAW", incremental=True, batch_id="b1")
    src.write(rows.filter("ver IN (11, 30)"), "RAW", incremental=True, batch_id="b2")
    src.write(rows.filter("ver = 22"), "RAW", incremental=True, batch_id="b3")

    tgt.set_upsert_keys("STATE", ["uid"], "ver")
    # initial load = snapshot at b1, then one incremental apply per poll
    tgt.write(src.read("RAW", as_of="b1"), "STATE", incremental=True, batch_id="load-b1")
    for lo, hi in [("b1", "b2"), ("b2", "b3")]:
        feed = src.table_changes("RAW", lo, hi)
        assert feed.select("_change_type").distinct().collect()[0][0] == "insert"
        tgt.write(feed.drop("_change_type"), "STATE", incremental=True,
                  batch_id=f"apply-{hi}")

    got = {tuple(r) for r in tgt.read("STATE").collect()}
    assert got == {(1, 11, "a2"), (2, 22, "b2"), (3, 30, "c")}


def test_append_feed_respects_retention_horizon(spark, tmp_path):
    """The append feed has the same addressability contract as
    read(as_of=...): a `from` below the expiry horizon raises instead of
    silently returning a partial feed, and a feed above it still prunes
    to the new batches only (the retention base never leaks in)."""
    import pytest

    from priority_data_pipeline_postgres_db_spark.operators.staging import (
        SnapshotExpiredError,
    )

    wh = StagingWarehouse(spark, str(tmp_path), account_id="cdc2")
    _three_event_batches(spark, wh, "EV")
    wh.expire_snapshots("EV", keep_last=1)  # horizon=b2, base holds b1+b2
    with pytest.raises(SnapshotExpiredError):
        wh.table_changes("EV", "b1", "b3")
    feed = wh.table_changes("EV", "b2", "b3").collect()
    assert {r["id"] for r in feed} == {3, 4}  # b3's rows only, no base rows


def _euler_pairs(ops):
    """Deterministic Eulerian circuit over the complete digraph on
    ``ops`` (self-loops included): a sequence visiting EVERY ordered
    pair of ops as consecutive elements exactly once — the full
    maintenance x write-mode interaction matrix in one walk."""
    edges = {a: [b for b in ops] for a in ops}
    stack, path = [ops[0]], []
    while stack:
        v = stack[-1]
        if edges[v]:
            stack.append(edges[v].pop(0))
        else:
            path.append(stack.pop())
    path.reverse()
    assert len(path) == len(ops) ** 2 + 1
    return path


@__import__("pytest").mark.parametrize("layout", ["flat", "hive"])
@__import__("pytest").mark.parametrize("pre_marker", [False, True])
def test_maintenance_write_mode_matrix(spark, tmp_path, layout, pre_marker):
    """VERDICT r9 #5: every retention/maintenance feature interacts with
    every write mode — r9 found 3 real bugs only by corner-probing
    combinations.  This sweeps the FULL matrix {append, full refresh,
    compact, expire, rewrite, table_changes} x {flat, hive-partitioned}
    x {standing expiry marker present/absent} as one Eulerian walk
    (every ordered pair of ops occurs consecutively), asserting the
    logical read against an independent pure-Python newest-wins model
    after every single op."""
    part = ["day"] if layout == "hive" else None
    wh = StagingWarehouse(
        spark, str(tmp_path), account_id=f"mx_{layout}_{int(pre_marker)}"
    )
    wh.set_upsert_keys("T", ["id"], "ver")
    model: dict[int, tuple] = {}
    ver = [0]

    def rows(ids):
        ver[0] += 1
        data = [(i, ver[0], f"d{i % 2}", f"v{ver[0]}.{i}") for i in ids]
        return (
            spark.createDataFrame(
                data, "id long, ver long, day string, val string"
            ),
            data,
        )

    def op_append():
        df, data = rows([1 + ver[0] % 4, 2 + ver[0] % 3])
        wh.write(df, "T", incremental=True, partition_by=part)
        for i, v, d, s in data:
            if i not in model or v >= model[i][0]:
                model[i] = (v, d, s)

    def op_full_refresh():
        df, data = rows([1, 2, 3])
        wh.write(df, "T", incremental=False, partition_by=part)
        model.clear()
        for i, v, d, s in data:
            model[i] = (v, d, s)

    def op_compact():
        wh.compact("T", partition_by=part)

    def op_expire():
        wh.expire_snapshots("T", keep_last=1)

    def op_rewrite():
        wh.rewrite_clustered("T", zorder_by=["id", "ver"], partition_by=part)

    def op_changes():
        snaps = wh.snapshots("T")
        if len(snaps) >= 2:
            feed = wh.table_changes("T", snaps[0], snaps[-1])
            assert feed.count() >= 0  # executes cleanly on every state

    ops = {
        "append": op_append,
        "full_refresh": op_full_refresh,
        "compact": op_compact,
        "expire": op_expire,
        "rewrite": op_rewrite,
        "changes": op_changes,
    }

    op_full_refresh()
    op_append()
    if pre_marker:
        op_expire()  # standing marker before the walk starts

    for name in _euler_pairs(list(ops)):
        ops[name]()
        got = {r["id"]: (r["ver"], r["day"], r["val"])
               for r in wh.read("T").collect()}
        assert got == model, f"after {name} ({layout}, marker={pre_marker})"


def test_maintenance_random_walks_hold_read_identity(spark):
    """Beyond the pairwise Eulerian matrix: hypothesis drives random op
    WALKS (triple+ interactions, varied op multiplicity) against the
    same independent newest-wins model, read-checked after every op.
    Derandomized (fixed example set) so CI is stable; the generator
    covers both layouts and op sequences the matrix's single circuit
    never visits."""
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op_names = ["append", "full_refresh", "compact", "expire", "rewrite",
                "changes"]

    @settings(
        max_examples=4,
        deadline=None,
        derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        seq=st.lists(st.sampled_from(op_names), min_size=5, max_size=10),
        hive=st.booleans(),
    )
    def run_walk(seq, hive):
        part = ["day"] if hive else None
        wh = StagingWarehouse(
            spark, tempfile.mkdtemp(prefix="walk_"), account_id="w"
        )
        wh.set_upsert_keys("T", ["id"], "ver")
        model: dict[int, tuple] = {}
        ver = [0]

        def write(ids, incremental):
            ver[0] += 1
            data = [(i, ver[0], f"d{i % 2}", f"v{ver[0]}") for i in ids]
            df = spark.createDataFrame(
                data, "id long, ver long, day string, val string"
            )
            wh.write(df, "T", incremental=incremental, partition_by=part)
            if not incremental:
                model.clear()
            for i, v, d, s in data:
                if i not in model or v >= model[i][0]:
                    model[i] = (v, d, s)

        ops = {
            "append": lambda: write([1 + ver[0] % 3, 2 + ver[0] % 4], True),
            "full_refresh": lambda: write([1, 2, 3], False),
            "compact": lambda: wh.compact("T", partition_by=part),
            "expire": lambda: wh.expire_snapshots("T", keep_last=1),
            "rewrite": lambda: wh.rewrite_clustered(
                "T", zorder_by=["id", "ver"], partition_by=part
            ),
            "changes": lambda: (
                wh.table_changes("T", wh.snapshots("T")[0],
                                 wh.snapshots("T")[-1]).count()
                if len(wh.snapshots("T")) >= 2 else None
            ),
        }
        write([1, 2], False)
        for name in seq:
            ops[name]()
            got = {r["id"]: (r["ver"], r["day"], r["val"])
                   for r in wh.read("T").collect()}
            assert got == model, (seq, name, hive)

    run_walk()
