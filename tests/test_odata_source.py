"""OData DataSource: partitioned page reads, $filter pushdown, $top probe,
$expand nested reads — all through real Python workers via the fake
transport (sources.odata)."""

import pytest
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.sources.odata import (
    _FAKE_N,
    ODataDataSource,
    build_url,
    fake_transport,
    filters_to_odata,
)
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNull


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(ODataDataSource)


SCHEMA_DDL = "ORDNAME string, CURDATE timestamp, QPRICE double, ORD bigint"


def read_orders(spark, **opts):
    base = dict(
        uri="fake://tenant/odata",
        entity="ORDERS",
        transport="fake",
        pagesize="10",
        schema_ddl=SCHEMA_DDL,
    )
    base.update(opts)
    r = spark.read.format("odata")
    for k, v in base.items():
        r = r.option(k, v)
    return r.load()


def test_full_scan_partitioned_pages(spark):
    df = read_orders(spark)
    assert df.count() == _FAKE_N
    # 57 rows / 10 per page → 6 partitions (the reference's single-fetch
    # gap fixed: SURVEY.md §2.9)
    assert df.rdd.getNumPartitions() == 6
    assert df.select(F.countDistinct("ORDNAME")).first()[0] == _FAKE_N


def test_filter_pushdown_reaches_tenant(spark):
    df = read_orders(spark).filter(F.col("CURDATE") >= "2024-01-20")
    rows = df.collect()
    # fake tenant applies the $filter server-side. Boundary is 2024-01-20
    # 00:00 UTC; tenant rows are day d (1..28) at +02:00 = day d-1 22:00
    # UTC, so only d >= 21 passes → i%28 in 20..27
    expected = sum(1 for i in range(_FAKE_N) if (i % 28) >= 20)
    assert len(rows) == expected == 16
    # and the partition planner saw the filtered count: fewer pages
    assert df.rdd.getNumPartitions() == 2  # 16 rows / 10 per page


def test_limit_probe(spark):
    assert read_orders(spark).limit(1).count() == 1


def test_values_decoded(spark):
    row = read_orders(spark).orderBy("ORD").first()
    assert row["ORDNAME"] == "SO00000"
    assert row["QPRICE"] == 100.0
    # '2024-01-01T00:00:00+02:00' → UTC-naive 2023-12-31 22:00
    assert row["CURDATE"].isoformat() == "2023-12-31T22:00:00"


def test_expand_nested_subform(spark):
    ddl = (
        "ORDNAME string, CURDATE timestamp, QPRICE double, ORD bigint, "
        "ORDERITEMS_SUBFORM array<struct<ORDNAME: string, KLINE: bigint, TQUANT: double>>"
    )
    df = read_orders(spark, entity="ORDERS_EXPANDED", expand="ORDERITEMS", schema_ddl=ddl)
    exploded = df.select("ORDNAME", F.explode("ORDERITEMS_SUBFORM").alias("i"))
    n_items = exploded.count()
    expected = sum((i % 3) for i in range(_FAKE_N))
    assert n_items == expected
    assert exploded.filter(F.col("i.KLINE").isNull()).count() == 0


def test_url_builder_matches_reference_shapes():
    url = build_url(
        "https://x/odata/", "ORDERS",
        filter_clause="CURDATE ge 2020-05-30T00:00:00+03:00",
        expand=["ORDERITEMS", "SHIP"], top=1,
    )
    # $expand gets the _SUBFORM suffix + comma join (priorityDataSource.py:686-693)
    assert "$expand=ORDERITEMS_SUBFORM,SHIP_SUBFORM" in url
    # the filter clause is percent-encoded: raw spaces are illegal in a
    # request line and a raw '+' offset would decode server-side as a space
    assert "$filter=CURDATE%20ge%202020-05-30T00%3A00%3A00%2B03%3A00" in url
    assert url.endswith("$top=1")
    import urllib.parse

    decoded = urllib.parse.unquote(url)
    assert "CURDATE ge 2020-05-30T00:00:00+03:00" in decoded


def test_filters_to_odata_translation():
    from datetime import datetime

    clause, rest = filters_to_odata(
        [
            GreaterThanOrEqual(("curdate",), datetime(2024, 1, 1)),
            EqualTo(("ordname",), "SO'1"),
            IsNull(("qprice",)),
        ],
        {"curdate": "CURDATE", "ordname": "ORDNAME"},
    )
    # datetimeoffset literals unquoted; string literals quoted with ''-escape
    assert clause == "CURDATE ge 2024-01-01T00:00:00 and ORDNAME eq 'SO''1'"
    assert len(rest) == 1 and isinstance(rest[0], IsNull)


def test_fake_transport_count_endpoint():
    body = fake_transport("fake://t/ORDERS/$count?", {})
    assert body["count"] == _FAKE_N


@pytest.fixture(scope="module")
def http_tenant():
    """A real HTTP server wrapping the fake tenant: JSON pages with a JSON
    content type, $metadata as EDMX XML with an XML content type — the
    exact shape a live tenant serves (priorityDataSource.py:349-358)."""
    import json as jsonlib
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from priority_data_pipeline_postgres_db_spark.sources.odata import fake_transport

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = fake_transport("fake://tenant" + self.path, {})
            if isinstance(body, str):
                payload, ctype = body.encode(), "application/xml;charset=utf-8"
            else:
                payload, ctype = jsonlib.dumps(body).encode(), "application/json"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/odata"
    srv.shutdown()


def test_http_transport_metadata_is_raw_xml(http_tenant):
    """The transport must NOT json.loads the EDMX document (VERDICT r1 #1)."""
    from priority_data_pipeline_postgres_db_spark.sources.odata import http_transport

    body = http_transport(http_tenant + "/$metadata", {})
    assert isinstance(body, str) and "<edmx:Edmx" in body
    # JSON endpoints still parse
    count = http_transport(http_tenant + "/ORDERS/$count", {})
    assert count["count"] == _FAKE_N


def test_schema_inference_over_real_http(spark, http_tenant):
    """End-to-end over the http transport with NO schema override: schema()
    fetches $metadata (XML), the registry derives the struct (PK→string,
    lowercased names), pages stream back as JSON."""
    df = (
        spark.read.format("odata")
        .option("uri", http_tenant)
        .option("entity", "ORDERS")
        .option("transport", "http")
        .option("pagesize", "10")
        .load()
    )
    assert df.columns == ["ordname", "curdate", "qprice", "ord"]
    assert df.schema["ordname"].dataType.simpleString() == "string"  # PK coerced
    assert df.count() == _FAKE_N
    assert df.select(F.countDistinct("ordname")).first()[0] == _FAKE_N


def test_entity_source_uses_registry_schema(spark):
    """ODataEntitySource resolves schemas from the registry: lowercase
    engine-side names, source-case JSON keys mapped via sourceField
    metadata, PK coerced to string."""
    from priority_data_pipeline_postgres_db_spark.plans.pipeline import ODataEntitySource
    from priority_data_pipeline_postgres_db_spark.sources.metadata import SchemaRegistry

    edmx = """<edmx:Edmx xmlns:edmx="e"><edmx:DataServices><Schema xmlns="s">
     <EntityType Name="ORDERS"><Key><PropertyRef Name="ORDNAME"/></Key>
      <Property Name="ORDNAME" Type="Edm.String"/>
      <Property Name="CURDATE" Type="Edm.DateTimeOffset"/>
      <Property Name="ORD" Type="Edm.Int64"/>
     </EntityType></Schema></edmx:DataServices></edmx:Edmx>"""
    src = ODataEntitySource(
        uri="fake://t/odata",
        transport="fake",
        page_size=20,
        registry=SchemaRegistry.from_edmx(edmx),
    )
    df = src.read(spark, {"EntityID": "ORDERS", "expand": []})
    assert df.columns == ["ordname", "curdate", "ord"]
    row = df.orderBy("ord").first()
    assert row["ordname"] == "SO00000" and row["ord"] == 0
    assert df.count() == _FAKE_N


# --------------------------------------------------------------------------
# streaming reader (watermark-offset poll)
# --------------------------------------------------------------------------


@pytest.fixture()
def growing_tenant():
    """A live HTTP tenant over a MUTABLE row list (append between polls to
    simulate new source rows), speaking the same minimal OData the fake
    does: $count, $skip/$top, `FIELD ge <iso>`."""
    import json as jsonlib
    import re as relib
    import threading
    import urllib.parse as up
    from datetime import datetime as dtt
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    rows: list[dict] = [
        {
            "ORDNAME": f"SO{i:03d}",
            "CURDATE": f"2024-02-0{(i % 3) + 1}T00:00:00+02:00",
            "ORD": i,
        }
        for i in range(5)
    ]

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            path, _, query = self.path.partition("?")
            params = {
                k: up.unquote(v)
                for k, v in (p.split("=", 1) for p in query.split("&") if "=" in p)
            }
            out = list(rows)
            m = relib.match(r"(\w+) ge ([0-9T:+\-\.]+)", params.get("$filter", ""))
            if m:
                bound = dtt.fromisoformat(m.group(2))
                out = [
                    r for r in out if dtt.fromisoformat(r[m.group(1)]) >= bound
                ]
            out.sort(key=lambda r: r["ORDNAME"])
            skip = int(params.get("$skip", 0))
            top = int(params.get("$top", len(out)))
            payload = jsonlib.dumps({"value": out[skip : skip + top]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/odata", rows
    srv.shutdown()


def _stream_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("ordname", T.StringType(), metadata={"sourceField": "ORDNAME", "keyFlag": True}),
            T.StructField("curdate", T.TimestampType(), metadata={"sourceField": "CURDATE"}),
            T.StructField("ord", T.LongType(), metadata={"sourceField": "ORD"}),
        ]
    )


def _mutating_tenant_transport(rows, mutate_after_first_page):
    """In-process OData transport over a MUTABLE (ts, pk)-ordered list that
    runs ``mutate_after_first_page`` once, right after serving the first
    page — the mid-poll concurrent-insert race (ADVICE r4)."""
    import re as relib
    import urllib.parse as up
    from datetime import datetime as dtt

    state = {"calls": 0}

    def transport(url, headers):
        path, _, query = url.partition("?")
        params = {
            k: up.unquote(v)
            for k, v in (p.split("=", 1) for p in query.split("&") if "=" in p)
        }
        out = list(rows)
        m = relib.match(r"(\w+) ge ([0-9T:+\-\.]+)", params.get("$filter", ""))
        if m:
            bound = dtt.fromisoformat(m.group(2))
            out = [r for r in out if dtt.fromisoformat(r[m.group(1)]) >= bound]
        out.sort(key=lambda r: (dtt.fromisoformat(r["CURDATE"]), r["ORDNAME"]))
        skip = int(params.get("$skip", 0))
        top = int(params.get("$top", len(out)))
        page = out[skip : skip + top]
        state["calls"] += 1
        if state["calls"] == 1:
            mutate_after_first_page()
        return {"value": page}

    return transport


def _race_rows():
    return [
        {
            "ORDNAME": f"SO{i:03d}",
            "CURDATE": f"2024-03-{i + 1:02d}T00:00:00+02:00",
            "ORD": i,
        }
        for i in range(7)
    ]


def test_stream_reader_keyset_paging_survives_midpoll_insert():
    """paging=keyset (ADVICE r4): a row inserted between page fetches
    cannot shift the page window — the poll returns every pre-poll row
    exactly once.  The default $skip mode demonstrably duplicates under
    the same insert, which is why keyset exists."""
    from priority_data_pipeline_postgres_db_spark.sources.odata import (
        TRANSPORTS,
        ODataStreamReader,
    )

    def run(paging):
        rows = _race_rows()

        def insert_early():
            # earliest timestamp → lands at global offset 0, shifting
            # every later row right by one
            rows.append(
                {"ORDNAME": "SO999", "CURDATE": "2024-02-01T00:00:00+02:00", "ORD": 999}
            )

        TRANSPORTS["race-test"] = _mutating_tenant_transport(rows, insert_early)
        try:
            r = ODataStreamReader(
                _stream_schema(),
                {"uri": "fake://tenant", "entity": "ORDERS",
                 "filterfield": "CURDATE", "transport": "race-test",
                 "pagesize": "3", "paging": paging},
            )
            batch, _ = r.read(r.initialOffset())
            return [b[0] for b in batch]
        finally:
            del TRANSPORTS["race-test"]

    keyset = run("keyset")
    assert keyset == [f"SO{i:03d}" for i in range(7)]  # each exactly once

    skip = run("skip")
    assert len(skip) != len(set(skip))  # the documented offset-shift dup


def test_stream_reader_polls_only_new_rows(growing_tenant):
    """Batch 1 delivers the backlog; rows appended between polls (one
    SHARING the boundary timestamp) arrive exactly once; an idle poll
    leaves the offset untouched; replay is exact."""
    from priority_data_pipeline_postgres_db_spark.sources.odata import (
        ODataStreamReader,
    )

    uri, rows = growing_tenant
    r = ODataStreamReader(
        _stream_schema(),
        {"uri": uri, "entity": "ORDERS", "filterfield": "CURDATE",
         "transport": "http", "pagesize": "3"},
    )
    start = r.initialOffset()
    batch1, off1 = r.read(start)
    batch1 = list(batch1)
    assert len(batch1) == 5
    assert off1["wm"] == "2024-02-03T00:00:00+02:00"  # max ts among backlog

    # idle poll: nothing new, offset unchanged
    empty, off_idle = r.read(off1)
    assert list(empty) == [] and off_idle == off1

    # two new rows: one at the BOUNDARY timestamp (tie on wm, pk breaks),
    # one strictly later
    rows.append({"ORDNAME": "SO900", "CURDATE": "2024-02-03T00:00:00+02:00", "ORD": 900})
    rows.append({"ORDNAME": "SO901", "CURDATE": "2024-02-04T00:00:00+02:00", "ORD": 901})
    batch2, off2 = r.read(off1)
    batch2 = list(batch2)
    assert [b[0] for b in batch2] == ["SO900", "SO901"]
    assert off2 == {"wm": "2024-02-04T00:00:00+02:00", "key": "SO901"}

    # exact replay of a committed range (retry semantics)
    replay = list(r.readBetweenOffsets(off1, off2))
    assert replay == batch2
    replay1 = list(r.readBetweenOffsets(start, off1))
    assert sorted(replay1) == sorted(batch1)


def test_stream_source_end_to_end_availablenow(spark, tmp_path):
    """spark.readStream.format('odata') drains the fake tenant in one
    AvailableNow batch; the memory sink equals the batch read."""
    import tempfile

    df = (
        spark.readStream.format("odata")
        .option("uri", "fake://tenant")
        .option("entity", "ORDERS")
        .option("transport", "fake")
        .option("filterfield", "CURDATE")
        .option("streamkey", "ORDNAME")  # schema_ddl carries no keyFlag metadata
        .option("pagesize", "40")
        # a DDL schema carries no sourceField metadata, so field names must
        # BE the source names (the registry path renames/lowercases instead)
        .option(
            "schema_ddl",
            "ORDNAME string, CURDATE timestamp, QPRICE decimal(18,4), ORD long",
        )
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("odata_stream_e2e")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(dir=tmp_path))
        .start()
    )
    q.awaitTermination()
    got = spark.table("odata_stream_e2e")
    assert got.count() == _FAKE_N
    assert got.select(F.countDistinct("ordname")).first()[0] == _FAKE_N


def test_stream_odata_to_atomic_staging_exactly_once(spark, tmp_path):
    """The reference's full ELT loop as ONE streaming pipeline:
    readStream('odata') → foreachBatch atomic staging commit.  A second
    run over the SAME checkpoint is a no-op (offsets say caught-up), and
    a replayed epoch hits the idempotent batch-id guard — rows land
    exactly once end to end."""
    import os

    from priority_data_pipeline_postgres_db_spark.operators.staging import (
        StagingWarehouse,
    )
    from priority_data_pipeline_postgres_db_spark.streaming.incremental import (
        incremental_to_staging_atomic,
    )

    wh = StagingWarehouse(spark, str(tmp_path / "wh"), account_id="odata")
    ckpt = str(tmp_path / "ckpt")

    def run():
        df = (
            spark.readStream.format("odata")
            .option("uri", "fake://tenant")
            .option("entity", "ORDERS")
            .option("transport", "fake")
            .option("filterfield", "CURDATE")
            .option("streamkey", "ORDNAME")
            .option("pagesize", "40")
            .option(
                "schema_ddl",
                "ORDNAME string, CURDATE timestamp, QPRICE decimal(18,4), ORD long",
            )
            .load()
        )
        q = incremental_to_staging_atomic(df, wh, "orders_stream", ckpt)
        q.awaitTermination()

    run()
    first = wh.read("orders_stream")
    assert first.count() == _FAKE_N
    assert first.select(F.countDistinct("ORDNAME")).first()[0] == _FAKE_N
    # second drain over the same checkpoint: source is caught up → no new
    # rows, no duplicate batches
    run()
    again = wh.read("orders_stream")
    assert again.count() == _FAKE_N
    assert len(wh.snapshots("orders_stream")) <= 2  # at most an empty epoch


def test_stream_reader_serializes_anchor_as_typed_literal():
    """ADVICE r5: keyset re-anchoring (and the initial watermark clause)
    must serialize the bound through the typed-literal formatter, not a
    raw str() of the server's row value.  This tenant echoes Z-suffixed
    fractional-second timestamps — a verbatim echo is not the canonical
    OData datetimeoffset literal and a strict server 400s on it."""
    import re as relib
    import urllib.parse as up
    from datetime import datetime as dtt

    from priority_data_pipeline_postgres_db_spark.sources.odata import (
        TRANSPORTS,
        ODataStreamReader,
    )

    rows = [
        {"ORDNAME": f"SO{i:03d}", "CURDATE": f"2024-03-{i + 1:02d}T00:00:00.250Z", "ORD": i}
        for i in range(7)
    ]
    seen_bounds = []

    def strict_transport(url, headers):
        path, _, query = url.partition("?")
        params = {
            k: up.unquote(v)
            for k, v in (p.split("=", 1) for p in query.split("&") if "=" in p)
        }
        flt = params.get("$filter", "")
        if flt:
            m = relib.match(r"(\w+) ge (.+)$", flt)
            assert m, flt
            bound = m.group(2)
            seen_bounds.append(bound)
            # a strict tenant accepts the canonical +HH:MM offset form
            # only — a verbatim 'Z' echo is the bug being pinned here
            assert bound.endswith("+00:00"), f"non-canonical literal: {bound}"
            bdt = dtt.fromisoformat(bound)
            out = [r for r in rows if dtt.fromisoformat(r["CURDATE"]) >= bdt]
        else:
            out = list(rows)
        out.sort(key=lambda r: (dtt.fromisoformat(r["CURDATE"]), r["ORDNAME"]))
        skip = int(params.get("$skip", 0))
        top = int(params.get("$top", len(out)))
        return {"value": out[skip : skip + top]}

    TRANSPORTS["strict-literal"] = strict_transport
    try:
        r = ODataStreamReader(
            _stream_schema(),
            {"uri": "fake://tenant", "entity": "ORDERS",
             "filterfield": "CURDATE", "transport": "strict-literal",
             "pagesize": "3", "paging": "keyset"},
        )
        batch, off = r.read(r.initialOffset())
        names = [b[0] for b in batch]
    finally:
        del TRANSPORTS["strict-literal"]

    assert names == [f"SO{i:03d}" for i in range(7)]  # each exactly once
    # keyset paging re-anchored at least once, and every bound the
    # server saw was the canonical typed literal
    assert seen_bounds and all(b.endswith("+00:00") for b in seen_bounds)
    # the offset keeps the RAW server form (replay fidelity) — only the
    # wire literal is canonicalized
    assert off["wm"] == "2024-03-07T00:00:00.250Z"


# ---------------------------------------------------------------------------
# $select projection pushdown (VERDICT r6 #6)
# ---------------------------------------------------------------------------


def test_select_pushdown_reaches_tenant(spark):
    """The ``select`` option prunes the schema (keys always kept) AND
    reaches the wire as ``$select=`` with exactly the mapped source
    fields — the reference prunes only post-fetch
    (priorityDataSource.py:771-776); pushing it to the source is the
    difference between transferring two columns and full payloads."""
    import tempfile

    log = tempfile.NamedTemporaryFile(  # noqa: SIM115 — inspected after run
        mode="r", suffix=".urllog", delete=False
    )
    df = (
        spark.read.format("odata")
        .option("uri", "fake://tenant/odata")
        .option("entity", "ORDERS")
        .option("transport", "fake")
        .option("pagesize", "10")
        .option("select", "QPRICE")
        .option("urllog", log.name)
        .load()
    )
    # schema pruned to the selection + the key field (identifiers
    # lowercased by the registry, P4)
    assert [f.name for f in df.schema.fields] == ["ordname", "qprice"]
    rows = df.collect()
    urls = [u.strip() for u in open(log.name) if u.strip()]
    import os as _os

    _os.unlink(log.name)
    assert len(rows) == _FAKE_N
    assert {r["ordname"] for r in rows} == {f"SO{i:05d}" for i in range(_FAKE_N)}
    assert all(r["qprice"] is not None for r in rows)
    page_urls = [u for u in urls if "$skip=" in u]
    assert page_urls, urls
    assert all("$select=ORDNAME,QPRICE" in u for u in page_urls)
    # $metadata / $count probes carry no $select
    assert all("$select" not in u for u in urls if "$skip=" not in u)


def test_select_unknown_field_fails_loud(spark):
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown field"):
        (
            spark.read.format("odata")
            .option("uri", "fake://tenant/odata")
            .option("entity", "ORDERS")
            .option("transport", "fake")
            .option("select", "NOPE")
            .load()
        )
