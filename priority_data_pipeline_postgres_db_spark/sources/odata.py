"""OData source — the reference's S1-S4 scan surface as a Spark Python
DataSource (SURVEY.md §2.1, §4).

Reference behaviors reproduced (priorityDataSource.py:629-736):

- Basic-auth entity GET of ``<uri><EntityID>`` returning ``{"value": [...]}``
- ``$filter <field> ge <ts-with-offset>`` predicate pushdown (S2, built at
  :646-675) — here driven by Catalyst through ``pushFilters``
- ``$expand=A_SUBFORM,B_SUBFORM`` nested child reads (S3, :686-693)
- ``$top=1`` probe (S4, :699-711) — ``df.limit(1)`` reaches the source as a
  single small page

and the reference gap deliberately fixed (SURVEY.md §2.9): **pagination**.
The reference fetches every entity in ONE request; this source plans
``$skip/$top`` page windows as Spark partitions so a 100 TB entity scan is
N parallel page readers, not one giant driver fetch. Pages are stabilized
with ``$orderby`` on the key so windows don't shear under concurrent writes.

Python workers re-import this module to execute ``read``; transports are
therefore resolved by NAME from options (a closure can't ride along).  The
``fake`` transport serves deterministic synthetic pages — it exists so the
full partition-planning → page-fetch → row-decode path runs in real Python
workers under test.
"""

from __future__ import annotations

import base64
import json
import math
import re
import urllib.parse
import urllib.request
from datetime import datetime, timezone
from typing import Any, Callable, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

Transport = Callable[[str, dict], "dict | str"]
"""(url, headers) -> parsed JSON body (dict) or raw text (non-JSON
responses — the ``$metadata`` EDMX document is XML)."""


def http_transport(url: str, headers: dict) -> dict | str:
    """HTTP GET with bounded exponential-backoff retry — page reads run in
    worker tasks, and one transient 5xx must not fail a whole Spark task
    attempt (the reference had no retry at all; a flaky tenant failed the
    entity, priorityDataSource.py:173-184).

    Content-type aware: JSON bodies are parsed; anything else (notably the
    ``$metadata`` EDMX **XML** document, priorityDataSource.py:349-358)
    comes back as raw text for the caller to parse.  A ``$metadata`` URL is
    always treated as text even if the server omits the content type.
    """
    import time

    is_metadata = url.split("?", 1)[0].rstrip("/").endswith("$metadata")
    last_err: Exception | None = None
    for attempt in range(4):
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310 — https URIs from config
                ctype = (resp.headers.get("Content-Type") or "").lower()
                body = resp.read().decode("utf-8")
            if is_metadata or ("json" not in ctype and ctype):
                return body
            return json.loads(body)
        except Exception as ex:  # noqa: BLE001 — urllib raises several families
            last_err = ex
            if attempt < 3:
                time.sleep(0.5 * 2**attempt)
    raise last_err  # type: ignore[misc]


# --------------------------------------------------------------------------
# fake transport (deterministic synthetic tenant for tests)
# --------------------------------------------------------------------------

_FAKE_N = 57  # deliberately not a multiple of the page size


def _fake_rows(entity: str) -> list[dict]:
    rows = []
    for i in range(_FAKE_N):
        row = {
            "ORDNAME": f"SO{i:05d}",
            "CURDATE": f"2024-01-{(i % 28) + 1:02d}T00:00:00+02:00",
            "QPRICE": round(100.0 + i * 1.5, 3),
            "ORD": i,
        }
        if entity == "ORDERS_EXPANDED":
            row["ORDERITEMS_SUBFORM"] = [
                {"ORDNAME": row["ORDNAME"], "KLINE": k, "TQUANT": float(k)}
                for k in range(1, (i % 3) + 1)
            ]
        rows.append(row)
    return rows


_FAKE_EDMX = """<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
 <edmx:DataServices><Schema xmlns="http://docs.oasis-open.org/odata/ns/edm">
  <EntityType Name="ORDERS">
   <Key><PropertyRef Name="ORDNAME"/></Key>
   <Property Name="ORDNAME" Type="Edm.String" Nullable="false"/>
   <Property Name="CURDATE" Type="Edm.DateTimeOffset"/>
   <Property Name="QPRICE" Type="Edm.Decimal"/>
   <Property Name="ORD" Type="Edm.Int64"/>
  </EntityType>
 </Schema></edmx:DataServices></edmx:Edmx>"""


def fake_transport(url: str, headers: dict) -> dict | str:
    """Minimal OData tenant: understands $metadata (raw EDMX XML, like a
    real tenant), $count, $skip, $top, $orderby and
    ``$filter=CURDATE ge <iso>``."""
    path, _, query = url.partition("?")
    segments = [s for s in path.rstrip("/").split("/") if s]
    if segments[-1] == "$metadata":
        return _FAKE_EDMX
    is_count = segments[-1] == "$count"
    entity = segments[-2] if is_count else segments[-1]
    params = {
        k: urllib.parse.unquote(v)
        for k, v in (p.split("=", 1) for p in query.split("&") if "=" in p)
    }
    rows = _fake_rows(entity)
    flt = params.get("$filter", "")
    m = re.match(r"(\w+) ge ([0-9T:+\-\.]+)", flt)
    if m:
        fld, bound = m.group(1), m.group(2)
        bdt = datetime.fromisoformat(bound)
        rows = [r for r in rows if datetime.fromisoformat(r[fld]) >= bdt]
    ob = params.get("$orderby", "")
    if ob:
        # honor the requested sort (real tenants do; keyset paging
        # depends on it) — ISO-timestamp strings sort as datetimes
        fields = [s.strip() for s in ob.split(",") if s.strip()]

        def _k(r):
            out = []
            for f in fields:
                v = r.get(f)
                if isinstance(v, str):
                    try:
                        v = datetime.fromisoformat(v)
                    except ValueError:
                        pass
                out.append(v)
            return out

        rows.sort(key=_k)
    else:
        rows.sort(key=lambda r: r["ORDNAME"])
    if is_count:
        return {"count": len(rows)}
    sel = params.get("$select", "")
    if sel:
        keep = {s.strip() for s in sel.split(",") if s.strip()}
        rows = [{k: v for k, v in r.items() if k in keep} for r in rows]
    skip = int(params.get("$skip", 0))
    top = int(params.get("$top", len(rows)))
    return {"value": rows[skip : skip + top]}


TRANSPORTS: dict[str, Transport] = {
    "http": http_transport,
    "fake": fake_transport,
}


# --------------------------------------------------------------------------
# URL building (reference semantics: priorityDataSource.py:646-721)
# --------------------------------------------------------------------------


def auth_headers(user: str, password: str) -> dict:
    """Basic-auth header (priorityDataSource.py:243-245)."""
    token = base64.b64encode(f"{user}:{password}".encode()).decode()
    return {"Authorization": f"Basic {token}", "Accept": "application/json"}


def build_url(
    uri: str,
    entity: str,
    *,
    filter_clause: str | None = None,
    expand: list[str] | None = None,
    select: list[str] | None = None,
    orderby: str | None = None,
    skip: int | None = None,
    top: int | None = None,
    count: bool = False,
) -> str:
    base = uri.rstrip("/") + "/" + entity + ("/$count" if count else "")
    # percent-encode values: a $filter clause carries spaces (illegal raw in
    # a request line) and '+' timezone offsets (decoded as space by the
    # server); commas and quotes stay literal for OData readability
    q = lambda v: urllib.parse.quote(str(v), safe="(),'$")  # noqa: E731
    params = []
    if filter_clause:
        params.append(f"$filter={q(filter_clause)}")
    if expand:
        # '<name>_SUBFORM' suffix + comma join (priorityDataSource.py:686-693)
        params.append("$expand=" + ",".join(f"{e}_SUBFORM" for e in expand))
    if select:
        # projection pushdown: the reference prunes only post-fetch
        # (priorityDataSource.py:771-776) — pushing $select means narrow
        # queries stop transferring full entity payloads over HTTP
        params.append("$select=" + ",".join(select))
    if orderby:
        params.append(f"$orderby={q(orderby)}")
    if skip is not None:
        params.append(f"$skip={skip}")
    if top is not None:
        params.append(f"$top={top}")
    return base + ("?" + "&".join(params) if params else "")


def _fmt_value(v: Any) -> str:
    if isinstance(v, datetime):
        return v.isoformat()  # OData datetimeoffset literals are unquoted
    if isinstance(v, str):
        # OData string literals are single-quoted, '' escapes a quote
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def filters_to_odata(filters: list[Filter], field_map: dict[str, str]) -> tuple[str, list[Filter]]:
    """Catalyst filters → OData $filter conjunction; returns (clause,
    unsupported). Comparison pushdown mirrors the reference's single
    ``<field> ge <ts>`` clause (S2) generalized to the five comparators."""
    ops = {
        GreaterThanOrEqual: "ge",
        GreaterThan: "gt",
        LessThanOrEqual: "le",
        LessThan: "lt",
        EqualTo: "eq",
    }
    clauses, unsupported = [], []
    for f in filters:
        op = ops.get(type(f))
        col = f.attribute[0] if op and len(f.attribute) == 1 else None
        if op and col and col in field_map:
            clauses.append(f"{field_map[col]} {op} {_fmt_value(f.value)}")
        else:
            unsupported.append(f)
    return " and ".join(clauses), unsupported


# --------------------------------------------------------------------------
# the DataSource
# --------------------------------------------------------------------------


class ODataPartition(InputPartition):
    def __init__(self, skip: int, top: int):
        self.skip = skip
        self.top = top


class ODataReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.options = options
        self.pushed_filter_clause = ""
        self._count: int | None = None

    # -- option plumbing ---------------------------------------------------
    @property
    def _transport(self) -> Transport:
        return TRANSPORTS[self.options.get("transport", "http")]

    def _log_url(self, url: str) -> None:
        """Debug/test hook: when the ``urllog`` option names a file,
        append every fetched URL to it.  Reads run in executor Python
        workers, where a test can't observe the transport directly —
        the append-only file is the cross-process window onto the wire
        (O_APPEND single-line writes stay whole on a local fs)."""
        path = self.options.get("urllog")
        if path:
            with open(path, "a") as fh:
                fh.write(url + "\n")

    @property
    def _headers(self) -> dict:
        user = self.options.get("user", "")
        return auth_headers(user, self.options.get("password", "")) if user else {}

    @property
    def _expand(self) -> list[str]:
        raw = self.options.get("expand", "")
        return [e for e in raw.split(",") if e]

    def _page_size(self) -> int:
        return int(self.options.get("pagesize", 1000))

    def _select_sources(self) -> list[str] | None:
        """$select field list (S2's projection twin).  When the ``select``
        option is set, ``ODataDataSource.schema`` has already pruned the
        schema to the selection plus key fields, so the wire-level list
        is simply this reader's schema mapped to source names — nav
        properties (subform arrays) ride $expand, not $select."""
        if not self.options.get("select"):
            return None
        return [
            f.metadata.get("sourceField", f.name)
            for f in self.schema.fields
            if not (
                isinstance(f.dataType, T.ArrayType)
                and isinstance(f.dataType.elementType, T.StructType)
            )
        ]

    def _orderby(self) -> str:
        """Page-window sort key. $skip/$top windows are only stable under a
        UNIQUE total order, so the default is the registry primary key
        (keyFlag metadata on the schema), not the first schema field — a
        non-unique sort lets rows straddling page boundaries duplicate or
        drop. A user-supplied ``orderby`` must likewise be a unique key."""
        explicit = self.options.get("orderby")
        if explicit:
            return explicit
        key_fields = [
            f.metadata.get("sourceField", f.name)
            for f in self.schema.fields
            if f.metadata.get("keyFlag")
        ]
        if key_fields:
            return ",".join(key_fields)
        first = self.schema.fields[0]
        return first.metadata.get("sourceField", first.name)

    # -- pushdown (S2) ------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        field_map = {f.name: f.metadata.get("sourceField", f.name) for f in self.schema.fields}
        clause, unsupported = filters_to_odata(list(filters), field_map)
        self.pushed_filter_clause = clause
        # pushed comparisons are EXACT (the tenant applies them) → only the
        # unsupported remainder needs Spark-side re-evaluation
        return iter(unsupported)

    # -- partition planning (pagination fix, SURVEY.md §2.9) ----------------
    def partitions(self) -> list[ODataPartition]:
        url = build_url(
            self.options["uri"],
            self.options["entity"],
            filter_clause=self.pushed_filter_clause or None,
            count=True,
        )
        self._log_url(url)
        body = self._transport(url, self._headers)
        total = int(body if isinstance(body, (int, str)) else body.get("count", 0))
        page = self._page_size()
        n_pages = max(1, math.ceil(total / page))
        return [ODataPartition(i * page, page) for i in range(n_pages)]

    # -- page read (S1) ------------------------------------------------------
    def read(self, partition: ODataPartition) -> Iterator[tuple]:
        url = build_url(
            self.options["uri"],
            self.options["entity"],
            filter_clause=self.pushed_filter_clause or None,
            expand=self._expand,
            select=self._select_sources(),
            orderby=self._orderby(),
            skip=partition.skip,
            top=partition.top,
        )
        self._log_url(url)
        body = self._transport(url, self._headers)
        fields = [
            (f.name, f.metadata.get("sourceField", f.name), f.dataType) for f in self.schema.fields
        ]
        for rec in body.get("value", []):
            yield tuple(_convert(rec.get(src), dtype) for _, src, dtype in fields)


def _convert(v: Any, dtype: T.DataType) -> Any:
    """EDM JSON value → Spark external type (driver-side type map §1.3)."""
    if v is None:
        return None
    if isinstance(dtype, T.TimestampType):
        dt = datetime.fromisoformat(v) if isinstance(v, str) else v
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    if isinstance(dtype, T.StringType):
        return str(v)
    if isinstance(dtype, T.LongType):
        return int(v)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dtype, T.DecimalType):
        from decimal import Decimal

        return Decimal(str(v))
    if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
        return [
            tuple(_convert(item.get(f.metadata.get("sourceField", f.name)), f.dataType) for f in dtype.elementType.fields)
            for item in v
        ]
    return v


class ODataDataSource(DataSource):
    """``spark.read.format("odata")`` — register with
    ``spark.dataSource.register(ODataDataSource)``.

    Options: uri, entity, user, password, expand (comma list, without the
    _SUBFORM suffix), select (comma list of logical column names — prunes
    the schema, key fields always kept, and pushes ``$select=`` to the
    tenant), pagesize, orderby, transport (http|fake), schema_ddl (skip
    the $metadata fetch; with schema_ddl the ``select`` option only
    controls the wire-level $select — the DDL stays the schema), urllog
    (debug: file path collecting every fetched URL).
    """

    @classmethod
    def name(cls) -> str:
        return "odata"

    def schema(self) -> T.StructType:
        ddl = self.options.get("schema_ddl")
        if ddl:
            # return the DDL string itself — parsing it here would need an
            # active SparkSession, which the instantiation context lacks
            return ddl
        # derive from $metadata (S5) via the schema registry
        from .metadata import SchemaRegistry, parse_edmx

        transport = TRANSPORTS[self.options.get("transport", "http")]
        user = self.options.get("user", "")
        headers = auth_headers(user, self.options.get("password", "")) if user else {}
        xml = transport(self.options["uri"].rstrip("/") + "/$metadata", headers)
        registry = SchemaRegistry(parse_edmx(xml if isinstance(xml, str) else xml["xml"]))
        struct = registry.struct(self.options["entity"], with_audit=False)
        raw_select = self.options.get("select", "")
        if not raw_select:
            return struct
        # projection pushdown: subset the schema to the selection, always
        # keeping key fields (the $skip/$top page order and downstream PK
        # propagation depend on them); registry field order is preserved
        wanted = {s.strip().lower() for s in raw_select.split(",") if s.strip()}
        unknown = wanted - {f.name.lower() for f in struct.fields}
        if unknown:
            raise ValueError(
                f"select option names unknown field(s) {sorted(unknown)} "
                f"on entity {self.options['entity']!r}"
            )
        kept = [
            f
            for f in struct.fields
            if f.name.lower() in wanted or f.metadata.get("keyFlag")
        ]
        return T.StructType(kept)

    def reader(self, schema: T.StructType) -> ODataReader:
        return ODataReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: T.StructType) -> "ODataStreamReader":
        return ODataStreamReader(schema, dict(self.options))


# --------------------------------------------------------------------------
# streaming reader: the reference's incremental poll as a first-class
# Structured Streaming source (spark.readStream.format("odata"))
# --------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class ODataStreamReader(SimpleDataSourceStreamReader):
    """Watermark-offset streaming over an OData entity: each micro-batch
    delivers the rows whose ``(filterfield, pk)`` exceeds the last
    committed offset — the reference's poll-every-N-minutes incremental
    refresh (priorityDataSource.py lastRun semantics), re-expressed as a
    source Structured Streaming manages: offsets live in the checkpoint,
    retried batches replay EXACTLY (``readBetweenOffsets``), and
    downstream gets watermarks/windows/exactly-once sinks for free.

    Correctness under ties: the server-side ``$filter`` is a coarse
    ``filterfield ge WM`` prefilter (every tenant speaks it, including
    the minimal fake), and the EXACT strict cut ``(ts, pk) > (WM, K)``
    is applied reader-side — rows sharing the boundary timestamp are
    fetched again and trimmed, never duplicated, never dropped.  The
    offset carries the raw timestamp literal plus the pk tie-break.

    Scale note: the Simple stream-reader API prefetches each batch on
    the driver by design — right for the poll tail (per-interval deltas);
    point the partitioned BATCH source at the same entity for backfills.
    """

    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.options = options
        self.filter_field = options["filterfield"]
        key_fields = [
            f.metadata.get("sourceField", f.name)
            for f in schema.fields
            if f.metadata.get("keyFlag")
        ]
        explicit = options.get("streamkey")
        first = schema.fields[0]
        self.pk_field = explicit or (
            key_fields[0] if key_fields else first.metadata.get("sourceField", first.name)
        )
        self._fields = [
            (f.name, f.metadata.get("sourceField", f.name), f.dataType)
            for f in schema.fields
        ]

    # -- offset plumbing ----------------------------------------------------
    def initialOffset(self) -> dict:
        return {"wm": self.options.get("startwm", ""), "key": ""}

    @staticmethod
    def _ts(raw: str) -> datetime:
        dt = datetime.fromisoformat(raw)
        return dt.astimezone(timezone.utc).replace(tzinfo=None) if dt.tzinfo else dt

    def _sort_key(self, rec: dict) -> tuple:
        return (self._ts(str(rec[self.filter_field])), str(rec[self.pk_field]))

    def _literal(self, raw: str) -> str:
        """Serialize a filter-field value as the same typed OData literal
        form ``_fmt_value`` gives the batch source's pushed ``$filter``
        (ADVICE r5): a raw ``str()`` of a server row value is not a valid
        literal on real tenants — e.g. a ``Z``-suffixed or
        fractional-second timestamp echoed verbatim 400s where the
        canonical ISO datetimeoffset form is accepted, and a string key
        needs its quotes.  Timestamp-typed fields round-trip through
        ``fromisoformat`` (tz preserved, canonical ``+HH:MM`` offset);
        string-typed fields are single-quoted; numerics pass through."""
        for _, src, dtype in self._fields:
            if src == self.filter_field:
                if isinstance(dtype, T.TimestampType):
                    return _fmt_value(datetime.fromisoformat(raw))
                if isinstance(dtype, T.StringType):
                    return _fmt_value(raw)
                break
        return raw

    def _offset_cut(self, off: dict) -> tuple | None:
        if not off.get("wm"):
            return None
        return (self._ts(off["wm"]), str(off.get("key", "")))

    # -- transport ----------------------------------------------------------
    def _fetch_ge(self, wm: str) -> list[dict]:
        """Fetch every row with ``filter_field ge wm``.

        Two paging modes (``options["paging"]``):

        - ``"skip"`` (default) — classic ``$skip/$top`` offset windows.
          KNOWN RACE (ADVICE r4): a row inserted between page fetches
          shifts offsets, so a page boundary can skip or duplicate rows
          within a single poll (the strict (ts, pk) cut only trims at
          the batch boundary, not mid-fetch).  Works against ANY server
          ordering, which is why it stays the default.
        - ``"keyset"`` — pagination re-anchors on the order key: after
          each full page the ``ge`` bound advances to the max
          filter-field value fetched and ``$skip`` counts only the
          already-consumed ties at that bound, so a concurrent insert
          with a later timestamp can never shift the page window.
          REQUIRES the tenant to honor ``$orderby=(filter_field, pk)``;
          uses only the same universally-spoken ``ge`` filter
          vocabulary.  Residual window: an insert tying the anchor
          timestamp exactly, mid-poll, with a smaller pk — the client-
          side (ts, pk) de-dup turns the duplicate half of that race
          into a no-op, and a skipped exact-tie row below the advancing
          watermark is the inherent late-data limit of (ts, pk)
          watermark streaming.
        """
        transport = TRANSPORTS[self.options.get("transport", "http")]
        user = self.options.get("user", "")
        headers = auth_headers(user, self.options.get("password", "")) if user else {}
        page = int(self.options.get("pagesize", 1000))
        orderby = f"{self.filter_field},{self.pk_field}"
        if self.options.get("paging", "skip") == "keyset":
            return self._fetch_ge_keyset(transport, headers, wm, page, orderby)
        clause = f"{self.filter_field} ge {self._literal(wm)}" if wm else None
        skip, rows = 0, []
        while True:
            url = build_url(
                self.options["uri"],
                self.options["entity"],
                filter_clause=clause,
                orderby=orderby,
                skip=skip,
                top=page,
            )
            vals = transport(url, headers).get("value", [])
            rows.extend(vals)
            if len(vals) < page:
                return rows
            skip += page

    def _fetch_ge_keyset(
        self, transport, headers: dict, wm: str, page: int, orderby: str
    ) -> list[dict]:
        rows: list[dict] = []
        anchor, n_at_anchor = wm, 0
        while True:
            clause = (
                f"{self.filter_field} ge {self._literal(anchor)}"
                if anchor
                else None
            )
            url = build_url(
                self.options["uri"],
                self.options["entity"],
                filter_clause=clause,
                orderby=orderby,
                skip=n_at_anchor,
                top=page,
            )
            vals = transport(url, headers).get("value", [])
            rows.extend(vals)
            if len(vals) < page:
                break
            # advance the ge bound to the last (max) timestamp fetched;
            # $skip then counts ONLY the consumed ties at that bound, so
            # inserts with later timestamps cannot shift the window
            anchor = str(rows[-1][self.filter_field])
            a_ts = self._ts(anchor)
            n_at_anchor = sum(
                1 for r in rows if self._ts(str(r[self.filter_field])) == a_ts
            )
        seen: set = set()
        out: list[dict] = []
        for r in rows:
            k = self._sort_key(r)
            if k not in seen:
                seen.add(k)
                out.append(r)
        return out

    def _to_rows(self, recs: list[dict]) -> Iterator[tuple]:
        # a LIST iterator, not a generator: the Simple stream-reader
        # wrapper next()s it (empty-batch validation) and copy.copy()s it
        # when serving cached prefetched batches — list iterators support
        # both, generators support neither
        return iter(
            [
                tuple(
                    _convert(rec.get(src), dtype) for _, src, dtype in self._fields
                )
                for rec in recs
            ]
        )

    # -- the streaming contract ---------------------------------------------
    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        cut = self._offset_cut(start)
        recs = [
            r
            for r in self._fetch_ge(start.get("wm", ""))
            if cut is None or self._sort_key(r) > cut
        ]
        if not recs:
            return iter([]), dict(start)
        recs.sort(key=self._sort_key)
        last = recs[-1]
        end = {
            "wm": str(last[self.filter_field]),
            "key": str(last[self.pk_field]),
        }
        return self._to_rows(recs), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo = self._offset_cut(start)
        hi = self._offset_cut(end)
        recs = [
            r
            for r in self._fetch_ge(start.get("wm", ""))
            if (lo is None or self._sort_key(r) > lo)
            and (hi is None or self._sort_key(r) <= hi)
        ]
        recs.sort(key=self._sort_key)
        return self._to_rows(recs)
