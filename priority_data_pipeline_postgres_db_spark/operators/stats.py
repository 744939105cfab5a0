"""Zone maps — manifest-level data skipping for the staging protocol.

Parquet already gives SCAN-level skipping: Spark pushes predicates into
the reader and drops row groups whose footer min/max disprove them.  But
that skipping happens per-file AFTER listing — every file of every
committed batch is still listed and has its footer opened at planning,
which on an object store is one GET per file.  The lakehouse answer
(Delta/Iceberg data skipping) is to lift min/max stats into the commit
metadata so whole batches and files are pruned from the FILE LISTING
before Spark plans anything.  This module is that move for the
StagingWarehouse batch-commit protocol:

- At write time, ``write_sidecar`` aggregates per-column min/max from
  the parquet FOOTERS of the just-written batch (metadata-only — no
  data pages are read) into one hidden ``_stats.json`` inside the batch
  dir.  The sidecar is written BEFORE the commit act (data rename /
  manifest entry), so every committed batch either carries complete
  stats or none; names starting with ``_`` are invisible to Spark's
  listing, and the sidecar travels with the batch through rename,
  generation swaps, and adoption.
- At read time, ``prune_plan`` evaluates a conjunction of simple
  predicates against the sidecars and drops disproved batches — and
  disproved individual files inside kept batches — from the explicit
  path list the manifest read plans over.  One tiny JSON read per batch
  replaces a footer pass over every file.

CORRECTNESS NEVER DEPENDS ON STATS.  The caller (``StagingWarehouse
.read(where=...)``) always applies the full predicate as a residual
``.filter`` — pruning is purely a planning optimization, so every
fail-open path (missing sidecar, torn JSON, unreadable footer, NaN
bounds, type mismatch, unknown column) simply keeps the data and lets
the filter do the work.  Three soundness rules carry the load:

- Every supported operator is NULL-REJECTING (a NULL comparison is
  never true in SQL), so min/max over the NON-null values of a column
  bound everything that could pass; null counts are not needed.
- A batch whose logical schema lacks the predicate column yields only
  NULLs for it under mergeSchema — prunable outright.  A FILE that
  lacks the column while the batch schema has it is a hive PARTITION
  column (directory-encoded, not null!) and is never pruned on.
- Parquet writers may truncate binary min/max, but per the format spec
  truncation keeps bounds VALID (max rounds up), so pruning against
  them stays sound.

Two consumers deliberately NOT handled here: predicates on hive
partition columns (Catalyst prunes those natively from the residual
filter during partition discovery) and newest-wins upsert tables, where
the caller restricts pruning to PK columns — a version of a row carries
the same PK in every batch, so a batch whose PK range excludes the
predicate contains neither winners nor shadowing losers, while pruning
on a VALUE column could drop the newest version and resurrect a stale
one (pinned in tests/test_staging_stats.py).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import json
import math
import os

STATS_FILE = "_stats.json"

#: where= operators, all null-rejecting (see module docstring)
OPS = ("==", "=", "!=", "<", "<=", ">", ">=", "in", "between")


# ---------------------------------------------------------------- encoding

def _enc(v):
    """(type-tag, json-safe value) for a parquet stat value, or None when
    the value cannot soundly bound comparisons (NaN/inf floats, raw
    bytes)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return ("f", v)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, _dt.datetime):  # before date: datetime IS a date
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    return None


def _dec(t, raw):
    if t in ("b", "i", "f", "s"):
        return raw
    if t == "d":
        return _dt.date.fromisoformat(raw)
    if t == "ts":
        return _dt.datetime.fromisoformat(raw)
    if t == "dec":
        return decimal.Decimal(raw)
    return None


def _coerce(t, v):
    """Align a user-supplied predicate literal with a stat's decoded
    type so the comparison is meaningful.  None = cannot align → the
    caller fails open (no pruning on this conjunct)."""
    try:
        if t == "b":
            return v if isinstance(v, bool) else None
        if t in ("i", "f"):
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                return None
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                return None
            return v
        if t == "s":
            return v if isinstance(v, str) else None
        if t == "d":
            if isinstance(v, _dt.datetime):
                return None  # date stats can't bound sub-day cutoffs soundly both ways
            if isinstance(v, _dt.date):
                return v
            if isinstance(v, str):
                return _dt.date.fromisoformat(v)
            return None
        if t == "ts":
            if isinstance(v, _dt.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                return v
            if isinstance(v, _dt.date):
                return _dt.datetime(v.year, v.month, v.day)
            if isinstance(v, str):
                return _dt.datetime.fromisoformat(v)
            return None
        if t == "dec":
            if isinstance(v, bool):
                return None
            if isinstance(v, (int, str, decimal.Decimal)):
                return decimal.Decimal(v)
            if isinstance(v, float):
                return decimal.Decimal(str(v))
            return None
    except (ValueError, decimal.InvalidOperation, ArithmeticError):
        return None
    return None


def _disproves(stat: dict | None, op: str, value) -> bool:
    """True when the [min, max] envelope PROVES no row of this
    file/batch can satisfy ``col op value``.  Fail-open on any doubt."""
    if not stat:
        return False
    t = stat["t"]
    mn, mx = _dec(t, stat["mn"]), _dec(t, stat["mx"])
    if mn is None or mx is None:
        return False
    try:
        if op == "in":
            if not value:
                return True  # col IN () is false for every row
            vals = [_coerce(t, x) for x in value]
            if any(x is None for x in vals):
                return False
            return not any(mn <= x <= mx for x in vals)
        if op == "between":
            lo, hi = _coerce(t, value[0]), _coerce(t, value[1])
            if lo is None or hi is None:
                return False
            return not (mx >= lo and mn <= hi)
        v = _coerce(t, value)
        if v is None:
            return False
        if op in ("==", "="):
            return not (mn <= v <= mx)
        if op == "!=":
            return mn == v == mx
        if op == "<":
            return not (mn < v)
        if op == "<=":
            return not (mn <= v)
        if op == ">":
            return not (mx > v)
        if op == ">=":
            return not (mx >= v)
    except TypeError:
        return False
    return False


# ---------------------------------------------------------------- sidecar

def _file_stats(fp: str) -> dict | None:
    """Per-file stats from one parquet FOOTER (no data pages), or None
    when the footer is unreadable.  Pure function of the path — safe to
    run in executor tasks for the distributed pass."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(fp).metadata
    except Exception:
        return None
    cols: dict[str, dict | None] = {}
    dead: set[str] = set()
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        for j in range(rg.num_columns):
            cm = rg.column(j)
            name = cm.path_in_schema
            if "." in name or name in dead:
                continue
            st = cm.statistics
            enc_mn = enc_mx = None
            if st is not None and st.has_min_max:
                enc_mn, enc_mx = _enc(st.min), _enc(st.max)
            if enc_mn is None or enc_mx is None or enc_mn[0] != enc_mx[0]:
                dead.add(name)
                cols[name] = None
                continue
            t = enc_mn[0]
            prev = cols.get(name)
            if prev is None:
                cols[name] = {"t": t, "mn": enc_mn[1], "mx": enc_mx[1]}
            elif prev["t"] != t:
                dead.add(name)
                cols[name] = None
            else:
                if _dec(t, enc_mn[1]) < _dec(t, prev["mn"]):
                    prev["mn"] = enc_mn[1]
                if _dec(t, enc_mx[1]) > _dec(t, prev["mx"]):
                    prev["mx"] = enc_mx[1]
    return {"rows": md.num_rows, "cols": cols}


#: above this many files the footer pass runs as a Spark job — at a
#: production batch (10^3-10^4 files on an object store) a driver-side
#: loop would serialize 10^4 footer GETs right at the commit point
DISTRIBUTE_THRESHOLD = 64


def write_sidecar(
    batch_dir: str, columns: list[str], spark=None
) -> dict | None:
    """Aggregate parquet-footer min/max into ``<batch_dir>/_stats.json``.

    ``columns`` is the batch's LOGICAL column list (the written frame's
    schema, partition columns included) — the read side needs it for
    the absent-column pruning rule and the schema-preservation guard.
    Metadata-only: reads every file's footer, never a data page — the
    same cost class as the _SUCCESS commit walk; past
    ``DISTRIBUTE_THRESHOLD`` files the footer reads fan out as a Spark
    job (executors already hold the data locally right after the
    write).  Returns the payload, or None (and writes nothing) when
    any footer is unreadable; a column with unusable stats in ANY row
    group is recorded as null (unprunable) rather than dropped, so
    per-file maps stay complete.  Atomic publish (hidden tmp +
    ``os.replace``) — a torn sidecar can never be parsed as a
    short-but-valid stats map."""
    paths: list[str] = []
    for dirpath, dirnames, filenames in os.walk(batch_dir):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        paths += [
            os.path.join(dirpath, f)
            for f in sorted(filenames)
            if f.endswith(".parquet")
        ]
    if spark is not None and len(paths) > DISTRIBUTE_THRESHOLD:
        per_file = (
            spark.sparkContext.parallelize(
                paths, max(1, len(paths) // 32)
            )
            .map(_file_stats)
            .collect()
        )
    else:
        per_file = [_file_stats(fp) for fp in paths]
    if any(fi is None for fi in per_file):
        return None  # unreadable footer: fail open, no sidecar
    files = {
        os.path.relpath(fp, batch_dir): fi
        for fp, fi in zip(paths, per_file)
    }
    if not files:
        return None
    # batch rollup: envelope over the files that carry the column; a
    # file-level null poisons the rollup (its rows are unbounded), but a
    # file that simply lacks the column doesn't (partition column, or
    # all-null there under mergeSchema — either way bounded or excluded)
    batch: dict[str, dict | None] = {}
    for c in {c for fi in files.values() for c in fi["cols"]}:
        merged: dict | None = None
        for fi in files.values():
            if c not in fi["cols"]:
                continue
            s = fi["cols"][c]
            if s is None:
                merged = None
                break
            if merged is None:
                merged = dict(s)
            elif merged["t"] != s["t"]:
                merged = None
                break
            else:
                t = s["t"]
                if _dec(t, s["mn"]) < _dec(t, merged["mn"]):
                    merged["mn"] = s["mn"]
                if _dec(t, s["mx"]) > _dec(t, merged["mx"]):
                    merged["mx"] = s["mx"]
        batch[c] = merged
    payload = {
        "v": 1,
        "columns": list(columns),
        "rows": sum(fi["rows"] for fi in files.values()),
        "files": files,
        "batch": batch,
    }
    tmp = os.path.join(batch_dir, f".{STATS_FILE}.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, os.path.join(batch_dir, STATS_FILE))
    return payload


#: path -> (mtime_ns, payload).  Sidecars are immutable once published
#: (a rewrite replaces the whole batch dir), so an mtime-validated cache
#: makes the O(batches) prune pass pay JSON parsing once per session —
#: a 1000-batch history costs 1000 stat() calls, not 1000 parses.
#: Callers treat payloads as read-only.
_SIDECAR_CACHE: dict[str, tuple[int, dict]] = {}


def load_sidecar(batch_dir: str) -> dict | None:
    sp = os.path.join(batch_dir, STATS_FILE)
    try:
        mt = os.stat(sp).st_mtime_ns
    except OSError:
        return None
    hit = _SIDECAR_CACHE.get(sp)
    if hit is not None and hit[0] == mt:
        return hit[1]
    try:
        with open(sp) as fh:
            payload = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
    if not isinstance(payload, dict) or payload.get("v") != 1:
        return None
    if len(_SIDECAR_CACHE) > 8192:
        _SIDECAR_CACHE.clear()  # crude bound; refills on demand
    _SIDECAR_CACHE[sp] = (mt, payload)
    return payload


# ---------------------------------------------------------------- pruning

def _batch_disproved(sc: dict, conjuncts) -> bool:
    if conjuncts and sc["rows"] == 0:
        return True  # an empty batch satisfies nothing (and has no stats)
    for c, op, v in conjuncts:
        if c not in sc["columns"]:
            return True  # absent column: all-NULL under mergeSchema
        if _disproves(sc["batch"].get(c), op, v):
            return True
    return False


def _file_disproved(sc: dict, fi: dict, conjuncts) -> bool:
    if conjuncts and fi["rows"] == 0:
        return True  # empty part file (Spark writes one per empty task)
    for c, op, v in conjuncts:
        if c not in sc["columns"]:
            # not in the batch's logical schema at all: all-NULL under
            # mergeSchema (the batch only survived batch-pruning via the
            # schema guard) — every file is disproved and the fallback
            # keeps one smallest file as the schema witness
            return True
        if c not in fi["cols"]:
            # in the batch schema but not in the file: a partition
            # column — path-encoded, never pruned here
            continue
        if _disproves(fi["cols"][c], op, v):
            return True
    return False


def prune_plan(
    path: str, committed: list[str], conjuncts
) -> tuple[list[str], dict]:
    """Resolve the read paths for ``committed`` batch dirs under a
    conjunction of ``(col, op, value)`` predicates.

    Returns ``(paths, report)`` where ``paths`` mixes whole batch dirs
    (fully kept) and individual parquet files (partially pruned
    batches), all absolute.  Guarantees: (a) every row that can satisfy
    the conjunction is inside ``paths`` — pruning only removes
    PROVABLY-disjoint data; (b) the mergeSchema union over ``paths``
    equals the union over all of ``committed`` — when pruning would
    drop the only batch carrying some column, the smallest such batch
    is retained (one file of it suffices and is what survives
    file-level pruning); sidecar-less batches are never pruned and
    contribute their schema naturally."""
    side = {d: load_sidecar(os.path.join(path, d)) for d in committed}
    kept: list[str] = []
    pruned: list[str] = []
    for d in committed:
        sc = side[d]
        if sc is not None and _batch_disproved(sc, conjuncts):
            pruned.append(d)
        else:
            kept.append(d)
    # schema-preservation guard: mergeSchema over the kept set must still
    # see every column any pruned batch carries.  Smallest batches first
    # so the reinstated witness is as cheap as possible.
    kept_union: set[str] = set()
    for d in kept:
        if side[d] is not None:
            kept_union |= set(side[d]["columns"])
    for d in sorted(pruned, key=lambda d: side[d]["rows"]):
        missing = set(side[d]["columns"]) - kept_union
        if missing:
            pruned.remove(d)
            kept.append(d)
            kept_union |= set(side[d]["columns"])
    report = {"batches_total": len(committed), "batches_pruned": len(pruned),
              "files_pruned": 0}
    paths: list[str] = []
    for d in sorted(kept):
        full = os.path.join(path, d)
        sc = side[d]
        if sc is None or not conjuncts:
            paths.append(full)
            continue
        keep_files = [
            rel for rel, fi in sc["files"].items()
            if not _file_disproved(sc, fi, conjuncts)
        ]
        if not keep_files:
            # every file individually disproved yet the batch survived
            # (schema guard, or a rollup gap): one smallest file keeps
            # its schema contribution; its rows die in the residual filter
            keep_files = [min(sc["files"], key=lambda r: sc["files"][r]["rows"])]
        dropped = len(sc["files"]) - len(keep_files)
        if dropped == 0:
            paths.append(full)
        else:
            report["files_pruned"] += dropped
            paths.extend(os.path.join(full, rel) for rel in sorted(keep_files))
    return paths, report


def join_prune_conjunct(dim_df, dim_key: str, fact_key: str, max_in: int = 1024):
    """DYNAMIC FILE PRUNING: derive a zone-map conjunct on ``fact_key``
    from the small side of an equi-join — the Databricks-DFP /
    Iceberg-runtime-filter move on the batch-commit protocol.  For an
    INNER or SEMI join, a fact row whose key is outside the dim side's
    key set cannot survive the join, so the dim's key envelope is a
    sound fact-side predicate: pass the result into
    ``StagingWarehouse.read(where=[...])`` and disjoint batches/files
    never reach the file listing.

    Shape: the dim side's distinct keys are collected when there are at
    most ``max_in`` of them (an IN-list — also pushed into parquet row-
    group filtering by Spark) and collapsed to a min/max BETWEEN
    envelope otherwise; NULL keys are dropped (NULL never equi-joins).
    The driver collect is bounded by ``max_in + 1`` rows by
    construction, and the envelope path is a 1-row aggregate — safe at
    any dim size, but only WORTH it when the dim side is far smaller
    than the fact (the DFP premise).  An empty dim yields an
    always-false conjunct (``in ()``), pruning everything.

    OUTER-JOIN CAVEAT: applying the conjunct to the fact side of a
    LEFT/FULL outer join from the fact would drop unmatched fact rows —
    use only where the join discards them anyway (inner/semi), same
    restriction as engine-native DFP."""
    from pyspark.sql import functions as F

    keys = (
        dim_df.select(F.col(dim_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
        .limit(max_in + 1)
        .collect()
    )
    if len(keys) <= max_in:
        return (fact_key, "in", sorted(r["k"] for r in keys))
    lo, hi = dim_df.filter(F.col(dim_key).isNotNull()).agg(
        F.min(dim_key), F.max(dim_key)
    ).first()
    return (fact_key, "between", (lo, hi))


def residual_condition(conjuncts):
    """The full predicate as a Spark Column — ALWAYS applied by the
    caller, so pruning can never change results.  Raises on unknown
    operators (the one place the spec is validated)."""
    from pyspark.sql import functions as F

    cond = None
    for c, op, v in conjuncts:
        col = F.col(c)
        if op in ("==", "="):
            e = col == v
        elif op == "!=":
            e = col != v
        elif op == "<":
            e = col < v
        elif op == "<=":
            e = col <= v
        elif op == ">":
            e = col > v
        elif op == ">=":
            e = col >= v
        elif op == "in":
            e = col.isin(list(v)) if v else F.lit(False)
        elif op == "between":
            e = col.between(v[0], v[1])
        else:
            raise ValueError(
                f"unsupported where operator {op!r} (supported: {OPS})"
            )
        cond = e if cond is None else cond & e
    return cond
