"""Shared small utilities."""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame

# Rotation of live cached intermediates (ADVICE r2: operators that
# .cache() a barrier frame — minhash signatures, tokenized corpora, BM25
# doc lengths, the token-budget histogram — never unpersisted, so a
# long-lived session accumulated cached blocks until storage eviction
# churn).  A bounded FIFO keeps the most recent N cached frames and
# unpersists the oldest beyond that: within one composed query every
# barrier stays warm (no operator composition in this package touches
# more than ~4 bounded_cache calls before executing — revisit _MAX_LIVE
# if a new composition exceeds that, or its own barriers get evicted
# mid-plan and silently recompute), and across a 90-query gate run the
# storage footprint is bounded by N intermediates per session.
#
# The FIFO is keyed per SparkSession (weakly — ADVICE r3): frames from a
# stopped/replaced session die with the session key instead of pinning
# JVM-side blocks, and concurrent sessions rotate independently.  A lock
# guards the rotation itself.
_LIVE_CACHES: "weakref.WeakKeyDictionary[object, list[DataFrame]]" = (
    weakref.WeakKeyDictionary()
)
_MAX_LIVE = 8
_LOCK = threading.Lock()


# Memo of DataFrame row counts, keyed on the DataFrame OBJECT (weakly).
# ``plans.tables.load`` returns the same DataFrame object for repeated
# loads of a path within a session (mtime-invalidated), so counts taken
# to size SRP plane counts / residue guards hit this memo on every
# invocation after the first instead of paying a count job per operator
# call (VERDICT r6 flagged the 8 ``n_planes_for(emb.count())`` sites as
# the embedding-family bench drift).  Derived frames get a fresh object
# per invocation and simply miss — correctness never depends on a hit.
_COUNTS: "weakref.WeakKeyDictionary[DataFrame, int]" = weakref.WeakKeyDictionary()


def memo_count(df: DataFrame) -> int:
    """``df.count()`` memoized on the DataFrame object (see module note)."""
    try:
        return _COUNTS[df]
    except (KeyError, TypeError):
        pass
    n = df.count()
    try:
        _COUNTS[df] = n
    except TypeError:  # un-weakref-able stub (tests/mocks)
        pass
    return n


def bounded_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` with a bounded lifetime (see module note)."""
    df = df.cache()
    with _LOCK:
        live = _LIVE_CACHES.setdefault(df.sparkSession, [])
        live.append(df)
        evict = []
        while len(live) > _MAX_LIVE:
            evict.append(live.pop(0))
    for old in evict:
        try:
            old.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return df
