"""Shared small utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Rotation of live cached intermediates (ADVICE r2: operators that
# .cache() a barrier frame — minhash signatures, tokenized corpora, BM25
# doc lengths, the token-budget histogram — never unpersisted, so a
# long-lived session accumulated cached blocks until storage eviction
# churn).  A bounded FIFO keeps the most recent N cached frames and
# unpersists the oldest beyond that: within one composed query every
# barrier stays warm (no operator composition touches more than ~4), and
# across a 90-query gate run the storage footprint is bounded by N
# intermediates instead of growing per invocation.
_LIVE_CACHES: list[DataFrame] = []
_MAX_LIVE = 8


def bounded_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` with a bounded lifetime (see module note)."""
    df = df.cache()
    _LIVE_CACHES.append(df)
    while len(_LIVE_CACHES) > _MAX_LIVE:
        old = _LIVE_CACHES.pop(0)
        try:
            old.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return df
