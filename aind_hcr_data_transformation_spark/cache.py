"""Tracked ``persist()`` registry (ADVICE r3: persisted intermediates in a
shared long-lived session accumulate for the session's lifetime, adding
memory/disk pressure and LRU churn at larger scale factors).

Query builders that materialize a multi-consumer intermediate call
:func:`persist_tracked` instead of bare ``DataFrame.persist()``; drivers
that run many queries through one session (``bench.py``,
``tools/oracle_check.py``) call :func:`release_persists` after each
query's result is materialized.  A single-query caller that never
releases behaves exactly as before (the persist simply lives until the
session ends), so this is strictly an improvement for batch drivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for later release."""
    df.persist()
    _LIVE.append(df)
    return df


def release_persists() -> int:
    """Unpersist (non-blocking) every tracked intermediate; returns the
    number released.  Safe to call at any time — the cached plans stay
    valid, later actions just recompute instead of reading cache."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist(blocking=False)
        n += 1
    return n
