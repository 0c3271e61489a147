"""Operator-internal cache discipline (SCALING.md watchpoint 6).

Every ``.cache()`` the engine takes is bounded (id pairs / fixed-width
sketch rows) and LRU-evictable, so batch jobs need nothing — blocks die
with the session. The gap was long-running services: caches taken inside
an operator accumulated in storage memory with no release narrower than
``spark.catalog.clearCache()`` (which would also nuke the service's OWN
caches). Two shapes close it:

- :func:`cached` — a context manager for caches whose consumption
  completes in scope (e.g. MERGE materializes its source batch before
  committing): unpersists on exit, exception or not.
- :func:`tracked_cache` — for caches that back a LAZILY-returned result
  (LSH candidate pairs, the simhash collapsed relation): the operator
  cannot unpersist before the caller's action has run, so the frame is
  registered and a service calls :func:`release_operator_caches`
  between queries.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_tracked: list[DataFrame] = []


@contextmanager
def cached(df: DataFrame):
    """``with cached(df) as d:`` — cache for the block, unpersist after."""
    df.cache()
    try:
        yield df
    finally:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session already stopped
            pass


def tracked_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for :func:`release_operator_caches`."""
    df.cache()
    _tracked.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every tracked operator cache; returns how many released.

    Safe against stopped sessions (their blocks are already gone) and
    idempotent — the registry drains."""
    n = 0
    while _tracked:
        df = _tracked.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — cache died with its session
            pass
    return n
