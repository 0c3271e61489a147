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


def release_frame(df: DataFrame) -> None:
    """Release a frame produced by ``.cache()`` OR ``localCheckpoint()``.

    ``unpersist()`` only drops CacheManager blocks; a localCheckpointed
    frame's blocks belong to the checkpointed RDD inside its LogicalRDD
    leaf, which unpersist never touches — they otherwise linger in the
    block store until the ContextCleaner notices the RDD is garbage
    (GC-paced, unbounded in a long-lived service). This walks the
    analyzed plan root and unpersists that RDD explicitly, so streaming
    loops keep a deterministic one-tick block-store footprint
    (tests/test_incremental_sweep.py's getPersistentRDDs no-growth
    assertion).

    Contract: release strictly AFTER the frame's last consumer has run.
    A released cache merely recomputes; a released local checkpoint has
    TRUNCATED lineage and recomputation raises
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the existing unpersist-after-
    materializing discipline, hard-enforced."""
    try:
        df.unpersist()
    except Exception:  # noqa: BLE001 — cache died with its session
        pass
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getSimpleName() == "LogicalRDD":
            rdd = node.rdd()
            # Scope the RDD-unpersist to RDDs that localCheckpoint
            # actually produced (ADVICE r17): a frame whose LogicalRDD
            # wraps an EXTERNALLY persisted shared RDD (createDataFrame
            # over a cached RDD) must keep its blocks — other consumers
            # own them. localCheckpoint marks its RDD, so the check is
            # intrinsic, no side registry to leak.
            if rdd.isLocallyCheckpointed():
                rdd.unpersist(False)
    except Exception:  # noqa: BLE001 — non-RDD plan root / stopped session
        pass


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
