"""Plan utilities: parallelism guards and plan inspection."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the input has fewer partitions than the cluster
    has cores.

    Small dimension tables often arrive as a single file → a single
    partition, which serializes any CPU-heavy map work (hashing, Pandas
    UDFs) onto one core. At 100 TB a scan already has thousands of input
    splits and this is a no-op — the condition is what makes it safe to
    leave in the operator.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # Decide from scan metadata (file list + sizes), NOT df.rdd — the RDD
    # hop forces a second plan translation on every call and costs ~300ms
    # of driver time per query at bench scale.
    try:
        paths = df.inputFiles()
    except Exception:
        paths = []
    if len(paths) >= target:
        return df  # already at least one split per core
    local = [p.removeprefix("file:") for p in paths]
    if paths and all(p.startswith("/") for p in local):
        import os

        total = sum(os.path.getsize(p) for p in local if os.path.exists(p))
        # Spark splits large files at spark.sql.files.maxPartitionBytes
        # (default 128 MiB) — big single files already parallelize.
        if total >= target * 128 * 1024 * 1024:
            return df
        return df.repartition(target)
    # No file metadata: the lineage is in-memory or post-shuffle. A
    # shuffle already set parallelism (spark.sql.shuffle.partitions / AQE
    # coalesce ≥ cores by session config), and local in-memory frames are
    # fixture-sized — so this is a no-op, NOT a df.rdd probe: the RDD hop
    # forces full physical planning (~300ms driver time per call) to
    # guard a case that doesn't occur at scale. Callers that truly need a
    # floor on an in-memory frame pass min_partitions and repartition.
    return df


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (for tests/plan assertions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()
