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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (for tests/plan assertions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()
