"""Fixture-table loading with parquet-footer-driven type fixup.

The driver's synthetic tables (``/root/testdata/sf*/``) include a
``timestamp[ns]`` column (``events.ts``).  Spark treats parquet
``TIMESTAMP(NANOS)`` as an illegal type unless
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
:mod:`etl_to_iceberg_spark.session`), in which case the column arrives as a
``long`` of nanoseconds.  ``load_table`` inspects the parquet footer with
pyarrow (driver-side, metadata-only — no data read) and converts any such
column to a proper microsecond timestamp with ``timestamp_micros(ns div
1000)``, entirely JVM-side.

This is the engine's equivalent of the reference's schema-introspection step
(``oracle_to_iceberg/hooks.py:79-105``): resolve source schema from source
metadata, then apply deterministic casts — never per-row Python.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Names of timestamp[ns] columns in the parquet dataset at ``path``.

    Footer-only read of a single file — O(KB) regardless of data size.
    """
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
    except ImportError:  # pragma: no cover
        return ()
    files = [path]
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            return ()
    schema = pq.read_schema(files[0])
    return tuple(
        name
        for name, typ in zip(schema.names, schema.types)
        if pa.types.is_timestamp(typ) and typ.unit == "ns"
    )


def load_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, converting ns-timestamp columns to timestamps."""
    from etl_to_iceberg_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # works on sessions the engine didn't build
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in _nanos_timestamp_columns(path):
        # Gate on Spark actually having read the column as a long: the
        # footer check alone over-matches Spark-written INT96 timestamps,
        # which pyarrow reports as timestamp[ns] but Spark reads as a
        # proper TIMESTAMP (no fixup needed — div 1000 would be a type
        # error). Only TIMESTAMP(NANOS) + nanosAsLong arrives as bigint.
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver fixture table (``TESTDATA.md``) by name."""
    return load_parquet_table(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = load_parquet_table(spark, p)
    return out
