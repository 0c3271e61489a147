"""Scale patterns: skew-tolerant aggregation and bucketed co-located joins.

Neither exists in the reference (its parallelism story is per-partition
Spark jobs, ``hdfs_to_iceberg_operator.py:199-207``); both are required at
the 100 TB design point:

- **Salted two-phase aggregation**: a hot grouping key overwhelms one
  reducer. Phase 1 aggregates on (key, salt) — the hot key's rows spread
  over N reducers; phase 2 merges the N partials per key. Works for any
  decomposable aggregate (sum/count/min/max). AQE's skew handling covers
  joins; salting covers aggregation skew, which AQE does not re-split.
- **Bucketed join**: both fact tables pre-bucketed on the join key →
  the join reads co-located buckets and needs NO exchange at query time.
  For repeatedly-joined 100 TB tables this converts every query's shuffle
  into a one-time write-side cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    *,
    sum_col: str,
    salt_buckets: int = 16,
    precision: int = 18,
    scale: int = 6,
) -> DataFrame:
    """Two-phase skew-tolerant SUM+COUNT by ``keys``.

    Output: keys, total (double, exact-decimal internally), cnt (long).
    Result is identical to a direct groupBy — salting only changes the
    physical distribution."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(F.col(sum_col).cast(f"decimal({precision},{scale})")).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__s").cast("double").alias("total"),
            F.sum("__c").alias("cnt"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-tolerant equi-join: the big side gets a random salt, the small
    side is replicated across all ``salt_buckets`` salts, and the join runs
    on (key, salt) — a hot key's rows land on N reducers instead of one.

    Result is identical to ``big.join(small, on)`` (inner); only the
    physical distribution changes. Use when a specific hot key is known to
    break even AQE's skew splitting (which splits partitions, not the
    build-side replication) or when the small side is too big to broadcast."""
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return salted_big.join(replicated_small, on=[on, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a session-catalog table bucketed (and optionally sorted) on
    the join key. Subsequent equi-joins between tables bucketed the same
    way run WITHOUT an Exchange."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # A fresh session's in-memory catalog doesn't know about locations a
    # previous process left in the warehouse — clear the path too.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    # Managed-table layout: <warehouse>/<tbl> for the default database,
    # <warehouse>/<db>.db/<tbl> otherwise — a db-qualified name cleaned at
    # the unqualified path would miss the real leftover directory and
    # saveAsTable would still fail with "location already exists".
    parts = [p.lower() for p in table_name.split(".")]
    if len(parts) == 2 and parts[0] != "default":
        loc = os.path.join(warehouse, f"{parts[0]}.db", parts[1])
    else:
        loc = os.path.join(warehouse, parts[-1])
    if warehouse and os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = df.write.bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
) -> DataFrame:
    """Join two same-bucketed tables — shuffle-free by construction."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
