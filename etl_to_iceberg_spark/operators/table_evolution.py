"""Table-format evolution surface: schema evolution on append and
orphan-file cleanup — the two Iceberg lifecycle capabilities the
reference's fixed-DDL path lacks (it recreates tables on schema drift,
``oracle_to_iceberg_operator.py:209-244``, and never sweeps crashed-writer
leftovers).

Registered after ``ext/pipeline_queries`` so these newcomers queue at the
tail of the driver-check rotation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog
from etl_to_iceberg_spark.tables.maintenance import remove_orphan_files
from etl_to_iceberg_spark.scratch import scratch_dir


@register(
    "ddl_schema_evolve",
    sql="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS channel
    FROM orders WHERE o_orderkey % 10 < 8
    UNION ALL
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END AS channel
    FROM orders WHERE o_orderkey % 10 >= 8
    """,
)
def ddl_schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on append: a late batch arrives with a new
    ``channel`` column; the table schema widens in the commit, old files
    are NOT rewritten, and pre-evolution rows read as NULL — Iceberg
    add-column semantics. The oracle is the UNION of both eras.

    Scale shape: evolution is a metadata-only commit — zero data movement
    regardless of table size. The read plan unions per-era file groups
    with NULL-fill, no rewrite of the 100 TB history."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_evo_"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = cat.table("evo.orders")
    t.create(orders.where(F.col("o_orderkey") % 10 < 8))
    late = orders.where(F.col("o_orderkey") % 10 >= 8).withColumn(
        "channel",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("web")).otherwise(F.lit("store")),
    )
    t.append(late)
    return t.read()


@register("maint_orphan_files", sql=None)  # filesystem semantics — rows-only
def maint_orphan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file sweep (Iceberg ``remove_orphan_files``): a crashed
    writer's un-committed parquet file is planted under the table's data
    directory; the sweep removes exactly it and leaves every
    manifest-referenced file — verified by the committed row count
    surviving unchanged (tests/test_tables.py asserts both directions).

    Returns one auditable row per orphan removed."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_orph_"))
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("evo.nation")
    t.create(nation)
    # Simulate a writer that died after data write, before metadata commit.
    crash_dir = os.path.join(t.location, "data", "v999")
    nation.limit(1).coalesce(1).write.parquet(crash_dir)
    return remove_orphan_files(t)


@register(
    "merge_schema_evolve",
    sql="""
    SELECT c.c_custkey,
           CASE WHEN c.c_custkey % 50 = 0 THEN 'vip' ELSE c.c_mktsegment END
               AS c_mktsegment,
           CASE WHEN c.c_custkey % 50 = 0 THEN TRUE ELSE CAST(NULL AS BOOLEAN) END
               AS reviewed
    FROM customer c
    """,
)
def merge_schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE whose source carries a new ``reviewed`` column: matched rows
    update and take the value, the schema widens in the same commit, and
    every untouched row reads NULL — Iceberg's evolve-during-MERGE.

    Scale shape: identical to the plain file-pruned COW MERGE (only files
    holding matched keys rewrite); the evolution itself adds zero data
    movement."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_mevo_"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    t = cat.table("evo.customer")
    t.create(cust)
    src = (
        cust.where(F.col("c_custkey") % 50 == 0)
        .withColumn("c_mktsegment", F.lit("vip"))
        .withColumn("reviewed", F.lit(True))
    )
    t.merge(src, keys=["c_custkey"])
    return t.read()


@register(
    "meta_partition_stats",
    sql="""
    SELECT CAST(year(l_shipdate) AS VARCHAR) AS l_year,
           COUNT(*) AS row_count
    FROM lineitem
    GROUP BY 1
    """,
)
def meta_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style ``partitions`` metadata table: per-partition row
    counts straight from the snapshot manifest (parquet footer counts
    captured at commit) — zero data scan; the oracle recomputes the same
    totals the slow way from the raw rows.

    Scale shape: manifest-sized driver work, like Iceberg's own metadata
    tables; the only Spark job materializes the result relation."""
    from etl_to_iceberg_spark.tables.maintenance import partition_stats

    cat = Catalog(spark, scratch_dir(prefix="e2is_pstat_"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.year("l_shipdate").alias("l_year")
    )
    t = cat.table("evo.lineitem")
    t.create(li, partition_by=["l_year"])
    return partition_stats(t).select("l_year", "row_count")


@register(
    "scan_file_pruned",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey BETWEEN 100 AND 500
    """,
)
def scan_file_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest data skipping: a range-clustered table answers a selective
    key-range read by opening only the files whose footer [min, max]
    envelope intersects the range — Iceberg's manifest pruning. The unit
    suite asserts files are actually skipped (and that z-order clustering
    increases the skip rate); this query checks the pruned read returns
    exactly the oracle's rows.

    Scale shape: planning is manifest-sized driver work; data I/O is
    proportional to the matching range, not the table."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_prune_"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = cat.table("evo.orders_pruned")
    t.create(orders.repartitionByRange(8, "o_orderkey"))
    return t.read_where({"o_orderkey": (100, 500)})


@register(
    "delete_where_mor",
    sql="""
    SELECT event_id, event_type, value FROM events
    WHERE event_id % 2 = 0 AND event_type <> 'error'
    UNION ALL
    SELECT event_id, event_type, value FROM events
    WHERE event_id % 2 = 1
    """,
)
def delete_where_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE: an O(1) predicate-tombstone commit (no data
    rewrite, however large the table) filters wave-1 rows at read, while
    rows appended AFTER the tombstone pass through untouched — the
    sequence-number gating the oracle mirrors with its two-era UNION.
    Compaction later materializes tombstones (tests/test_tables.py).

    Scale shape: the delete commit is manifest-sized; reads pay one extra
    codegen'd filter until compaction folds it in."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_mor_"))
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    t = cat.table("evo.events_mor")
    t.create(ev.where(F.col("event_id") % 2 == 0))
    t.delete_where("event_type = 'error'", mode="mor")
    t.append(ev.where(F.col("event_id") % 2 == 1))
    return t.read()


@register(
    "pipeline_incremental_rollup",
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def pipeline_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: an hourly rollup table kept current
    by aggregating ONLY each tick's table delta (``incremental_read``)
    and additively MERGEing it in. The oracle recomputes the whole
    rollup from raw events — incremental must equal batch, exactly.

    The running sums live as DECIMAL in the rollup table: decimal
    addition is exact and order-independent, so three incremental ticks
    equal one batch aggregation bit-for-bit (a double accumulator could
    not promise that). Scale shape: each tick scans only the delta's
    files (snapshot-range read, no diffing), aggregates them, and
    merges rollup-sized rows — history is never rescanned."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_ivm_"))
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    raw = cat.table("evo.events_raw")
    roll = cat.table("evo.events_rollup")
    dec30 = "decimal(30,6)"

    def agg(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00")
                .alias("hour"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast(dec30)
                .alias("sum_dec"),
            )
        )

    for wave in range(3):
        batch = ev.where(F.col("event_id") % 3 == wave)
        prev_v = raw.current_version() if raw.exists() else None
        raw.append(batch)
        # Tick delta recovered from the TABLE (snapshot-range read), not
        # trusted from the producer — ticks after the first exercise it.
        delta = batch if prev_v is None else raw.incremental_read(prev_v)
        d = agg(delta)
        if not roll.exists():
            roll.create(d)
            continue
        cur = roll.read().select(
            "hour", "event_type",
            F.col("cnt").alias("cur_cnt"), F.col("sum_dec").alias("cur_sum"),
        )
        combined = (
            d.join(cur, ["hour", "event_type"], "full")
            .select(
                "hour", "event_type",
                (F.coalesce("cnt", F.lit(0)) + F.coalesce("cur_cnt", F.lit(0)))
                .alias("cnt"),
                (
                    F.coalesce(F.col("sum_dec"), F.lit(0).cast(dec30))
                    + F.coalesce(F.col("cur_sum"), F.lit(0).cast(dec30))
                ).cast(dec30).alias("sum_dec"),
            )
        )
        roll.merge(combined, keys=["hour", "event_type"])
    return roll.read().select(
        "hour", "event_type", "cnt",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )


@register(
    "catalog_sql_query",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderpriority
    """,
)
def catalog_sql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL over managed tables: two tables registered as views, queried
    with plain Spark SQL (join + filter + grouped exact-decimal sum) —
    the entry point for DAGs that address tables by name rather than
    through the DataFrame API.

    Scale shape: identical to the DataFrame plan — Catalyst compiles the
    SQL to the same broadcast-join + two-phase agg, with filters pushed
    into the snapshot scans."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_sql_"))
    cat.table("lake.orders").create(load_table(spark, sf_dir, "orders"))
    cat.table("lake.customer").create(load_table(spark, sf_dir, "customer"))
    views = cat.register_views("lake")
    assert views == ["lake_customer", "lake_orders"]
    return cat.sql("""
        SELECT o.o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_price
        FROM lake_orders o JOIN lake_customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderpriority
    """)
