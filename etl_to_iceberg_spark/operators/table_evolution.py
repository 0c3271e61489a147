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
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog
from etl_to_iceberg_spark.tables.maintenance import remove_orphan_files


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
    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_evo_"))
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
    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_orph_"))
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
    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_mevo_"))
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

    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_pstat_"))
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
    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_prune_"))
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
    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_mor_"))
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    t = cat.table("evo.events_mor")
    t.create(ev.where(F.col("event_id") % 2 == 0))
    t.delete_where("event_type = 'error'", mode="mor")
    t.append(ev.where(F.col("event_id") % 2 == 1))
    return t.read()
