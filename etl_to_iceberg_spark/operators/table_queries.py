"""Registry queries exercising the managed-table layer (SURVEY §2.1 sinks,
§2.3 merge, §2.9 maintenance).

Each query builds a scratch warehouse (tempfile), drives the real write
path, and returns a READ-BACK DataFrame — so the DuckDB oracle checks the
full write→snapshot→read round trip, not just a transformation. Ops whose
output is inherently environment-specific (file counts, timestamps) are
rows-only.
"""

from __future__ import annotations

import atexit
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog, maintenance
from etl_to_iceberg_spark.scratch import scratch_dir


def _scratch(spark: SparkSession) -> Catalog:
    return Catalog(spark, scratch_dir(prefix="e2is_wh_"))


# Pristine seeded warehouses, one per (key, sf_dir) per process. Queries
# whose *measured* operation is a mutation (MERGE, CDC tick) seed their
# target table once, then take an O(metadata) shallow clone per run —
# so repeated runs (bench loops, retries) time the mutation itself, not
# re-seeding the scratch table. Results are identical to seeding inline:
# the clone is byte-equivalent table state.
_PRISTINE: dict[tuple[str, str], Catalog] = {}
_PRISTINE_LOCK = threading.Lock()
# Clone warehouses accumulate one dir (with the measured mutation's real
# parquet) per run of a cloning query; they stay on disk for the process
# lifetime because a caller may hold an uncollected DataFrame over them,
# but they are reclaimed at interpreter exit rather than leaked.
_CLONES: list[str] = []
atexit.register(
    lambda: [shutil.rmtree(p, ignore_errors=True) for p in _CLONES]
)


def seeded_clone(
    spark: SparkSession, key: str, sf_dir: str, seed
) -> Catalog:
    """Seed a scratch warehouse via ``seed(catalog)`` once per
    (key, sf_dir), then return a fresh shallow clone of it (private to
    the caller — mutations never touch the pristine copy). Clone dirs are
    removed at process exit; the lock makes first-call seeding
    single-flight under concurrent tests."""
    k = (key, sf_dir)
    with _PRISTINE_LOCK:
        cat = _PRISTINE.get(k)
        if cat is None or cat.spark is not spark:
            cat = _scratch(spark)
            seed(cat)
            _PRISTINE[k] = cat
    dst = scratch_dir(prefix="e2is_wh_")
    _CLONES.append(dst)
    return cat.shallow_clone(dst)


@register(
    "sink_iceberg_append",
    sql="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
)
def sink_iceberg_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append sink (ref: oracle_to_iceberg_operator.py:121-122,147-155):
    two appends commit two snapshots; read-back must equal the source.
    Scale: appends write only their own files; no read-modify-write."""
    cat = _scratch(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = cat.table("sales.orders_append")
    t.append(orders.where(F.col("o_orderkey") % 2 == 0))
    t.append(orders.where(F.col("o_orderkey") % 2 == 1))
    return t.read()


@register(
    "sink_iceberg_overwrite",
    sql="SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def sink_iceberg_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic overwrite (ref: hdfs_to_iceberg_cdc_operator.py:363-367; fixes
    the chunked overwrite-then-append race of
    oracle_to_iceberg_operator.py:267-282 with one snapshot commit)."""
    cat = _scratch(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    t = cat.table("sales.cust_ovr")
    t.append(cust.limit(7))  # stale contents
    t.overwrite(cust)
    return t.read()


@register(
    "sink_partitioned_write",
    sql="""
    SELECT l_orderkey, l_quantity, CAST(year(l_shipdate) AS INT) AS l_year
    FROM lineitem
    WHERE year(l_shipdate) = 1995
    """,
)
def sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity-partitioned write (ref: sink_partitioned_write,
    oracle_to_iceberg_operator.py:151-153; YEAR/MONTH DAG usage). The read
    back filters one partition — the filter prunes at the file listing, so
    at 100 TB only that partition's files are opened."""
    cat = _scratch(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.year("l_shipdate").cast("int").alias("l_year")
    )
    t = cat.table("sales.lineitem_by_year")
    t.create(li, partition_by=["l_year"])
    return t.read().where(F.col("l_year") == 1995).select(
        "l_orderkey", "l_quantity", F.col("l_year").cast("int").alias("l_year")
    )


@register(
    "ddl_create_table_auto",
    sql="SELECT r_regionkey, r_name FROM region",
)
def ddl_create_table_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto table creation on first write (ref: ddl_create_table_auto,
    oracle_to_iceberg_operator.py:209-244): namespace + empty table from an
    explicit schema, then append."""
    cat = _scratch(spark)
    region = load_table(spark, sf_dir, "region")
    t = cat.create_table("geo.region_auto", region.schema)
    assert t.exists() and t.read().count() == 0
    t.append(region)
    return t.read()


@register(
    "scan_iceberg_table",
    sql="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_iceberg_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-table scan (ref: scan_iceberg_table,
    example_function_usage.py:24,78)."""
    cat = _scratch(spark)
    t = cat.table("geo.nation_scan")
    t.append(load_table(spark, sf_dir, "nation"))
    return t.read()


@register(
    "merge_keyed_upsert",
    sql="""
    WITH delta AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 2 AS o_totalprice, o_orderdate,
               'MERGED' AS o_orderpriority
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, 'N',
               o_totalprice, o_orderdate, 'INSERTED'
        FROM orders WHERE o_orderkey % 500 = 0
    )
    SELECT * FROM delta
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders WHERE o_orderkey % 5 <> 0
    """,
)
def merge_keyed_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real keyed upsert: MERGE INTO ... WHEN MATCHED UPDATE SET * WHEN NOT
    MATCHED INSERT * — the semantics the reference documents
    (README.md:594-606) but stubs as whole-table overwrite
    (oracle_to_iceberg_cdc_operator.py:211-221). File-pruned copy-on-write:
    only files containing matched keys are rewritten."""
    orders = load_table(spark, sf_dir, "orders")
    # Seed in several files so the merge has files to prune; seeded once
    # per process and shallow-cloned per run (see seeded_clone).
    cat = seeded_clone(
        spark, "orders_merge", sf_dir,
        lambda c: c.table("sales.orders_merge").append(orders.repartition(8)),
    )
    t = cat.table("sales.orders_merge")

    updates = orders.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        "o_orderdate",
        F.lit("MERGED").alias("o_orderpriority"),
    )
    inserts = orders.where(F.col("o_orderkey") % 500 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        F.lit("INSERTED").alias("o_orderpriority"),
    )
    t.merge(updates.unionByName(inserts), keys=["o_orderkey"])
    return t.read()


@register(
    "delete_where",
    sql="""
    SELECT event_id, user_id, event_type, value FROM events
    WHERE NOT (event_type = 'error')
    """,
)
def delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM t WHERE p with file-pruned copy-on-write (Iceberg
    row-level delete semantics; beyond the reference's surface but required
    by its promised CDC upsert path)."""
    cat = _scratch(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = cat.table("stream.events_del")
    t.append(ev.repartition(6))
    t.delete_where("event_type = 'error'")
    return t.read()


@register(
    "cdc_flashback",
    sql="SELECT p_partkey, p_name, p_retailprice FROM part WHERE p_partkey % 3 = 0",
)
def cdc_flashback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time read (ref: cdc_flashback — stubbed branch at
    oracle_to_iceberg_cdc_operator.py:195-201; Iceberg VERSION AS OF).
    Writes v1 (subset), appends the rest, reads AS OF v1."""
    cat = _scratch(spark)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")
    t = cat.table("inv.part_tt")
    t.append(part.where(F.col("p_partkey") % 3 == 0))  # v1
    t.append(part.where(F.col("p_partkey") % 3 != 0))  # v2
    return t.read(version=1)


@register(
    "cdc_scn_delta",
    sql="SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE s_suppkey % 4 = 1",
)
def cdc_scn_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-cursor incremental read (ref: ORA_ROWSCN branch,
    oracle_to_iceberg_cdc_operator.py:192-194) as an incremental snapshot
    scan: rows added between snapshot v1 and v2 — reads ONLY the files
    committed in that range, no content diffing."""
    cat = _scratch(spark)
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    t = cat.table("inv.supplier_inc")
    t.append(sup.where(F.col("s_suppkey") % 4 == 0))  # v1
    t.append(sup.where(F.col("s_suppkey") % 4 == 1))  # v2  <- the delta
    t.append(sup.where(F.col("s_suppkey") % 4 >= 2))  # v3
    return t.incremental_read(from_version=1, to_version=2)


@register(
    "maint_rollback",
    sql="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def maint_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollback to an earlier snapshot (ref: maint_rollback — stubbed at
    iceberg_snapshot_operator.py:158-173). v1=nation, v2=corrupted
    overwrite, rollback→v3 references v1's files; read-back == nation."""
    cat = _scratch(spark)
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("geo.nation_rb")
    t.append(nation)  # v1
    t.overwrite(nation.limit(3))  # v2: bad load
    maintenance.rollback(t, 1)  # v3
    return t.read()


@register(
    "maint_compact",
    sql="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def maint_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binpack compaction (ref: maint_compact,
    iceberg_compaction_operator.py:110-136): many small files in, few files
    out, content unchanged — the oracle checks content, tests check counts."""
    cat = _scratch(spark)
    ev = load_table(spark, sf_dir, "events")
    t = cat.table("stream.events_compact")
    t.append(ev.repartition(16))
    t.append(ev.limit(0))  # empty append → extra snapshot, no files
    maintenance.compact(t, target_file_size_mb=512)
    return t.read()


@register("maint_expire_snapshots", sql=None)  # wall-clock dependent
def maint_expire_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot aging (ref: maint_expire_snapshots,
    iceberg_aging_operator.py:118-146, defaults 7d/keep-10 at :62-63).
    Returns the surviving snapshot relation."""
    cat = _scratch(spark)
    region = load_table(spark, sf_dir, "region")
    t = cat.table("geo.region_age")
    for i in range(4):
        t.overwrite(region)
    # Expire everything but the last 2, regardless of age.
    maintenance.expire_snapshots(t, older_than_ms=2**62, retain_last=2)
    return maintenance.snapshot_list(t).select("version", "operation", "n_files")


@register(
    "maint_snapshot_list",
    sql="""
    SELECT CAST(1 AS INT) AS version, CAST(NULL AS INT) AS parent,
           'create' AS operation,
           (SELECT COUNT(*) FROM nation) AS total_rows
    UNION ALL
    SELECT 2, 1, 'append', (SELECT COUNT(*) FROM nation) + 5
    UNION ALL
    SELECT 3, 2, 'overwrite', (SELECT COUNT(*) FROM nation)
    """,
)
def maint_snapshot_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot history listing (ref: maint_snapshot_list,
    iceberg_snapshot_operator.py:130-156) — a metadata relation, not a
    driver-side chain walk. Wall-clock timestamps are projected away; the
    version chain, operations, and row accounting are deterministic and
    oracle-checked against the source table's cardinality."""
    cat = _scratch(spark)
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("geo.nation_hist")
    t.append(nation)
    t.append(nation.limit(5))
    t.overwrite(nation)
    return maintenance.snapshot_list(t).select(
        "version", "parent", "operation", "total_rows"
    )


@register("maint_snapshot_create", sql=None)
def maint_snapshot_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-snapshot report (ref: maint_snapshot_create,
    iceberg_snapshot_operator.py:117-128 — snapshots are created by
    writes; the op reports the current one)."""
    cat = _scratch(spark)
    t = cat.table("geo.region_cur")
    t.append(load_table(spark, sf_dir, "region"))
    return maintenance.current_snapshot_info(t)


@register(
    "maint_cherrypick",
    sql="""
    SELECT r_regionkey AS k, r_name AS name FROM region
    UNION ALL
    SELECT n_nationkey AS k, n_name AS name FROM nation
    """,
)
def maint_cherrypick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cherry-pick an append snapshot's files onto current (ref:
    maint_cherrypick — stubbed at iceberg_snapshot_operator.py:175-187).
    v1=regions, v2=+nation-append, rollback to v1, cherry-pick v2's adds."""
    cat = _scratch(spark)
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.col("r_name").alias("name")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")
    )
    t = cat.table("geo.mixed_cp")
    t.append(region)  # v1
    t.append(nation)  # v2
    maintenance.rollback(t, 1)  # v3 == v1
    maintenance.cherrypick(t, 2)  # v4 == v1 + v2's added files
    return t.read()


@register(
    "merge_partition_scoped",
    sql="""
    SELECT o_orderkey,
           CASE WHEN year(o_orderdate) = 1995 AND o_orderkey % 2 = 0
                THEN o_totalprice * 10 ELSE o_totalprice END AS o_totalprice,
           CAST(year(o_orderdate) AS INT) AS o_year
    FROM orders
    """,
)
def merge_partition_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE into an identity-partitioned table where the delta touches a
    single partition: file pruning keeps every other partition's files
    carried by reference (asserted in tests/test_tables.py) — the 100 TB
    property that a 1-partition delta rewrites ~1 partition, not the lake."""
    cat = _scratch(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    t = cat.table("sales.orders_by_year")
    t.create(orders, partition_by=["o_year"])

    delta = orders.where(
        (F.col("o_year") == 1995) & (F.col("o_orderkey") % 2 == 0)
    ).select(
        "o_orderkey", (F.col("o_totalprice") * 10).alias("o_totalprice"), "o_year"
    )
    snap = t.merge(delta, keys=["o_orderkey"])
    assert snap.summary["carried_files"] > 0, "partition pruning did not carry files"
    return t.read()


@register(
    "pipeline_complete_workflow",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(year(o_orderdate) AS INT) AS o_year
    FROM orders
    """,
)
def pipeline_complete_workflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `complete_workflow` DAG (airflow-dags/
    complete_workflow.py:40-69: transfer >> compaction >> aging) as one
    engine pipeline: two appends (scheduled transfers) → binpack
    compaction → snapshot expiry with retain_last. The oracle checks the
    surviving table content; the snapshot/file accounting is asserted
    inline — after expiry only the compacted history remains readable."""
    cat = _scratch(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    t = cat.table("analytics.daily_metrics")
    # Task 1 (transfer, two scheduled runs): append mode, many small files.
    t.append(orders.where(F.col("o_orderkey") % 2 == 0).repartition(4))
    t.append(orders.where(F.col("o_orderkey") % 2 == 1).repartition(4))
    files_before = len(t.snapshot().files)
    # Task 2 (compaction): binpack to the reference default 512 MB.
    maintenance.compact(t, target_file_size_mb=512)
    assert len(t.snapshot().files) < files_before
    # Task 3 (aging): expire everything but the latest snapshots
    # (reference defaults: 7d/retain_last=10 — here age is minutes old, so
    # retain_last drives the expiry).
    maintenance.expire_snapshots(t, older_than_ms=2**62, retain_last=1)
    assert len(t.snapshots()) == 1
    return t.read()


@register(
    "maint_cluster_zorder",
    sql="""
    SELECT o_orderkey, o_custkey, CAST(epoch_ms(o_orderdate) / 86400000 AS BIGINT) AS o_day
    FROM orders
    """,
)
def maint_cluster_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering rewrite (tables/maintenance.py::cluster_zorder) —
    the sort-strategy rewrite the reference's compaction operator lacks
    (iceberg_compaction_operator.py:110-136 implements binpack only).
    The oracle is the UNCLUSTERED source: a clustering rewrite must be
    content-identical, only the file layout (and thus min/max pruning)
    changes; tests/test_tables.py asserts the locality improvement."""
    cat = _scratch(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.unix_millis(F.col("o_orderdate").cast("timestamp")) / 86400000)
        .cast("bigint")
        .alias("o_day"),
    )
    t = cat.table("analytics.orders_z")
    # seed deliberately scattered (hash-partitioned on neither column)
    t.append(orders.repartition(8))
    maintenance.cluster_zorder(t, ["o_custkey", "o_day"], target_file_size_mb=1)
    return t.read()


@register(
    "maint_partition_evolution",
    sql="""
    SELECT l_orderkey, l_quantity,
           CAST(year(l_shipdate) AS INT) AS l_year, l_returnflag
    FROM lineitem
    WHERE year(l_shipdate) IN (1994, 1995)
    """,
)
def maint_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style partition evolution (metadata-only; the reference
    fixes partitioning at table creation, utils/catalog_manager.py:57-69):
    1994 data lands under spec [l_year], the spec evolves to
    [l_returnflag] in an O(1) commit, 1995 data lands under the new
    layout, and one read serves both layouts — each commit dir recovers
    its own Hive columns. At 100 TB evolving a spec costs one manifest
    write, zero data movement."""
    cat = _scratch(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity",
        F.year("l_shipdate").cast("int").alias("l_year"), "l_returnflag",
    )
    t = cat.table("sales.li_spec_evo")
    t.create(li.where(F.col("l_year") == 1994), partition_by=["l_year"])
    t.evolve_partition_spec(["l_returnflag"])
    t.append(li.where(F.col("l_year") == 1995))
    return t.read()
