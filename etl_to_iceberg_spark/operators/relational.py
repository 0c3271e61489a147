"""Core relational operator inventory (SURVEY.md §2.1-2.7), declared as
registry queries over the driver fixtures.

Each query here is the Spark-first restatement of a reference behavior,
cited by file:line into ``/root/reference``. All plans are pure DataFrame
expressions: Catalyst gets full freedom for pushdown / pruning / join
strategy, and every aggregate that a checker hashes uses the exact-decimal
pattern from :mod:`etl_to_iceberg_spark.functions`.

Scale notes are inline per operator — the fixtures are small, but each plan
is written for the 100 TB shape (broadcast the dimension, shuffle only on
declared keys, never collect).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_to_iceberg_spark.functions import (
    exact_sum,
    sql_exact_sum,
)
from etl_to_iceberg_spark.normalize import lower_names, nan_to_null, prepare_dataframe
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.files import read_orc
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.scratch import scratch_dir

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary.
# The reference's only genuine analytics workload is the grouped-sum example
# (spark/example_function_usage.py:66-89); this is that shape on lineitem.
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → hash-aggregate. Scale: filter is pushed to the parquet scan
    (PushedFilters on l_shipdate); aggregation is partial (map-side) then
    final on 2 low-cardinality keys — shuffle carries only ~|groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            (exact_sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_sum('l_quantity')} AS sum_qty,
           {sql_exact_sum('l_extendedprice')} AS sum_base_price,
           {sql_exact_sum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
           {sql_exact_sum('l_quantity')} / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)(q1_pricing_summary)


# ---------------------------------------------------------------------------
# 2.1 Scans (file-based analogues; live JDBC path is sources/jdbc.py)
# ---------------------------------------------------------------------------


@register(
    "scan_jdbc_table",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def scan_jdbc_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection+predicate scan — the semantics of the reference's generated
    `SELECT {cols} FROM {tbl} WHERE {pred}` (oracle_to_iceberg/hooks.py:107-137).
    Against a live database this is sources.jdbc.read_jdbc_table (Catalyst
    pushes select/where into the remote SQL); here the same declarative plan
    over parquet — PushedFilters + ReadSchema confirm pushdown."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "scan_jdbc_chunked",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 4 = 1
    """,
)
def scan_jdbc_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned parallel scan — replaces the reference's sequential
    pandas chunking (hooks.py:128-134). One partition's worth shown here
    (key mod 4 == 1), the exact per-task predicate Spark's JDBC
    partitionColumn machinery generates; all N run concurrently."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") % 4 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "scan_jdbc_direct",
    sql="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def scan_jdbc_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native direct source read (ref: scan_jdbc_direct,
    spark/example_function_usage.py:48-56 — spark.read.format('jdbc') with
    the ojdbc driver). The engine path is sources.jdbc.read_jdbc_table;
    here the same whole-table declarative scan over the fixture."""
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


_csv_json_cache: dict[tuple[str, str], str] = {}
_hive_layout_cache: dict[str, str] = {}


def _events_as(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Materialize events once per (process, sf_dir, format)."""
    key = (os.path.abspath(sf_dir), fmt)
    if key not in _csv_json_cache:
        out = os.path.join(scratch_dir(prefix=f"e2is_{fmt}_"), f"events_{fmt}")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        ev.write.mode("overwrite").format(fmt).option("header", "true").save(out)
        _csv_json_cache[key] = out
    return _csv_json_cache[key]


@register(
    "scan_csv_files",
    sql="SELECT event_id, user_id, event_type, value FROM events",
)
def scan_csv_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV dataset scan with explicit schema (no inference pass — at scale
    schema inference is a full extra read). Round-trips events through CSV."""
    from etl_to_iceberg_spark.sources.files import read_files

    path = _events_as(spark, sf_dir, "csv")
    return read_files(
        spark,
        path,
        "csv",
        schema="event_id long, user_id long, event_type string, value double",
        options={"header": "true"},
    )


@register(
    "scan_json_files",
    sql="SELECT event_id, user_id, event_type, value FROM events",
)
def scan_json_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines dataset scan with explicit schema (same rationale)."""
    from etl_to_iceberg_spark.sources.files import read_files

    path = _events_as(spark, sf_dir, "json")
    return read_files(
        spark,
        path,
        "json",
        schema="event_id long, user_id long, event_type string, value double",
    ).select("event_id", "user_id", "event_type", "value")


_orc_cache: dict[str, str] = {}


def _events_as_orc(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as a small ORC dataset once per (process, sf_dir)."""
    key = os.path.abspath(sf_dir)
    if key not in _orc_cache:
        out = os.path.join(scratch_dir(prefix="e2is_orc_"), "events_orc")
        load_table(spark, sf_dir, "events").write.mode("overwrite").orc(out)
        _orc_cache[key] = out
    return _orc_cache[key]


@register(
    "scan_orc_files",
    sql="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def scan_orc_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file ORC scan (ref: hdfs_to_iceberg hooks.py:86-112 +
    operator :268). Spark's native recursive listing and schema merge
    replace the WebHDFS walk; round-trips events through ORC."""
    path = _events_as_orc(spark, sf_dir)
    return read_orc(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@register(
    "scan_orc_fallback",
    sql="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def scan_orc_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file read + union fallback (ref: hdfs_to_iceberg_operator.py:270-287).
    Spark needs no fallback (multi-file is native) — shown as
    unionByName over per-file DataFrames; same result, one job."""
    import glob as _glob

    path = _events_as_orc(spark, sf_dir)
    files = sorted(_glob.glob(os.path.join(path, "*.orc")))
    dfs = [read_orc(spark, f) for f in files]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.select("event_id", "ts", "user_id", "event_type", "value", "props")


@register("meta_table_count", sql="SELECT COUNT(*) AS row_count FROM orders")
def meta_table_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source row count (ref: get_table_count, hooks.py:73-77)."""
    return load_table(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("row_count"))


@register("meta_columns", sql=None)  # type names are engine-specific -> rows-only
def meta_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema introspection (ref: get_table_columns, hooks.py:79-105):
    (column_name, data_type, nullable) per column, ordered by position."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = [
        (i + 1, f.name, f.dataType.simpleString(), f.nullable)
        for i, f in enumerate(li.schema.fields)
    ]
    return spark.createDataFrame(
        rows, "column_id int, column_name string, data_type string, nullable boolean"
    )


@register("meta_file_info", sql=None)  # physical sizes are env-specific
def meta_file_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file size/mtime metadata via the hidden _metadata column — one
    metadata-only scan replaces the reference's per-file REST stat loop
    (hdfs_to_iceberg/hooks.py:114-136)."""
    from etl_to_iceberg_spark.sources.files import list_data_files

    return list_data_files(spark, os.path.join(sf_dir, "lineitem.parquet")).select(
        "file_path", "file_size"
    )


# ---------------------------------------------------------------------------
# 2.2 Projections / filters
# ---------------------------------------------------------------------------


@register(
    "project_columns",
    sql="SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection (ref: hooks.py:116-121). ReadSchema in the plan
    shows only 3 of 5 columns leave the parquet scan."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")


@register(
    "filter_where",
    sql="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer
    WHERE c_acctbal > 1000 AND c_nationkey = 10
    """,
)
def filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary conjunctive predicate (ref: where_clause splice,
    hooks.py:123-124; README.md:281 'SALARY > 50000 AND DEPARTMENT_ID = 10').
    Expressed declaratively so both conjuncts push to the scan."""
    return (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_acctbal") > 1000) & (F.col("c_nationkey") == 10))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )


@register(
    "filter_gt_scalar",
    sql="SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE s_acctbal > 5000",
)
def filter_gt_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric comparison filter (ref: example_function_usage.py:27)."""
    return (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "filter_ts_gt",
    sql="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def filter_ts_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-cursor delta predicate (ref: oracle_to_iceberg_cdc_operator.py:182-191,
    `ts > TO_TIMESTAMP(last, ...)`)."""
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "filter_version_gt",
    sql="SELECT event_id, user_id, event_type, value FROM events WHERE event_id > 5000",
)
def filter_version_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version/SCN delta predicate (ref: ORA_ROWSCN branch,
    oracle_to_iceberg_cdc_operator.py:192-194) on the monotone event_id."""
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") > 5000)
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# 2.3 Joins (the capability the reference's MERGE path depends on)
# ---------------------------------------------------------------------------


@register(
    "join_orders_customer",
    sql=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS order_count,
           {sql_exact_sum('o.o_totalprice')} AS total_revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dimension join + rollup. Scale: customer is the small side —
    broadcast() makes this a map-side join with NO shuffle of the orders
    fact; only the tiny post-agg result shuffles. At 100 TB the alternative
    (sort-merge) would shuffle the entire fact table."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            exact_sum("o_totalprice").alias("total_revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_multiway_star",
    sql=f"""
    SELECT n.n_name,
           COUNT(*) AS num_lineitems,
           {sql_exact_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway star join (lineitem⋈orders⋈customer⋈nation). Scale: nation
    and customer broadcast; lineitem⋈orders co-shuffles on orderkey once.
    Catalyst+AQE reorders and picks strategies; we only hint the broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_lineitems"),
            exact_sum(rev).alias("revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "anti_join_new_files",
    sql="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def anti_join_new_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti set difference — the Spark form of the reference's
    'files not yet processed' Python set-diff
    (hdfs_to_iceberg_cdc_operator.py:220-225): listing vs checkpoint becomes
    listing ANTI JOIN processed. Here: orders with no lineitems."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "semi_join_active_customers",
    sql="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# 2.4 Aggregations
# ---------------------------------------------------------------------------


@register("agg_count_rows", sql="SELECT COUNT(*) AS cnt FROM lineitem")
def agg_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar count (ref: hooks.py:73-77; df.count() at
    hdfs_to_iceberg_operator.py:290 — but as a lazy plan, not an eager
    double-scan before the write)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "agg_sum_groupby",
    sql=f"""
    SELECT l_returnflag AS product_group, l_linestatus AS region_group,
           {sql_exact_sum('l_extendedprice')} AS total_amount,
           {sql_exact_sum('l_quantity')} AS total_quantity
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY product_group, region_group
    """,
)
def agg_sum_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum — the reference's example workload
    (example_function_usage.py:81-84: groupBy(product_id, region)
    .agg(sum(amount), sum(quantity)) renamed to total_*)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("product_group"),
            F.col("l_linestatus").alias("region_group"),
        )
        .agg(
            exact_sum("l_extendedprice").alias("total_amount"),
            exact_sum("l_quantity").alias("total_quantity"),
        )
        .orderBy("product_group", "region_group")
    )


@register(
    "agg_max_cursor",
    sql="""
    SELECT CAST(MAX(ts) AS TIMESTAMP) AS last_timestamp,
           MAX(event_id) AS last_scn
    FROM events
    """,
)
def agg_max_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-derived CDC cursor = max(ts)/max(version) of the batch — fixing
    the reference's wall-clock cursor (oracle_to_iceberg_cdc_operator.py:288)
    which loses or duplicates rows under clock skew."""
    return load_table(spark, sf_dir, "events").agg(
        F.max("ts").alias("last_timestamp"),
        F.max("event_id").alias("last_scn"),
    )


@register(
    "agg_distinct_users",
    sql="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*) AS events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (beyond the reference; SURVEY §2.4 notes it's a
    Spark one-liner). Expands to a two-stage partial/final plan."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("events"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_rollup_orders",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (extension; SURVEY §2.4)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# 2.5 Windows / sort / limit
# ---------------------------------------------------------------------------


@register(
    "dedup_latest_per_key",
    sql="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-row-per-key — the documented upsert dedup the reference
    promises but stubs (README.md:594-606 vs cdc_operator.py:211-221).
    row_number over (pk ORDER BY ts DESC); tie-broken by event_id so the
    result is deterministic. Scale: single hash shuffle on the key, no
    driver involvement."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@register(
    "window_running_sum",
    sql="""
    SELECT event_id, user_id, ts, value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS seq
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + sequence number per user (window-function surface;
    the reference's closest analogue is its ordered snapshot-chain walk,
    iceberg_snapshot_operator.py:134-150, done in driver Python)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@register(
    "topk_orders",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by sort+limit (snapshot-listing analogue). Spark runs this as
    TakeOrderedAndProject — per-partition top-100 then a driver merge of k
    rows, NOT a global sort; exactly what you want at scale. Tie-break on
    the unique key keeps it deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# 2.6 Set operations
# ---------------------------------------------------------------------------


@register(
    "union_all_files",
    sql="""
    SELECT * FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT * FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def union_all_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-way UNION ALL of per-file DataFrames (ref: reduce(union),
    hdfs_to_iceberg_operator.py:270-287) — unionByName for schema safety;
    Spark unions are metadata-only (no shuffle, partitions concatenate)."""
    orders = load_table(spark, sf_dir, "orders")
    even = orders.where(F.col("o_orderkey") % 2 == 0)
    odd = orders.where(F.col("o_orderkey") % 2 == 1)
    return even.unionByName(odd)


# ---------------------------------------------------------------------------
# 2.7 Scalar functions
# ---------------------------------------------------------------------------


@register(
    "fn_lower_names",
    sql="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def fn_lower_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower-case column names (ref: dataframe_utils.py:13) — metadata-only
    rename, zero execution cost. Demonstrated by upper-casing then
    normalizing back."""
    cust = load_table(spark, sf_dir, "customer")
    shouting = cust.toDF(*[c.upper() for c in cust.columns])
    return lower_names(shouting)


@register(
    "fn_null_normalize",
    sql="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_clean
    FROM events
    """,
)
def fn_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN→NULL normalization (ref: dataframe_utils.py:16). NaNs are
    injected (fixtures have none) then scrubbed by the normalize pass."""
    ev = load_table(spark, sf_dir, "events")
    dirty = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(float("nan")))
        .otherwise(F.col("value"))
        .alias("value_clean"),
    )
    return nan_to_null(dirty)


@register(
    "fn_infer_timestamp",
    sql="""
    SELECT event_id,
           strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f'),
                    '%Y-%m-%d %H:%M:%S.%f') AS ts_parsed
    FROM events
    """,
)
def fn_infer_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→timestamp inference (ref: dataframe_utils.py:19-25) made
    deterministic: the string column round-trips through the normalize
    pass's whole-column parse check instead of pandas try/except."""
    from etl_to_iceberg_spark.normalize import infer_timestamps

    ev = load_table(spark, sf_dir, "events")
    stringly = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_parsed"),
    )
    return infer_timestamps(stringly, ["ts_parsed"])


@register(
    "fn_type_cast",
    sql="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_no,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_dec,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(l_returnflag AS VARCHAR) AS flag_str
    FROM lineitem
    """,
)
def fn_type_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative type casts — the engine-side analogue of the reference's
    Oracle→Iceberg mapping applied per column (utils/type_converter.py:6-42;
    faithful NUMBER(p,s)→Decimal per types.py, not the lossy Long).

    The DECIMAL cast is the operator under test; the checked projection
    casts it back to DOUBLE (registry determinism discipline) because the
    two engines surface identical decimal VALUES under different in-memory
    representations (verified bit-identical at sf0.01), which a
    representation-sensitive hash would misreport as a mismatch."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_no"),
        F.col("l_quantity").cast("decimal(12,2)").cast("double").alias("qty_dec"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.col("l_returnflag").cast("string").alias("flag_str"),
    )


@register(
    "fn_type_cast_decimal",
    sql=None,  # rows-only: the point IS the DECIMAL schema surface
)
def fn_type_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECIMAL outputs of fn_type_cast surfaced DIRECTLY — schema check
    sees DecimalType(12,2)/(18,2), demonstrating the faithful
    NUMBER(p,s)→Decimal mapping (utils/type_converter.py:6-42; reference
    maps NUMBER lossily to Long). Registered rows-only (sql=None) because
    a value-hash over in-memory decimal representations is engine-specific
    even when the values agree — the value-level parity of the same cast
    is covered by fn_type_cast's DOUBLE-projected hash check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_no"),
        F.col("l_quantity").cast("decimal(12,2)").alias("qty_dec"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price_dec"),
    )


@register(
    "fn_try_cast",
    sql="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_num
    FROM orders
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-free typed ingest: ``try_cast`` yields NULL on malformed
    input instead of failing the job ('1-URGENT' as a whole is not a
    number → NULL; its leading digit is → typed). The row-level analogue
    of the JSONL scan's PERMISSIVE corrupt-record quarantine: at 100 TB
    one bad record must never kill a 6-hour job."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias(
            "priority_num"
        ),
    )


@register(
    "fn_ts_format",
    sql="""
    SELECT event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS ds
    FROM events
    """,
)
def fn_ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting (ref: fn_ts_format — TO_TIMESTAMP format strings
    at oracle_to_iceberg_cdc_operator.py:153,186)."""
    from etl_to_iceberg_spark.functions import ts_format

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ts_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        ts_format("ts", "yyyy-MM-dd").alias("ds"),
    )


@register(
    "fn_date_arith",
    sql="""
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 14 DAY
      AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type ORDER BY event_type
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic horizon (ref: now - timedelta(days=N) for snapshot
    expiry, iceberg_aging_operator.py:188-191) — anchored to a literal so
    the query is deterministic; the maintenance layer passes the real now."""
    anchor = F.lit("2024-01-20 00:00:00").cast("timestamp")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(
            (F.col("ts") >= anchor - F.expr("INTERVAL 14 DAYS")) & (F.col("ts") < anchor)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


@register(
    "fn_path_parse",
    sql="""
    SELECT doc_id,
           regexp_extract('/warehouse/docs/src=' || source || '/part-' ||
                          CAST(doc_id AS VARCHAR) || '.parquet',
                          'src=([^/]+)', 1) AS src_value
    FROM documents
    """,
)
def fn_path_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-value extraction from a path string (ref: fn_path_parse,
    hdfs_to_iceberg_operator.py:84-101) via regexp_extract — normally free
    via Spark partition discovery (sources/files.py)."""
    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/warehouse/docs/src="),
        F.col("source"),
        F.lit("/part-"),
        F.col("doc_id").cast("string"),
        F.lit(".parquet"),
    )
    return docs.select(
        "doc_id", F.regexp_extract(path, "src=([^/]+)", 1).alias("src_value")
    )


@register(
    "fn_epoch_ms",
    sql="""
    SELECT event_id,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
           CAST(to_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) / 1000) AS TIMESTAMP)
               AS ts_restored
    FROM events
    """,
)
def fn_epoch_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp↔epoch-ms conversion (ref: fn_epoch_ms,
    hdfs_to_iceberg_cdc_operator.py:293)."""
    from etl_to_iceberg_spark.functions import epoch_ms, from_epoch_ms

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        epoch_ms("ts").alias("ts_ms"),
        from_epoch_ms(epoch_ms("ts")).alias("ts_restored"),
    )


@register(
    "fn_json_extract",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column —
    the engine's replacement for the reference's driver-side json.loads of
    checkpoint blobs (hdfs_to_iceberg_cdc_operator.py:150-167), done as a
    column expression."""
    from etl_to_iceberg_spark.functions import json_get

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", json_get("props", "$.k").cast("bigint").alias("k_value")
    )


# ---------------------------------------------------------------------------
# Normalization pipeline (reference prepare_dataframe, end-to-end)
# ---------------------------------------------------------------------------


@register(
    "normalize_pipeline",
    sql="""
    SELECT event_id, ts, user_id, event_type,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
    FROM events
    """,
)
def normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full prepare_dataframe pass (ref: dataframe_utils.py:5-27):
    upper-cased names + injected NaNs in, normalized names + NULLs out."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type",
        F.when(F.col("event_type") == "error", F.lit(float("nan")))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    messy = ev.toDF(*[c.upper() for c in ev.columns])
    return prepare_dataframe(messy)


@register(
    "scan_hive_partitioned",
    sql="""
    SELECT event_id, user_id, value, event_type FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
)
def scan_hive_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout directory scan with native partition discovery +
    pruning (ref: the manual path-parsing + per-partition grouping of
    hdfs_to_iceberg_operator.py:84-123, replaced wholesale): the dataset
    is laid out as event_type=<v>/ directories; the IN-filter prunes at
    the FILE INDEX, so non-matching partitions are never opened."""
    key = os.path.abspath(sf_dir)
    if key not in _hive_layout_cache:
        # materialized once per (process, sf_dir) — like _events_as; a
        # per-call mkdtemp+write would make bench loops time the WRITE and
        # leak one full copy of events per run
        work = os.path.join(scratch_dir(prefix="e2is_hive_"), "events_hive")
        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value", "event_type"
        ).write.mode("overwrite").partitionBy("event_type").parquet(work)
        _hive_layout_cache[key] = work
    scanned = spark.read.parquet(_hive_layout_cache[key]).where(
        F.col("event_type").isin("purchase", "signup")
    )
    return scanned.select("event_id", "user_id", "value", "event_type")
