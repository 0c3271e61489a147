"""Analytic benchmark queries: multi-way join + agg + top-k (TPC-H Q3
shape), ranking windows, exact distribution statistics.

The reference has no joins, windows, or percentile aggregates (SURVEY
§2.3/§2.5) — but its Spark example workload (`/root/reference/
airflow-plugins/spark/example_function_usage.py:66-89`) is exactly this
class of analytics, so the rebuild proves the full shape over the star
schema. All heavy queries follow the engine's determinism discipline:
exact-decimal sums, unique tie-break keys, literal time anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_to_iceberg_spark.functions import exact_sum, sql_exact_sum
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "q3_shipping_priority",
    sql=f"""
    SELECT l_orderkey,
           {sql_exact_sum(_REVENUE)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate  > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way join, filtered both sides,
    grouped revenue, top-10.

    Scale shape: both date filters reach the scans (predicate pushdown →
    only qualifying row groups are read); customer is the small side and
    broadcast; the lineitem↔orders join shuffles on orderkey only after
    lineitem is pre-filtered. Top-10 is a TakeOrdered, not a full sort."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "window_rank_lag",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           round(o_totalprice
                 - CAST(AVG(CAST(o_totalprice AS DECIMAL(18,6))) OVER
                        (PARTITION BY o_custkey) AS DOUBLE), 6)
               AS delta_vs_avg
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + frame-less analytics windows in one pass: per-customer
    order sequence, lag/lead of the price, and delta vs the customer's
    average. One shuffle on the partition key serves all four functions
    (Catalyst merges same-spec windows into a single Window node)."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wavg = Window.partitionBy("o_custkey")
    avg_price = (
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(wavg).cast("double")
        / F.count(F.lit(1)).over(wavg)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).alias("order_seq"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.col("o_totalprice") - avg_price, 6).alias("delta_vs_avg"),
    )


@register(
    "agg_grouping_sets",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent rollup dimensions in ONE
    pass — Spark plans a single Expand + hash aggregate, not two scans).
    Also exercises the SQL front door: the engine registers the loaded
    table as a view and plans through ``spark.sql``."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "join_range_tiers",
    sql=f"""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1e18)
    )
    SELECT tier, COUNT(*) AS n, {sql_exact_sum('value')} AS sum_value
    FROM events JOIN tiers ON value >= lo AND value < hi
    GROUP BY tier
    """,
)
def join_range_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: each event lands in the tier whose
    [lo, hi) bracket contains its value.

    Scale shape: the range side is small by construction (brackets), so
    it is BROADCAST and the theta-join is a broadcast nested loop over a
    handful of rows per event — the fact table never shuffles. A
    range-join between two big sides would instead bucket both by range
    floor (band join); that composition is `agg_salted_skew`'s territory."""
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e18)],
        "tier string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (ev.value >= tiers.lo) & (ev.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("value").alias("sum_value"))
    )


@register(
    "set_intersect_except",
    sql="""
    (SELECT user_id FROM events WHERE event_type = 'purchase'
     INTERSECT
     SELECT user_id FROM events WHERE event_type = 'view')
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error'
      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00'
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra (users who purchased AND viewed,
    minus those who errored in the first week) — completes the set-op
    family next to union/semi/anti. Catalyst executes both as aggregated
    joins (distinct + left-semi / left-anti), so they shuffle once per
    operand on the compare key."""
    ev = load_table(spark, sf_dir, "events")
    of_type = lambda t: ev.where(F.col("event_type") == t).select("user_id")  # noqa: E731
    early_errors = ev.where(
        (F.col("event_type") == "error")
        & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
    ).select("user_id")
    return of_type("purchase").intersect(of_type("view")).subtract(early_errors)


@register("agg_approx_distinct", sql=None)  # approximate by design (HLL)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count — the
    scale path for distinct cardinality: mergeable constant-size sketches,
    one map-side partial per partition, no exact-distinct expansion
    (`agg_distinct_users` carries the exact oracle). Accuracy asserted
    within rsd bounds in tests/test_analytics.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "agg_percentiles",
    sql="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) per-group percentiles of the value
    distribution — the data-profiling aggregate behind skew detection and
    outlier filters. Exact `percentile` needs per-group sorted values (one
    shuffle); at 100 TB swap in `approx_percentile` (t-digest, mergeable
    partial aggs) — same call shape, documented trade."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            *[
                F.round(F.percentile("value", F.lit(q)), 6).alias(name)
                for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.95, "p95")]
            ]
        )
        .orderBy("event_type")
    )


@register(
    "agg_collect_ordered",
    sql="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|')
               AS event_types,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregation: the distinct event types per user as a
    SORTED array (collect_set is unordered — the sort makes the result
    deterministic and therefore checkable; same discipline as top-k
    tie-breaks). The checked surface joins the array to a '|'-string:
    value-hash comparators don't hash raw array cells, and the string is
    bijective with the sorted array for these enum-like values."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("event_type"))).alias("event_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "window_moving_avg",
    sql="""
    SELECT event_id, event_type, ts, value,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS mov_avg_7
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame moving average (7 rows per series): the smoothing
    window every metrics pipeline runs. Exact-decimal sum over the frame
    keeps the result order-independent; one shuffle+sort on the series key
    serves the whole frame family."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    mov = (
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return ev.select(
        "event_id", "event_type", "ts", "value",
        F.round(mov, 6).alias("mov_avg_7"),
    )


@register(
    "filter_scalar_subquery",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.9 * (
        SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        FROM orders)
    """,
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate (orders above 1.9x the global average).
    Catalyst plans the subquery as an independent one-row stage broadcast
    into the filter — no self-join, no driver round trip in the plan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_ssq
        WHERE o_totalprice > 1.9 * (
            SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
            FROM orders_ssq)
        """
    )


@register(
    "q5_local_supplier_volume",
    sql=f"""
    SELECT n_name,
           {sql_exact_sum(_REVENUE)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way star join with the
    customer-nation = supplier-nation equality, one-region / one-year
    filters, revenue per nation.

    Scale shape: region/nation/supplier/customer all broadcast (dims);
    lineitem⋈orders is the only shuffle pair. The c_nationkey=s_nationkey
    constraint rides the supplier broadcast join as an extra key — no
    additional shuffle."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q10_returned_items",
    sql=f"""
    SELECT c_custkey, c_name,
           {sql_exact_sum(_REVENUE)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1995-10-01'
      AND o_orderdate <  DATE '1996-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter of orders × returned
    lineitems, revenue per customer, top-20. Both date and returnflag
    predicates push to the scans; top-20 is TakeOrdered with the custkey
    tie-break."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q6_forecast_revenue",
    sql=f"""
    SELECT {sql_exact_sum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure predicate + scalar
    aggregate — the canonical pushdown benchmark. All four predicates
    reach the parquet scan; the plan is scan → partial agg → single-row
    final agg, no shuffle of data rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q14_promo_effect",
    sql=f"""
    SELECT round(
        100.0 * {sql_exact_sum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REVENUE} ELSE 0 END")}
        / {sql_exact_sum(_REVENUE)}, 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-09-01'
      AND l_shipdate <  DATE '1996-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional revenue share in one
    month. Part is broadcast; both exact-decimal sums come out of a single
    aggregation pass (no second scan for the denominator)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("date"))
    )
    rev = F.expr(_REVENUE)
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * exact_sum(promo_rev) / exact_sum(rev), 6
            ).alias("promo_revenue_pct")
        )
    )
