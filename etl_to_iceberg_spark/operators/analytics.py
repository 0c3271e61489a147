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
