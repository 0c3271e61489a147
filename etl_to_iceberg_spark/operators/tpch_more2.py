"""TPC-H-shaped analytics, third tranche: Q9/Q15/Q17/Q21 adapted to the
fixture's reduced schema (no partsupp table, no commit/receipt dates — see
`tpch_more.py` for the adaptation policy). With these the engine covers
every TPC-H query expressible over the fixture star schema:
1,3,4,5,6,7,8,9,10,12,13,14,15,17,18,19,21,22 (2/11/16/20 need partsupp).

The reference implements no joins or subqueries at all (SURVEY.md §2.3);
these prove the correlated-subquery / multi-EXISTS / scalar-max shapes on
top of Catalyst with the physical plans a 100 TB run needs (broadcast
dims, single-key shuffle reuse, window-instead-of-self-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_to_iceberg_spark.functions import exact_sum, sql_exact_sum
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"
# Q9 profit without ps_supplycost: cost ≈ 60% of the part's retail price.
_PROFIT = "l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity"


@register(
    "q9_profit_by_nation",
    sql=f"""
    SELECT nation, o_year, {sql_exact_sum("amount")} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_PROFIT} AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type = 'ECONOMY'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: no partsupp in the
    fixture, so supply cost is proxied as 60% of p_retailprice (keeps the
    5-way join + derived-column aggregation shape); the part filter is
    p_type = 'ECONOMY' instead of p_name LIKE.

    Scale shape: part (filtered) and supplier⋈nation broadcast; the only
    shuffle is lineitem⋈orders on orderkey, then one partial+final hash
    aggregate over (nation, year)."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(exact_sum(F.expr(_PROFIT)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q15_top_supplier",
    sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_exact_sum(_REVENUE)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    revenue — the view + scalar-MAX-subquery query.

    Scale shape: the revenue "view" is computed once and reused for both
    the ranking and the max (Spark reuses the shuffle via the cached
    logical subtree; at this size the re-aggregation is trivial either
    way); the one-row max broadcasts into the filter, supplier
    broadcasts into the final join. Revenue is exact-decimal so the
    equality comparison against MAX is bit-safe."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum(F.expr(_REVENUE)).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(*))
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost if orders
    below 20% of a part's average quantity were not taken.

    Scale shape: the correlated per-part average is a WINDOW aggregate
    over the part key instead of the textbook self-join — one shuffle on
    l_partkey serves both the average and the filter, halving the
    lineitem traffic. The brand filter prunes via the part broadcast
    before the window. The average is exact-decimal-sum / count so the
    0.2×avg threshold is bit-identical to the oracle."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .withColumn("part_avg_qty", avg_qty)
        .where(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q21_suppliers_kept_waiting",
    sql="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
      AND r_name = 'EUROPE'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept waiting), adapted: "late" =
    shipped more than 60 days after the order date (no
    commit/receipt dates in the fixture), and the supplier scope is a
    region rather than one nation (a single fixture nation yields zero
    qualifying rows at small SF). A supplier "kept the order waiting"
    when its line was late, the order has another supplier, and no
    OTHER supplier was late.

    Scale shape: the textbook double-EXISTS self-join is rewritten as
    ONE grouped pass over the order's lines — per orderkey, count
    distinct suppliers and distinct late suppliers — then re-joined to
    the late lines on the same orderkey (one shuffle key end to end,
    no correlated re-scans of lineitem). Supplier⋈nation broadcasts."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", late)
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    europe = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(europe), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        li.where(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("g_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
