"""TPC-H-shaped analytics, second tranche: Q4/Q7/Q8/Q12/Q13/Q18/Q19/Q22
adapted to the fixture's reduced schema (TESTDATA.md has no partsupp and no
commitdate/receiptdate/shipmode/container/phone columns — each query keeps
the reference query's join/aggregation *shape* and swaps the missing column
for an available proxy, noted per query).

The reference implements none of these (SURVEY.md §2.3/§2.5 — no joins, no
windows); they prove the relational capability its MERGE/upsert surface
depends on, at benchmark scale. The reference's own Spark example
(`/root/reference/airflow-plugins/spark/example_function_usage.py:66-89`)
is exactly this filter→join→groupBy→agg class.

Scale notes applied throughout: dimension sides broadcast; date/brand
filters pushed below the joins so the fact-table scans prune row groups;
exact-decimal sums (order-independent → bit-identical vs the DuckDB
oracle); LIMIT queries carry a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.functions import exact_sum, sql_exact_sum
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate <  DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = shipped after the order date
    (same EXISTS-semi-join shape as the original's commit<receipt test).

    Scale shape: the quarter filter prunes the orders scan before the
    shuffle; the semi join carries only (l_orderkey, l_shipdate) from
    lineitem and short-circuits per key — no row multiplication."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    sql=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_exact_sum("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             {_REVENUE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations by ship year. Six-way star join.

    Scale shape: nation is broadcast twice (25 rows); supplier and
    customer are pre-joined to their nation and filtered to the two
    nations of interest *before* touching the fact tables, so the big
    lineitem↔orders shuffle moves only qualifying keys; the date filter
    is pushed into the lineitem scan."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    two = nation.where(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(two), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(two), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        # half-open [1996-01-01, 1998-01-01): same rows as the oracle for
        # ANY time-of-day, incl. sub-second — a closed upper bound at
        # '1997-12-31 23:59:59' would disagree with the oracle's DATE
        # bound on intraday timestamps (q6/q12/q15 use the same idiom)
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    sql=f"""
    SELECT o_year,
           round(
             {sql_exact_sum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {sql_exact_sum("volume")}, 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_REVENUE} AS volume,
             n1.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND p_type = 'PROMO'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3 suppliers' share of
    PROMO-part revenue sold into ASIA-region customers, per order year.
    Eight-way join with a conditional-aggregate ratio.

    Scale shape: part/supplier/customer-nation-region all broadcast after
    their own filters; only lineitem↔orders shuffles. Numerator and
    denominator come out of ONE aggregation pass (conditional sum), not
    two scans; both are exact-decimal so the final double division is
    bit-identical to the oracle."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").where(
        # half-open upper bound: see q7's note on intraday timestamps
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.expr(_REVENUE)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                exact_sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0)
                )
                / exact_sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q12_priority_by_flag",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate <  DATE '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority), adapted: the fixture has no
    l_shipmode, so lines shipped in 1997 are grouped by l_returnflag
    instead — the conditional-count-by-priority aggregation shape is the
    original's.

    Scale shape: the ship-year filter prunes lineitem at the scan; the
    join shuffles on orderkey; the two conditional counts are one
    map-side-combinable aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_customer_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution), adapted: the exclusion filter
    lives on o_orderpriority (no o_comment column) but stays where the
    original puts it — inside the LEFT JOIN condition, so zero-order
    customers still appear with c_count=0.

    Scale shape: two cascaded aggregations; the first shuffles on
    custkey (same key as the join → Catalyst reuses the exchange), the
    second on the tiny c_count domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q18_large_orders",
    sql=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_exact_sum("l_quantity")} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customers): orders whose total quantity
    exceeds 250, with their customer, top-100 by price.

    Scale shape: the HAVING subquery is a pre-aggregation of lineitem on
    the SAME key (l_orderkey) as the main join — one shuffle feeds both;
    the qualifying-key set is tiny (~1% of orders) and joins semi-style
    before the customer broadcast. Top-100 is a TakeOrdered with
    o_orderkey as the unique tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        F.broadcast(big),
        F.col("o_orderkey") == big.l_orderkey,
        "left_semi",
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exact_sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    sql=f"""
    SELECT {sql_exact_sum(_REVENUE)} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: OR-of-ANDs across both
    join sides (brand/size from part, quantity from lineitem); no
    p_container/l_shipmode in the fixture so those conjuncts are dropped.

    Scale shape: Catalyst factors the common conjuncts per side — the
    brand/size disjunction prunes the part broadcast, the quantity
    disjunction (1..30 envelope) pushes into the lineitem scan — and the
    mixed residual evaluates post-join inside codegen. Single scalar
    output from a map-side-combinable sum."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
    )


@register(
    "q22_dormant_customers",
    sql="""
    SELECT c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        FROM customer
        WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= DATE '1999-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: country code comes
    from c_nationkey (no c_phone column) and "never ordered" becomes "no
    order since 1999" (every fixture customer has at least one order).
    Keeps the original's three-part shape: scalar-subquery average
    threshold, NOT-EXISTS anti join, grouped count/sum.

    Scale shape: the average is ONE tiny scalar aggregate broadcast into
    the filter (no driver collect); the anti join broadcasts the
    distinct recent-order custkeys; the exact-decimal average makes the
    threshold comparison bit-identical to the oracle."""
    nations = [1, 2, 3, 4, 5, 6, 7]
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(nations)
    )
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
