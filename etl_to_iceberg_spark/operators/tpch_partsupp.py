"""TPC-H partsupp tranche: Q2/Q11/Q16/Q20 — completing 22/22.

The fixture (TESTDATA.md) ships no ``partsupp`` table, so these queries run
over a DERIVED partsupp: a deterministic pure-integer expansion of
``part`` × 4 synthetic suppliers, computed identically by the Spark
implementation and the DuckDB oracle (the oracle carries the same
derivation as a CTE). All arithmetic is integer (+, ×, %) so the two
engines agree bit-for-bit; the only division is a final ``cents / 100.0``
display column.

Derivation (for each part, j ∈ 0..3):
  ps_suppkey          = (p_partkey·7 + j·13) mod S        (S = |supplier|)
  ps_availqty         = (p_partkey·31 + ps_suppkey·17) mod 9999 + 1
  ps_supplycost_cents = (p_partkey·59 + ps_suppkey·29) mod 92000 + 100

13·j mod S are distinct for j ∈ 0..3 (S = 100 in the fixture), so each
part gets 4 distinct suppliers — the real TPC-H multiplicity.

Scale notes: partsupp derives from ``part`` (a dimension ~1/7000th of
lineitem in real TPC-H), so even at 100 TB it's a mid-size table; the
supplier COUNT it needs is a 1-row broadcast, not a collect. Joins to
supplier/nation/region broadcast the dimension side; Q20's lineitem
aggregation pre-shrinks the fact table to (partkey, suppkey, qty) before
any join.

The reference implements none of these (SURVEY.md §2.3 — its engine has no
joins); they complete the relational surface its users run via Spark
(`/root/reference/airflow-plugins/spark/example_function_usage.py:66-89`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table

# The oracle-side derivation. Prepended to every query's SQL so the DuckDB
# oracle computes the exact same partsupp the Spark side does.
_PARTSUPP_CTE = """
WITH partsupp AS (
  SELECT ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents,
         ps_supplycost_cents / 100.0 AS ps_supplycost
  FROM (
    SELECT p.p_partkey AS ps_partkey,
           (p.p_partkey * 7 + t.j * 13) % s.cnt AS ps_suppkey,
           (p.p_partkey * 31 + ((p.p_partkey * 7 + t.j * 13) % s.cnt) * 17)
               % 9999 + 1 AS ps_availqty,
           (p.p_partkey * 59 + ((p.p_partkey * 7 + t.j * 13) % s.cnt) * 29)
               % 92000 + 100 AS ps_supplycost_cents
    FROM part p,
         (SELECT COUNT(*) AS cnt FROM supplier) s,
         generate_series(0, 3) t(j)
  )
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp table (see module docstring).

    The supplier count reaches the plan as a broadcast 1-row frame (no
    driver collect); the ×4 expansion is a JVM-side explode of a constant
    sequence — partsupp never shuffles to be built."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("__s")
    )
    exploded = part.crossJoin(F.broadcast(s_cnt)).select(
        "p_partkey",
        "__s",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__j"),
    )
    suppkey = (F.col("p_partkey") * 7 + F.col("__j") * 13) % F.col("__s")
    availqty = (F.col("p_partkey") * 31 + suppkey * 17) % 9999 + 1
    cents = (F.col("p_partkey") * 59 + suppkey * 29) % 92000 + 100
    return exploded.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.cast("bigint").alias("ps_suppkey"),
        availqty.cast("bigint").alias("ps_availqty"),
        cents.cast("bigint").alias("ps_supplycost_cents"),
        (cents / F.lit(100.0)).alias("ps_supplycost"),
    )


def _nation_of_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier ⋈ nation (broadcast dims): (s_suppkey, s_name, s_acctbal,
    n_name, n_regionkey)."""
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return supp.join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name", "n_regionkey")


@register(
    "q2_min_cost_supplier",
    sql=_PARTSUPP_CTE
    + """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
    FROM (
      SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
             ps.ps_supplycost, ps.ps_supplycost_cents, ps.ps_suppkey,
             MIN(ps.ps_supplycost_cents)
                 OVER (PARTITION BY ps.ps_partkey) AS min_cents
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
      JOIN part p ON ps.ps_partkey = p.p_partkey
                 AND p.p_size = 15 AND p.p_type = 'ECONOMY'
    )
    WHERE ps_supplycost_cents = min_cents
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: p_type = 'ECONOMY'
    stands in for the original's '%BRASS' suffix (fixture p_type is a
    plain enum).

    Scale shape: region/nation/part are broadcast dims; the min-cost
    lookup is the original's correlated subquery re-expressed as ONE
    window over ps_partkey (per-partition min + filter — a single shuffle
    of the EUROPE-filtered partsupp instead of a second scan + self-join).
    Ties on min cost keep all suppliers, per the original semantics."""
    ps = derived_partsupp(spark, sf_dir)
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp = _nation_of_suppliers(spark, sf_dir).join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    joined = ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey).join(
        F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        joined.withColumn("min_cents", F.min("ps_supplycost_cents").over(w))
        .where(F.col("ps_supplycost_cents") == F.col("min_cents"))
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey",
            "ps_suppkey",
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "ps_supplycost")
        .limit(100)
    )


@register(
    "q11_important_stock",
    sql=_PARTSUPP_CTE
    + """
    , national AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_cents * ps.ps_availqty AS value_cents
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
                   AND n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, SUM(value_cents) / 100.0 AS stock_value
    FROM national
    GROUP BY ps_partkey
    HAVING SUM(value_cents) > (SELECT SUM(value_cents) * 0.001 FROM national)
    ORDER BY stock_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose stock value
    at NATION_7's suppliers exceeds 0.1% of that nation's total.

    Scale shape: stock value is an INTEGER (cents × qty) so partial sums
    are exact and order-independent; the global threshold is a 1-row agg
    broadcast into the HAVING comparison (no driver collect, no second
    scan of the base tables — the per-part agg and the total derive from
    the same shuffled national frame)."""
    ps = derived_partsupp(spark, sf_dir)
    nat_supp = _nation_of_suppliers(spark, sf_dir).where(
        F.col("n_name") == "NATION_7"
    )
    national = ps.join(
        F.broadcast(nat_supp), ps.ps_suppkey == F.col("s_suppkey")
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias(
            "value_cents"
        ),
    )
    per_part = national.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("__v")
    )
    total = national.agg(F.sum("value_cents").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__v") > F.col("__total") * 0.001)
        .select(
            "ps_partkey", (F.col("__v") / F.lit(100.0)).alias("stock_value")
        )
        .orderBy(F.col("stock_value").desc(), "ps_partkey")
    )


@register(
    "q16_supplier_part_counts",
    sql=_PARTSUPP_CTE
    + """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the original
    excludes suppliers with complaint comments; the fixture has no
    s_comment, so negative account balance is the exclusion proxy (same
    NOT-IN anti-join shape; 6 suppliers match at sf0.01, so the exclusion
    is exercised).

    Scale shape: the exclusion list is a broadcast LEFT ANTI join
    (s_suppkey is non-null, so NOT IN ≡ anti-join); part is the broadcast
    dim; the only shuffle is the distinct-count aggregation."""
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 20, 25, 30)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(bad_supp),
            ps.ps_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promotion_suppliers",
    sql=_PARTSUPP_CTE
    + """
    , shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_6'
    JOIN partsupp ps ON ps.ps_suppkey = s.s_suppkey
    JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'red%'
    JOIN shipped q ON q.l_partkey = ps.ps_partkey
                  AND q.l_suppkey = ps.ps_suppkey
                  AND ps.ps_availqty > 100 * q.qty
    ORDER BY s_name, s_acctbal
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): NATION_6 suppliers holding
    a large multiple of a year's shipments of a 'red%' part. Adapted: the
    availqty > k·shipped test is an inner join on the 1996 per-(part,supp)
    shipment agg (the original's correlated subquery returns NULL — never
    matching — when nothing shipped, and an inner join preserves exactly
    that semantics). The original's ½ multiplier is raised to 100 because
    the derived ps_availqty (1..9999) dwarfs the fixture's per-pair annual
    shipments — measured at the sf0.01 gate, k=100 passes 2 of NATION_6's
    5 candidate pairs, so the threshold genuinely discriminates (k=0.5
    passed everything and the nation filter then emptied the result,
    making the check vacuous).

    Scale shape: lineitem is pre-aggregated to (partkey, suppkey, qty)
    with the year filter pushed to the scan BEFORE any join — the only
    full-fact shuffle is that one groupBy; part/supplier/nation broadcast.
    The quantity sum uses the exact-decimal discipline so the 0.5·qty
    threshold is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    ps = derived_partsupp(spark, sf_dir)
    red = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    supp = _nation_of_suppliers(spark, sf_dir).where(
        F.col("n_name") == "NATION_6"
    )
    return (
        ps.join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey"))
            & (F.col("ps_availqty") > 100 * F.col("qty")),
        )
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name", "s_acctbal")
    )
