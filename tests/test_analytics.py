"""Analytics operator semantics beyond the DuckDB parity gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_to_iceberg_spark.sources.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL++ estimate stays within 5x the requested rsd of the exact count
    (generous bound; rsd is a standard deviation, not a hard limit)."""
    ev = load_table(spark, sf_dir, "events")
    merged = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(merged) > 0
    for r in merged:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.10 * r["exact"]), r


def test_q3_plan_broadcasts_and_pushes_down(spark, sf_dir):
    from etl_to_iceberg_spark.operators.analytics import q3_shipping_priority

    plan = q3_shipping_priority(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrdered" in plan


def test_range_join_broadcasts_tiers(spark, sf_dir):
    from etl_to_iceberg_spark.operators.analytics import join_range_tiers

    plan = join_range_tiers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # the theta join must be broadcast (nested loop over the tiny tier
    # side), never a cartesian shuffle of the fact table
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_hive_scan_prunes_partitions(spark, sf_dir):
    from etl_to_iceberg_spark.operators.relational import scan_hive_partitioned

    df = scan_hive_partitioned(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the IN-predicate must land in PartitionFilters (file-index pruning),
    # not in a post-scan Filter over the data
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:400]


def test_q6_pushes_all_predicates(spark, sf_dir):
    from etl_to_iceberg_spark.operators.analytics import q6_forecast_revenue

    plan = q6_forecast_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:", 1)[1].split("\n", 1)[0]
    for frag in ["l_shipdate", "l_discount", "l_quantity"]:
        assert frag in pushed, f"{frag} not pushed: {pushed}"


def test_hll_rollup_estimate_close_to_exact(spark, sf_dir):
    from etl_to_iceberg_spark.operators.sketches import agg_hll_rollup_merge
    from etl_to_iceberg_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    est = {
        r.event_type: r.distinct_users
        for r in agg_hll_rollup_merge(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) / max(n, 1) < 0.05, (t, est[t], n)
