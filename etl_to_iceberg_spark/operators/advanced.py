"""Advanced relational operators beyond the reference's surface: as-of
join, pivot, cube, time-series rollup, SCD2 changelog.

The reference has none of these (SURVEY §2.3/§2.5 — no joins, no windows);
they are standard capabilities of the engines it feeds, so the rebuild
carries them as first-class, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from etl_to_iceberg_spark.functions import sql_exact_sum, exact_sum
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (per the equality keys).

    Spark-first implementation: tag both sides, UNION, one window sorted by
    (ts, side) per key, and carry the last-seen right payload forward with
    ``last(..., ignorenulls=True)``. ONE shuffle + sort on the key — no
    range-condition join (which Catalyst would execute as a broadcast
    nested-loop or an exploding theta join). At 100 TB this is the only
    shape that scales: cost is that of a window function, not a cross
    product.

    The right payload travels as ONE struct, null exactly on left rows: the
    carried value is the whole matched row atomically (never a mix of
    columns from different right rows), and "no prior right row" is the
    struct being null — distinguishable from a matched right row whose
    payload VALUES are null, which a per-column ``ignorenulls`` carry
    would skip or conflate.
    """
    side_r = 0 if inclusive else 1  # right sorts before equal-ts left iff inclusive
    lcols = left.columns
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    payload_t = right.select(payload_struct.alias("__r")).schema["__r"].dataType
    tagged_r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(side_r).alias("__side"),
        payload_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1 - side_r).alias("__side"),
        F.lit(None).cast(payload_t).alias("__r"),
        *[F.col(c) for c in lcols if c not in on],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *[c for c in lcols if c not in on],
        F.last("__r", ignorenulls=True).over(w).alias("__asof"),
    )
    return (
        carried.where(F.col("__side") == (1 - side_r))
        .where(F.col("__asof").isNotNull())
        .select(
            *on,
            F.col("__ts").alias(left_ts),
            *[c for c in lcols if c not in on and c != left_ts],
            *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in right_payload],
        )
    )


@register(
    "join_asof",
    sql="""
    WITH purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, event_id AS view_event_id
      FROM events WHERE event_type = 'view'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    )
    SELECT p.user_id, p.ts, p.event_id, p.value,
           v.view_event_id AS asof_view_event_id
    FROM purchases p
    ASOF JOIN views v ON p.user_id = v.user_id AND p.ts >= v.vts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior view.
    Implemented as union + one keyed window (no range join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        ev.where(F.col("event_type") == "view")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("view_event_id"))
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["view_event_id"],
    )


@register(
    "pivot_event_counts",
    sql="""
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'view') AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user counts by event type. Explicit pivot
    values keep the plan a single pass (no extra distinct-values job)."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
        .orderBy("user_id")
    )


@register(
    "agg_cube_orders",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders (all 4 grouping combinations in one
    pass — Spark expands to a single Expand + aggregation, not 4 scans)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "rollup_timeseries_1h",
    sql=f"""
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n,
           {sql_exact_sum('value')} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_timeseries_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-series downsampling: 1-hour buckets per
    series key with count/sum/min/max — the continuous-aggregate shape.
    At scale: partial aggregation per scan partition, one shuffle on
    (bucket, key); pairs naturally with a bucket-partitioned sink."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "cdc_scd2_history",
    sql="""
    SELECT user_id, event_id, value,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS TIMESTAMP) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM events
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension view of a change stream: each
    change carries [valid_from, valid_to) via LEAD — the standard CDC →
    history-table transform the reference's upsert mode cannot produce."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
