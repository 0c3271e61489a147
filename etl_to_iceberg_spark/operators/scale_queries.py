"""Registry queries for the scale patterns (skew, bucketing, streaming
windows, sessionization)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.functions import sql_exact_sum
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog
from etl_to_iceberg_spark.scratch import scratch_dir
from etl_to_iceberg_spark.streaming.ingest import await_drain


@register(
    "agg_salted_skew",
    sql=f"""
    SELECT event_type,
           {sql_exact_sum('value')} AS total,
           COUNT(*) AS cnt
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant two-phase aggregation: 5 hot event_type keys would
    pin 5 reducers; salting spreads each key over 16, then merges partials.
    Identical result to a plain GROUP BY (the oracle proves it)."""
    from etl_to_iceberg_spark.operators.scale import salted_sum_count

    ev = load_table(spark, sf_dir, "events")
    return salted_sum_count(ev, ["event_type"], sum_col="value").orderBy("event_type")


@register(
    "join_bucketed_colocated",
    sql=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {sql_exact_sum('l.l_extendedprice')} AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via same-key bucketing: both tables are
    written bucketed on orderkey, so the join reads co-located buckets with
    NO exchange (tests/test_plans.py asserts it). At 100 TB this converts
    every recurring join's shuffle into a one-time write-side cost."""
    from etl_to_iceberg_spark.operators.scale import bucketed_join, write_bucketed
    from etl_to_iceberg_spark.functions import exact_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "e2is_li_bkt", bucket_col="l_orderkey", num_buckets=8)
    write_bucketed(orders, "e2is_ord_bkt", bucket_col="o_orderkey", num_buckets=8)
    joined = bucketed_join(
        spark, "e2is_li_bkt", "e2is_ord_bkt",
        on=[F.col("l_orderkey") == F.col("o_orderkey")],
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "sessionize_events",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(ts AS TIMESTAMP) >
                          CAST(lag(ts) OVER w AS TIMESTAMP) + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gaps) as pure window functions —
    the batch form of the stateful streaming operator."""
    from etl_to_iceberg_spark.streaming.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap="30 minutes")


@register(
    "stream_windowed_agg",
    sql="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS window_start,
           event_type,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts with watermark, drained via
    AvailableNow across TWO ingestion waves; per-batch window updates are
    MERGEd by (window_start, key), so the final managed table equals the
    batch GROUP BY — late updates to a window overwrite, not duplicate."""
    from etl_to_iceberg_spark.streaming.windows import stream_windowed_counts

    cat = Catalog(spark, scratch_dir(prefix="e2is_swin_"))
    work = scratch_dir(prefix="e2is_swin_src_")
    src = os.path.join(work, "incoming")
    ckpt = os.path.join(work, "ckpt")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    # Waves split by TIME (streams advance in event time): wave 2 arrives
    # after wave 1's watermark but carries later timestamps, so nothing is
    # dropped as late — splitting by a non-time attribute here would
    # (correctly!) get wave 2 discarded by the watermark.
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def drain() -> None:
        stream_windowed_counts(
            spark, src,
            schema=ev.schema, ts_col="ts", group_col="event_type",
            window_duration="1 day", watermark="1 hour",
            checkpoint_dir=ckpt, catalog=cat,
            target_identifier="stream.daily_counts",
        )

    ev.where(F.col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    drain()
    ev.where(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    drain()
    return cat.table("stream.daily_counts").read()


@register(
    "stream_sessionize_stateful",
    # Value-checked since r11 (VERDICT r9 #6): EMISSION TIMING is
    # batch-dependent, but the FINAL MERGEd table after a full drain is
    # not — every closed session's row was overwritten to its terminal
    # shape and the one still-open session per user carries
    # closed=false. That endpoint is exactly batch gaps-and-islands
    # (the sessionize_events oracle) plus a last-session flag, so the
    # oracle is pure SQL over events — no sidecar needed. The query
    # feeds the drain ONE coalesced file, so the AvailableNow run is a
    # single deterministic micro-batch at every checked SF.
    sql="""
    WITH ev AS (
      SELECT user_id, ts, event_id FROM events WHERE user_id < 5
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(ts AS TIMESTAMP) >
                          CAST(lag(ts) OVER w AS TIMESTAMP) + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    ),
    sess AS (
      SELECT user_id, session_id,
             CAST(MIN(ts) AS TIMESTAMP) AS session_start,
             CAST(MAX(ts) AS TIMESTAMP) AS session_end,
             COUNT(*) AS n_events
      FROM numbered
      GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, session_end, n_events,
           session_id < MAX(session_id) OVER (PARTITION BY user_id) AS closed
    FROM sess
    """,
)
def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    session state, emissions MERGEd into a managed sessions table keyed by
    (user_id, session_start) — the deployment sink (r7; the driver-list
    drain remains for tests). The final table is value-checked against
    batch gaps-and-islands SQL (see the oracle comment above): in-stream
    emission timing varies by batching, the drained endpoint does not."""
    from etl_to_iceberg_spark.streaming.windows import sessionize_stateful_to_table
    from etl_to_iceberg_spark.tables import Catalog

    work = scratch_dir(prefix="e2is_sess_")
    src = os.path.join(work, "incoming")
    ckpt = os.path.join(work, "ckpt")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .where(F.col("user_id") < 5)
    )
    ev.coalesce(1).write.mode("append").parquet(src)
    cat = Catalog(spark, os.path.join(work, "wh"))
    sessionize_stateful_to_table(
        spark, src, schema=ev.schema, checkpoint_dir=ckpt,
        catalog=cat, target_identifier="stream.sessions", gap="30 minutes",
    )
    return cat.table("stream.sessions").read()


@register(
    "stream_static_join",
    sql="""
    WITH dim(event_type, category) AS (
      VALUES ('click', 'engagement'), ('view', 'engagement'),
             ('purchase', 'conversion'), ('signup', 'conversion'),
             ('error', 'ops')
    )
    SELECT category, COUNT(*) AS cnt
    FROM events JOIN dim USING (event_type)
    GROUP BY category
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: a streaming file source joined to a
    broadcast dimension, aggregated in update mode, MERGEd per batch into
    a managed table. Drained twice (two arrival waves) — the state store
    carries running totals across AvailableNow runs, so the final table
    equals the batch join+GROUP BY (the oracle). The static side is
    re-read per micro-batch, which is how dimension refresh works in a
    long-running stream."""
    cat = Catalog(spark, scratch_dir(prefix="e2is_ssj_"))
    work = scratch_dir(prefix="e2is_ssj_src_")
    src = os.path.join(work, "incoming")
    ckpt = os.path.join(work, "ckpt")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    dim = spark.createDataFrame(
        [
            ("click", "engagement"), ("view", "engagement"),
            ("purchase", "conversion"), ("signup", "conversion"),
            ("error", "ops"),
        ],
        "event_type string, category string",
    )

    def drain() -> None:
        stream = (
            spark.readStream.schema(ev.schema).parquet(src)
            .join(F.broadcast(dim), "event_type")
        )
        agg = stream.groupBy("category").agg(F.count(F.lit(1)).alias("cnt"))

        def upsert(batch_df: DataFrame, batch_id: int) -> None:
            cat.table("stream.category_counts").merge(batch_df, keys=["category"])

        q = (
            agg.writeStream.foreachBatch(upsert)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_drain(q, 300, label="stream_static_join")

    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    ev.where(F.col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    drain()
    ev.where(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    drain()
    return cat.table("stream.category_counts").read()


@register(
    "join_salted_skew",
    sql=f"""
    WITH totals AS (
      SELECT user_id, {sql_exact_sum('value')} AS user_total
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, t.user_total
    FROM events e JOIN totals t USING (user_id)
    WHERE e.event_type = 'purchase'
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: big side salted, small side replicated across the
    salt domain, joined on (key, salt) — a hot key spreads over N reducers.
    The oracle proves the result equals the plain join."""
    from etl_to_iceberg_spark.functions import exact_sum
    from etl_to_iceberg_spark.operators.scale import salted_join

    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(exact_sum("value").alias("user_total"))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id"
    )
    return salted_join(purchases, totals, on="user_id").select(
        "event_id", "user_id", "user_total"
    )


@register(
    "stream_sliding_window",
    sql="""
    SELECT ws AS window_start, event_type, COUNT(*) AS cnt
    FROM events,
         UNNEST([date_trunc('day', CAST(ts AS TIMESTAMP)),
                 date_trunc('day', CAST(ts AS TIMESTAMP)) - INTERVAL 1 DAY])
             AS t(ws)
    GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (2-day windows sliding by 1 day): every
    event contributes to window_size/slide windows. `F.window` is the SAME
    operator in batch and streaming — this batch form is the oracle for
    the streaming variant (add withWatermark + writeStream and the plan is
    unchanged). Spark expands each row to its windows before the hash agg,
    mirroring the UNNEST in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 days", "1 day").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt"
        )
    )
