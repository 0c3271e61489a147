"""Statistical & time-series operators, tranche 4: mergeable HLL
rollups, z-score anomaly detection, gap-filled time series, cohort
journey transitions, data-quality profiling, drift (PSI), and native
session windows.

The through-line is the 100 TB statistics posture: mergeable sketches
instead of rescans (HLL per day, unioned per range), exact decimal
moments so both engines agree bit-for-bit, fixed bucket boundaries so
reports don't depend on the distribution they measure, and built-in
JVM aggregates (``session_window``) over hand-rolled state wherever
the built-in expresses the semantics.

Registered last (after ``ingest_formats``) — tail of the driver-check
rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table


@register("agg_hll_rollup_merge", sql=None)  # sketch estimate — rows-only;
# tests/test_analytics.py asserts <5% error vs the exact distinct count
def agg_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup: per-(day, event_type) user sketches — the
    shape that persists into a rollup table once per day — then
    ``hll_union_agg`` merges each type's daily sketches into a range-wide
    distinct-user estimate. Re-aggregating a month costs |days|×|types|
    sketch merges (bytes each), never a rescan of the raw 100 TB.

    Scale shape: first agg shuffles (day, type, partial sketch) — partial
    sketches combine map-side; second agg shuffles |days| rows per type."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_users"),
            F.count(F.lit(1)).alias("days_merged"),
        )
    )


@register(
    "events_anomaly_zscore",
    sql="""
    WITH stats AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                 / COUNT(value) AS mu,
             sqrt(CAST(SUM(CAST(value AS DECIMAL(30,10))
                           * CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                      / COUNT(value)
                  - pow(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                            / COUNT(value), 2)) AS sigma
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sigma > 0 AND abs((e.value - s.mu) / s.sigma) > 3
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outliers per event_type (|z| > 3) — the basic
    metric-anomaly sweep.

    Determinism: mean and variance derive from DECIMAL sums (exact,
    order-independent), so both engines compute identical doubles; the
    z-score is rounded to 4dp on both sides. Scale shape: the stats agg
    collapses to |event_type| rows and re-enters as a broadcast join —
    the events scan never shuffles."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(30,10)")
    stats = ev.groupBy("event_type").agg(
        (F.sum(dec).cast("double") / F.count("value")).alias("mu"),
        F.sqrt(
            F.sum(dec * dec).cast("double") / F.count("value")
            - F.pow(F.sum(dec).cast("double") / F.count("value"), F.lit(2))
        ).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where((F.col("sigma") > 0) & (F.abs(z) > 3))
        .select("event_id", "event_type", F.round(z, 4).alias("zscore"))
    )


@register(
    "timeseries_gapfill",
    sql="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             COUNT(*) AS cnt,
             round(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                   / COUNT(value), 6) AS avg_value
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds
    )
    SELECT g.event_type,
           strftime(g.h, '%Y-%m-%d %H:00') AS hour,
           coalesce(hourly.cnt, 0) AS cnt,
           round(last_value(hourly.avg_value IGNORE NULLS)
                 OVER (PARTITION BY g.event_type ORDER BY g.h
                       ROWS UNBOUNDED PRECEDING), 6) AS avg_value_ffill
    FROM grid g LEFT JOIN hourly USING (event_type, h)
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup with gap-filling and forward-fill: the dense grid a
    dashboard or model-feature pipeline needs — missing hours appear with
    cnt=0 and carry the last observed hourly average forward.

    Scale shape: the grid explodes from |event_type| (min, max) bound
    rows — metadata-sized however large the raw table is; the fill join
    is per-(type, hour) against the already-aggregated rollup, and the
    forward-fill window partitions by type ordered by hour (bounded by
    the calendar, not the data volume)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(30,10)")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(dec).cast("double") / F.count("value"), 6).alias("avg_value"),
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.round(
                F.last("avg_value", ignorenulls=True).over(w), 6
            ).alias("avg_value_ffill"),
        )
    )


@register(
    "events_transition_matrix",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov matrix behind
    journey analysis): LAG over each user's time-ordered stream, then a
    global pair count.

    Scale shape: one shuffle on user_id for the LAG window (per-user
    sequences are session-sized), then a pair-count agg whose map-side
    partial collapses to |types|² rows per partition — the second
    exchange is matrix-sized, not event-sized. Tie-break (ts, event_id)
    makes the sequence — and so the counts — deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("transitions"))
    )


_DQ_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderpriority", False),
]


@register(
    "data_quality_report",
    sql="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           {f'CAST(MIN({c}) AS DOUBLE)' if num else 'CAST(NULL AS DOUBLE)'} AS min_d,
           {f'CAST(MAX({c}) AS DOUBLE)' if num else 'CAST(NULL AS DOUBLE)'} AS max_d
    FROM orders
    """
        for c, num in _DQ_COLS
    ),
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile validation report (the Deequ/expectations stage a
    training pipeline runs before trusting an ingest): null counts,
    exact distinct cardinalities, numeric min/max — per column, in ONE
    scan.

    Scale shape: all metrics compute in a single pass; Spark plans the
    multiple DISTINCT aggregates via one Expand (rows × |distinct cols|)
    feeding a two-phase agg — no per-column rescans. At 100 TB swap the
    exact distincts for approx_count_distinct (same call shape) when ±2%
    suffices."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, num in _DQ_COLS:
        aggs += [
            F.count(c).alias(f"__cnt_{c}"),
            F.count_distinct(c).alias(f"__nd_{c}"),
        ]
        if num:
            aggs += [
                F.min(c).cast("double").alias(f"__min_{c}"),
                F.max(c).cast("double").alias(f"__max_{c}"),
            ]
    wide = orders.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            (F.col(f"__min_{c}") if num else F.lit(None).cast("double")).alias("min_d"),
            (F.col(f"__max_{c}") if num else F.lit(None).cast("double")).alias("max_d"),
        )
        for c, num in _DQ_COLS
    ]
    return wide.select(F.explode(F.array(*rows)).alias("m")).select("m.*")


@register(
    "corpus_drift_psi",
    sql="""
    WITH bucketed AS (
      SELECT CASE WHEN source = 'src0' THEN 'a' ELSE 'b' END AS grp,
             least(n_chars // 50, 9) AS bucket
      FROM documents
    ),
    counts AS (
      SELECT bucket,
             COUNT(*) FILTER (grp = 'a') AS na,
             COUNT(*) FILTER (grp = 'b') AS nb
      FROM bucketed GROUP BY bucket
    ),
    tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM counts)
    SELECT bucket,
           round((na / ta - nb / tb)
                 * ln(greatest(na / ta, 1e-9) / greatest(nb / tb, 1e-9)),
                 6) AS psi_term
    FROM counts, tot
    """,
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two corpus slices (population stability
    index over fixed doc-length buckets) — the check a pipeline runs
    when a new crawl arrives: per-bucket PSI terms; Σ terms > 0.2 means
    the length distribution shifted materially.

    Determinism: FIXED bucket boundaries (50-char steps, capped) — a
    percentile-based bucketing would make the report depend on the very
    distribution it measures. Scale shape: one scan → 10-bucket agg; the
    totals re-enter as a 1-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    bucketed = docs.select(
        F.when(F.col("source") == "src0", F.lit("a")).otherwise(F.lit("b")).alias("grp"),
        F.least(F.floor(F.col("n_chars") / 50), F.lit(9)).alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.count(F.when(F.col("grp") == "a", 1)).alias("na"),
        F.count(F.when(F.col("grp") == "b", 1)).alias("nb"),
    )
    tot = counts.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    pa = F.col("na") / F.col("ta")
    pb = F.col("nb") / F.col("tb")
    term = (pa - pb) * F.log(
        F.greatest(pa, F.lit(1e-9)) / F.greatest(pb, F.lit(1e-9))
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket", F.round(term, 6).alias("psi_term")
    )


@register(
    "sessionize_native_window",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM islands
    GROUP BY user_id, sid
    """,
)
def sessionize_native_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` aggregate —
    the built-in JVM operator this engine prefers over hand-rolled state
    (`sessionize_events` shows the gaps-and-islands rewrite; the custom
    `applyInPandasWithState` path exists for semantics the built-in
    can't express). Same call works under ``readStream`` with a
    watermark, where the state store merges windows incrementally.

    Semantics matched in the oracle: an event at exactly gap distance
    starts a NEW session (session end = last event + gap, exclusive);
    ALL events sessionize (a NULL value still extends the session — SUM
    skips it in both engines, matching the oracle's unfiltered CTE).
    Scale shape: one shuffle on the grouping key; per-key sessions merge
    inside the aggregate, no per-user sort window needed."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
