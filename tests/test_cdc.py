"""CDC pipeline + streaming ingest tests."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from etl_to_iceberg_spark.operators.cdc import CdcPipeline, CursorStore
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def test_cursor_store_upsert(cat):
    store = CursorStore(cat)
    assert store.get("s", "t") is None
    store.set("s", "t", last_timestamp=dt.datetime(2024, 1, 1), last_scn=10)
    store.set("s", "t", last_timestamp=dt.datetime(2024, 2, 1), last_scn=20)
    store.set("s", "other", last_scn=1)
    cur = store.get("s", "t")
    assert cur["last_scn"] == 20
    assert cur["last_timestamp"] == dt.datetime(2024, 2, 1)
    assert store.read_all().count() == 2


def test_pipeline_append_two_ticks_no_duplicates(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    pipe = CdcPipeline(
        cat, source_schema="s", source_table="events",
        target_identifier="s.ev_log", ts_col="ts",
    )
    cut = F.lit("2024-01-15").cast("timestamp")
    r1 = pipe.run(ev.where(F.col("ts") <= cut))
    r2 = pipe.run(ev)  # cursor excludes tick-1 rows
    assert r1.rows + r2.rows == ev.count()
    assert cat.table("s.ev_log").read().count() == ev.count()
    # cursor is data-derived max(ts), not wall clock
    cur = CursorStore(cat).get("s", "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    assert cur["last_timestamp"] == max_ts


def test_pipeline_dual_cursor_same_second_commit_not_lost(cat, spark, sf_dir):
    """With BOTH cursors configured, the version (SCN) cursor is the
    authoritative delta predicate. A row whose version advanced but whose
    timestamp EQUALS the persisted ts cursor (same-second commit / writer
    clock skew) must still be ingested — ANDing the two predicates would
    exclude it from every future tick (regression: read_delta used AND)."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    tick1 = spark.createDataFrame(
        [(1, 100, t0, "a"), (2, 101, t0, "b")],
        "user_id long, scn long, ts timestamp, payload string",
    )
    pipe = CdcPipeline(
        cat, source_schema="s", source_table="skew",
        target_identifier="s.skew_log", ts_col="ts", version_col="scn",
    )
    r1 = pipe.run(tick1)
    assert r1.rows == 2
    # same-second commit: scn advances, ts does not move past the cursor
    tick2 = tick1.unionByName(spark.createDataFrame(
        [(3, 102, t0, "c")],
        "user_id long, scn long, ts timestamp, payload string",
    ))
    r2 = pipe.run(tick2)
    assert r2.rows == 1  # the scn=102 row — not silently dropped
    assert cat.table("s.skew_log").read().count() == 3


def test_pipeline_empty_delta_short_circuits(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    pipe = CdcPipeline(
        cat, source_schema="s", source_table="ev2",
        target_identifier="s.ev2_log", ts_col="ts",
    )
    pipe.run(ev)
    versions_before = cat.table("s.ev2_log").current_version()
    r = pipe.run(ev)  # nothing new
    assert r.rows == 0
    assert cat.table("s.ev2_log").current_version() == versions_before


def test_pipeline_upsert_latest_state(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    pipe = CdcPipeline(
        cat, source_schema="s", source_table="ev3",
        target_identifier="s.user_state", ts_col="ts", version_col="event_id",
    )
    pipe.run(ev, mode="upsert", primary_key=["user_id"])
    target = cat.table("s.user_state").read()
    assert target.count() == ev.select("user_id").distinct().count()
    # target row for each user == their max-ts event
    expected = (
        ev.groupBy("user_id").agg(F.max("ts").alias("ts")).count()
    )
    assert target.count() == expected


def test_streaming_ingest_processes_only_new_files(cat, spark, sf_dir, tmp_path):
    from etl_to_iceberg_spark.streaming.ingest import ingest_available_now

    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    region = load_table(spark, sf_dir, "region")

    region.limit(2).coalesce(1).write.mode("append").parquet(src)
    ingest_available_now(
        spark, src, fmt="parquet", schema=region.schema, checkpoint_dir=ckpt,
        catalog=cat, target_identifier="s.region_stream",
    )
    t = cat.table("s.region_stream")
    assert t.read().count() == 2

    region.coalesce(1).write.mode("append").parquet(src)
    ingest_available_now(
        spark, src, fmt="parquet", schema=region.schema, checkpoint_dir=ckpt,
        catalog=cat, target_identifier="s.region_stream",
    )
    # 2 from wave 1 + full table from wave 2 — wave-1 file NOT reprocessed
    assert t.read().count() == 2 + region.count()


def test_streaming_upsert_idempotent_replay(cat, spark, sf_dir, tmp_path):
    from etl_to_iceberg_spark.streaming.ingest import ingest_available_now

    src = str(tmp_path / "in2")
    region = load_table(spark, sf_dir, "region")
    region.coalesce(1).write.mode("append").parquet(src)

    # Two runs with SEPARATE checkpoints => the same files delivered twice
    # (simulated replay); MERGE keeps the table exactly-once.
    for ck in ("ck_a", "ck_b"):
        ingest_available_now(
            spark, src, fmt="parquet", schema=region.schema,
            checkpoint_dir=str(tmp_path / ck),
            catalog=cat, target_identifier="s.region_ups",
            mode="upsert", primary_key=["r_regionkey"],
        )
    assert cat.table("s.region_ups").read().count() == region.count()


def test_function_to_script_and_submit():
    from etl_to_iceberg_spark.submit import SubmitSpec, function_to_script

    def my_job(spark, n=3):
        return spark.range(n).count()

    script = function_to_script(my_job, imports=["import math"], call_args=[5])
    assert "def my_job(" in script
    assert "import math" in script
    assert "my_job(spark, 5)" in script
    assert 'if __name__ == "__main__":' in script
    compile(script, "<generated>", "exec")  # must be valid python

    spec = SubmitSpec(
        script_path="/tmp/j.py", master="yarn", deploy_mode="cluster",
        conf={"spark.executor.memory": "4g"}, packages=["org.example:x:1.0"],
    )
    argv = spec.argv()
    assert argv[0] == "spark-submit" and argv[-1] == "/tmp/j.py"
    assert "--conf" in argv and "spark.executor.memory=4g" in argv


def test_incremental_upsert_tick2_reads_delta_through_clone(spark, sf_dir):
    """The seeded-clone harness must hand tick 2 the tick-1 cursor
    (ADVICE r4: the cursor store now rides shallow_clone), so the
    steady-state tick MERGEs the delta, not the full source."""
    from etl_to_iceberg_spark.operators.cdc import CdcPipeline
    from etl_to_iceberg_spark.operators.table_queries import seeded_clone
    from etl_to_iceberg_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def _pipe(c):
        return CdcPipeline(
            c, source_schema="sales", source_table="events",
            target_identifier="sales.user_latest",
            ts_col="ts", version_col="event_id",
        )

    cat = seeded_clone(
        spark, "test_cdc_tick2_delta", sf_dir,
        lambda c: _pipe(c).run(
            ev.where(F.col("ts") <= cut), mode="upsert", primary_key=["user_id"]
        ),
    )
    early = ev.where(F.col("ts") <= cut).count()
    total = ev.count()
    assert 0 < early < total
    res = _pipe(cat).run(ev, mode="upsert", primary_key=["user_id"])
    assert res.rows == total - early  # the delta, not the full source


def test_streaming_ingest_watermark_dedup_drops_redelivered_rows(
    spark, sf_dir, tmp_path
):
    """The watermark + dedup-keys branch of ingest_available_now: an
    at-least-once feed that redelivers the same event rows (same key,
    within the watermark) must land exactly one copy per key."""
    import os

    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.streaming.ingest import ingest_available_now
    from etl_to_iceberg_spark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "_ckpt")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "value")
        .limit(500)
    )
    # the same rows delivered twice (two files), one drain
    ev.coalesce(1).write.mode("append").parquet(src_dir)
    ev.coalesce(1).write.mode("append").parquet(src_dir)

    ingest_available_now(
        spark, src_dir, fmt="parquet", schema=ev.schema, checkpoint_dir=ckpt,
        catalog=cat, target_identifier="stream.events_wm",
        watermark=("ts", "10 minutes"), dedup_keys=["event_id"],
    )
    got = cat.table("stream.events_wm").read()
    assert got.count() == 500
    assert got.select("event_id").distinct().count() == 500
