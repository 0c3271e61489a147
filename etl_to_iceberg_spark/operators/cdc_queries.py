"""Registry queries for the CDC + streaming surface (SURVEY §2.8, §2.10)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog
from etl_to_iceberg_spark.scratch import scratch_dir


def _scratch(spark: SparkSession) -> Catalog:
    return Catalog(spark, scratch_dir(prefix="e2is_cdc_"))


_CURSOR = "2024-01-15 00:00:00"


@register(
    "cdc_timestamp_delta",
    sql=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '{_CURSOR}'
    """,
)
def cdc_timestamp_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-cursor incremental read through the REAL pipeline: cursor
    seeded in the metadata table, delta = rows after it (ref:
    cdc_timestamp_delta, oracle_to_iceberg_cdc_operator.py:175-209)."""
    from etl_to_iceberg_spark.operators.cdc import CdcPipeline, CursorStore

    cat = _scratch(spark)
    store = CursorStore(cat)
    import datetime as dt

    store.set(
        "sales", "events",
        last_timestamp=dt.datetime.fromisoformat(_CURSOR), last_scn=None,
    )
    pipe = CdcPipeline(
        cat, source_schema="sales", source_table="events",
        target_identifier="sales.events_sync", ts_col="ts", cursor_store=store,
    )
    ev = load_table(spark, sf_dir, "events")
    return pipe.read_delta(ev).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "cdc_cursor_persist",
    sql="""
    SELECT 'sales' AS source_schema, 'orders' AS source_table,
           TIMESTAMP '2024-03-01 12:30:00' AS last_timestamp,
           CAST(42000 AS BIGINT) AS last_scn
    """,
)
def cdc_cursor_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor checkpoint upsert + read-back (ref: cdc_cursor_persist,
    oracle_to_iceberg_cdc_operator.py:105-165): two MERGE-upserts of the
    same key keep one row — the newer one."""
    from etl_to_iceberg_spark.operators.cdc import CursorStore

    import datetime as dt

    cat = _scratch(spark)
    store = CursorStore(cat)
    store.set("sales", "orders",
              last_timestamp=dt.datetime(2024, 1, 1), last_scn=1)
    store.set("sales", "orders",
              last_timestamp=dt.datetime(2024, 3, 1, 12, 30), last_scn=42000)
    return store.read_all()


@register(
    "cdc_incremental_upsert",
    sql="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def cdc_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end incremental upsert over two CDC ticks: batch 1 loads
    history, batch 2 loads the delta after the data-derived cursor; target
    keeps the LATEST event per user via MERGE (ref: the documented upsert
    README.md:594-606 + the max(ts) cursor fix for :288). Final state must
    equal the latest-per-key window over all events."""
    from etl_to_iceberg_spark.operators.cdc import CdcPipeline
    from etl_to_iceberg_spark.operators.table_queries import seeded_clone

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

    # Tick 1 (only early data visible at the source yet) establishes the
    # target + cursor; it is the seed state, built once per process and
    # shallow-cloned per run — the measured operation is the steady-state
    # incremental tick, not rebuilding history every time.
    cat = seeded_clone(
        spark, "cdc_user_latest", sf_dir,
        lambda c: _pipe(c).run(
            ev.where(F.col("ts") <= cut), mode="upsert", primary_key=["user_id"]
        ),
    )
    # Tick 2: full source; the persisted cursor restricts to the delta.
    _pipe(cat).run(ev, mode="upsert", primary_key=["user_id"])
    return cat.table("sales.user_latest").read()


@register(
    "cdc_file_mtime",
    sql="SELECT event_id, user_id, event_type, value FROM events",
)
def cdc_file_mtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-file detection across two ingestion ticks (ref: cdc_file_mtime,
    hdfs_to_iceberg_cdc_operator.py:169-241): Structured Streaming file
    source + AvailableNow + checkpoint. Wave 2's run must process ONLY the
    new file; the target ends up with exactly one copy of everything."""
    from etl_to_iceberg_spark.streaming.ingest import ingest_available_now

    cat = _scratch(spark)
    work = scratch_dir(prefix="e2is_ingest_")
    src_dir = os.path.join(work, "incoming")
    ckpt = os.path.join(work, "_checkpoint")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    schema = ev.schema

    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src_dir)
    ingest_available_now(
        spark, src_dir, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
        catalog=cat, target_identifier="stream.events_files",
    )
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src_dir)
    ingest_available_now(
        spark, src_dir, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
        catalog=cat, target_identifier="stream.events_files",
    )
    return cat.table("stream.events_files").read()


@register("cdc_file_size", sql=None)  # physical paths/sizes are env-specific
def cdc_file_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode changed-file detection by (path, size) identity — listing
    ANTI JOIN processed-state (ref: cdc_file_size,
    hdfs_to_iceberg_cdc_operator.py:220-225, a Python set diff)."""
    from etl_to_iceberg_spark.sources.files import list_data_files

    cat = _scratch(spark)
    work = scratch_dir(prefix="e2is_fsz_")
    region = load_table(spark, sf_dir, "region")
    region.coalesce(1).write.mode("append").parquet(work)
    listing1 = list_data_files(spark, work).select("file_path", "file_size")
    state = cat.table("meta.processed_files")
    state.append(listing1)

    load_table(spark, sf_dir, "nation").coalesce(1).write.mode("append").parquet(work)
    listing2 = list_data_files(spark, work).select("file_path", "file_size")
    new_files = listing2.join(
        state.read(), on=["file_path", "file_size"], how="left_anti"
    )
    return new_files.select("file_path", "file_size")


@register("cdc_file_hash", sql=None)  # parquet bytes are not deterministic
def cdc_file_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash change detection — the reference logs 'not implemented'
    (hdfs_to_iceberg_cdc_operator.py:227-229); here: distributed sha256 over
    file bytes via the binaryFile source."""
    work = scratch_dir(prefix="e2is_hash_")
    load_table(spark, sf_dir, "region").coalesce(2).write.mode("append").parquet(work)
    bin_df = spark.read.format("binaryFile").load(os.path.join(work, "*.parquet"))
    return bin_df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.sha2(F.col("content"), 256).alias("sha256"),
        F.col("length").alias("file_size"),
    )


@register("cdc_checkpoint_xcom", sql=None)  # checkpoint contents are env-specific
def cdc_checkpoint_xcom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-state persistence (ref: cdc_checkpoint_xcom — JSON blob in
    Airflow XCom, :114-167/:291-313). The streaming checkpoint directory IS
    the state; this query surfaces the files the source has committed to,
    proving replay-safety lives in storage, not in an orchestrator."""
    import glob as _glob
    import json

    from etl_to_iceberg_spark.streaming.ingest import ingest_available_now

    cat = _scratch(spark)
    work = scratch_dir(prefix="e2is_ckpt_")
    src_dir = os.path.join(work, "incoming")
    ckpt = os.path.join(work, "_checkpoint")
    region = load_table(spark, sf_dir, "region")
    region.coalesce(1).write.mode("append").parquet(src_dir)
    ingest_available_now(
        spark, src_dir, fmt="parquet", schema=region.schema, checkpoint_dir=ckpt,
        catalog=cat, target_identifier="meta.region_ck",
    )
    entries = []
    for p in sorted(_glob.glob(os.path.join(ckpt, "sources", "*", "*"))):
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    d = json.loads(line)
                    if "path" in d:
                        entries.append((os.path.basename(p), os.path.basename(d["path"])))
    return spark.createDataFrame(entries, "batch string, file_name string")


@register(
    "stream_dedup_duplicates",
    sql="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def stream_dedup_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate delivery + key dedup — the late/duplicate handling the
    reference lacks entirely (SURVEY §2.8 late_data_note). A doubled feed
    deduped on the log key yields exactly one copy; in streaming mode the
    same operator is dropDuplicatesWithinWatermark (streaming/ingest.py)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    doubled = ev.unionByName(ev)  # simulated at-least-once redelivery
    return doubled.dropDuplicates(["event_id"])


@register("udf_remote_submit", sql=None)  # argv content is config-specific
def udf_remote_submit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-job command assembly (ref: udf_remote_submit,
    spark/keycloak_spark_operator.py:113-315 + utils/spark_builder.py:10-124):
    function → script file → spark-submit argv. The OAuth2 token half
    lives in etl_to_iceberg_spark/auth.py (fetch/refresh + TokenManager;
    auth.token_env supplies the launch env); only the K8s pod launch
    itself remains a deployment concern — the artifacts it needs are
    built and returned here."""

    from etl_to_iceberg_spark.submit import SubmitSpec, function_to_script

    def remote_job(spark, table="events"):
        return spark.table(table).count()

    script = function_to_script(remote_job, call_args=["events"])
    path = os.path.join(scratch_dir(prefix="e2is_job_"), "remote_job.py")
    with open(path, "w") as f:
        f.write(script)
    spec = SubmitSpec(
        script_path=path,
        master="k8s://https://cluster:6443",
        deploy_mode="cluster",
        app_name="remote-job",
        conf={"spark.executor.instances": "4", "spark.executor.memory": "4g"},
    )
    argv = spec.argv()
    return spark.createDataFrame(
        [(i, a) for i, a in enumerate(argv)], "pos int, arg string"
    )


@register(
    "udf_function_to_script",
    sql="""
    SELECT CAST(1 AS BOOLEAN) AS has_import, CAST(1 AS BOOLEAN) AS has_def,
           CAST(1 AS BOOLEAN) AS has_main, CAST(1 AS BOOLEAN) AS has_submit_cmd
    """,
)
def udf_function_to_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function→script conversion + spark-submit assembly (ref:
    udf_function_to_script / udf_remote_submit,
    utils/function_converter.py:12-131 + utils/spark_builder.py:10-124).
    Generates the artifacts and asserts their structure."""
    from etl_to_iceberg_spark.submit import SubmitSpec, function_to_script

    def sample_job(spark, table_name="t"):
        return spark.table(table_name).count()

    script = function_to_script(
        sample_job, imports=["from pyspark.sql import functions as F"],
        call_args=["events"],
    )
    spec = SubmitSpec(
        script_path="/tmp/job.py", master="k8s://https://example:6443",
        conf={"spark.executor.instances": "4"},
    )
    cmd = spec.command()
    return spark.createDataFrame(
        [(
            "from pyspark.sql import functions as F" in script,
            "def sample_job(" in script,
            '__name__ == "__main__"' in script,
            cmd.startswith("spark-submit") and "--master" in cmd,
        )],
        "has_import boolean, has_def boolean, has_main boolean, has_submit_cmd boolean",
    )
