"""Scheduler-adapter tests: the reference's operator API surface
(transfer / CDC / compaction / aging / snapshot) driven end-to-end against
the managed-table layer, Airflow-free."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from etl_to_iceberg_spark.adapter import (
    TableAgingOperator,
    TableCdcTransferOperator,
    TableCompactionOperator,
    TableSnapshotOperator,
    TableTransferOperator,
)
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog


@pytest.fixture()
def warehouse():
    return tempfile.mkdtemp(prefix="e2is_adapter_wh_")


def test_transfer_operator_auto_create_then_append(spark, sf_dir, warehouse):
    src = lambda s: load_table(s, sf_dir, "region")  # noqa: E731
    op = TableTransferOperator(
        spark=spark, warehouse=warehouse, source=src,
        namespace="geo", table="region", mode="append",
    )
    first = op.execute()
    assert first["version"] == 1  # auto-created on first batch
    second = op.execute()
    assert second["version"] == 2
    table = Catalog(spark, warehouse).table("geo.region")
    assert table.read().count() == 2 * load_table(spark, sf_dir, "region").count()


def test_transfer_operator_projection_filter_and_merge(spark, sf_dir, warehouse):
    nation = load_table(spark, sf_dir, "nation")
    TableTransferOperator(
        spark=spark, warehouse=warehouse,
        source=nation, namespace="geo", table="nation",
        columns=["n_nationkey", "n_name"], where_clause="n_nationkey < 10",
        mode="append",
    ).execute()
    # merge an updated slice keyed on n_nationkey
    updated = nation.select("n_nationkey", "n_name").where(
        "n_nationkey >= 5 AND n_nationkey < 15"
    ).withColumn("n_name", F.concat(F.col("n_name"), F.lit("_v2")))
    out = TableTransferOperator(
        spark=spark, warehouse=warehouse, source=updated,
        namespace="geo", table="nation", mode="merge",
        primary_key=["n_nationkey"],
    ).execute()
    got = Catalog(spark, warehouse).table("geo.nation").read()
    assert out["version"] == 2
    assert got.count() == 15  # 0..14
    assert got.where("n_name LIKE '%_v2'").count() == 10  # 5..14 updated/added


def test_transfer_operator_arg_validation(spark, warehouse):
    with pytest.raises(ValueError, match="merge.*primary_key|primary_key"):
        TableTransferOperator(
            spark=spark, warehouse=warehouse, source=None,
            table="t", mode="merge",
        )
    with pytest.raises(ValueError, match="append|overwrite|merge"):
        TableTransferOperator(
            spark=spark, warehouse=warehouse, source=None,
            table="t", mode="replace",
        )


def test_cdc_operator_two_ticks_upsert(spark, sf_dir, warehouse):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    cut = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)").alias("c")).collect()[0]["c"]

    tick1 = ev.where(F.unix_micros("ts") <= cut)
    tick2 = ev  # includes old rows; the cursor must exclude them

    def run(batch):
        return TableCdcTransferOperator(
            spark=spark, warehouse=warehouse, source=batch,
            source_schema="app", source_table="events",
            namespace="lake", table="events",
            cdc_method="timestamp", timestamp_column="ts",
            mode="upsert", primary_key=["event_id"],
        ).execute()

    r1 = run(tick1)
    assert r1["rows"] == tick1.count()
    r2 = run(tick2)
    # second tick only ingests rows strictly after the derived cursor
    assert 0 < r2["rows"] < ev.count()
    got = Catalog(spark, warehouse).table("lake.events").read()
    assert got.count() == ev.count()


def test_maintenance_operators_roundtrip(spark, sf_dir, warehouse):
    region = load_table(spark, sf_dir, "region")
    op = TableTransferOperator(
        spark=spark, warehouse=warehouse, source=region,
        namespace="geo", table="region", mode="append",
    )
    for _ in range(3):  # 3 commits -> 3 snapshots, small files
        op.execute()

    compacted = TableCompactionOperator(
        spark=spark, warehouse=warehouse, namespace="geo", table="region",
        target_file_size_mb=512,
    ).execute()
    assert compacted["summary"]["files_after"] <= compacted["summary"]["files_before"]

    snaps = TableSnapshotOperator(
        spark=spark, warehouse=warehouse, namespace="geo", table="region",
        action="list",
    ).execute()
    assert len(snaps) >= 4  # 3 appends + compaction replace

    # plant a crashed-writer orphan so the sweep has something to find
    import os as _os

    table_loc = Catalog(spark, warehouse).table("geo.region").location
    region.limit(1).coalesce(1).write.parquet(_os.path.join(table_loc, "data", "v999"))
    aged = TableAgingOperator(
        spark=spark, warehouse=warehouse, namespace="geo", table="region",
        retain_last=1, older_than_ms=0, remove_orphans=True,
    ).execute()
    assert aged["expired"]
    assert aged["orphans_removed"] == 1

    # rollback to the compacted version still works after aging kept it
    table = Catalog(spark, warehouse).table("geo.region")
    assert table.read().count() == 3 * region.count()


def _render_templates(op, context):
    """Airflow's render step, minimally: render each template_fields
    attribute through Jinja with the task context and set it back on the
    instance before execute() (what BaseOperator.render_templates does;
    airflow is absent in the sandbox)."""
    import jinja2

    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    for f in op.template_fields:
        v = getattr(op, f)
        if isinstance(v, str):
            setattr(op, f, env.from_string(v).render(**context))


def test_template_fields_render_into_execute(spark, sf_dir, warehouse):
    """{{ ds_nodash }} in table/where_clause reaches execute() rendered —
    the reference's documented DAG usage (oracle_to_iceberg README:
    iceberg_table='employees_{{ ds_nodash }}')."""
    region = load_table(spark, sf_dir, "region")
    op = TableTransferOperator(
        spark=spark, warehouse=warehouse, source=region,
        namespace="geo", table="region_{{ ds_nodash }}",
        where_clause="r_regionkey < {{ params.max_key }}",
        mode="append",
    )
    assert "table" in op.template_fields and "where_clause" in op.template_fields
    _render_templates(op, {"ds_nodash": "20260814", "params": {"max_key": 3}})
    out = op.execute({})
    assert out["table"] == "geo.region_20260814"
    got = Catalog(spark, warehouse).table("geo.region_20260814").read()
    assert got.count() == region.where("r_regionkey < 3").count()


def test_template_fields_maintenance_ops_render(spark, sf_dir, warehouse):
    """The maintenance operators build their identifier at execute time,
    so a templated table name takes effect after rendering; templated
    numeric knobs (Jinja renders strings) are coerced."""
    region = load_table(spark, sf_dir, "region")
    for _ in range(2):
        TableTransferOperator(
            spark=spark, warehouse=warehouse, source=region,
            namespace="geo", table="region_20260814", mode="append",
        ).execute()

    comp = TableCompactionOperator(
        spark=spark, warehouse=warehouse,
        namespace="geo", table="region_{{ ds_nodash }}",
    )
    _render_templates(comp, {"ds_nodash": "20260814"})
    assert comp.execute({})["table"] == "geo.region_20260814"

    snap_op = TableSnapshotOperator(
        spark=spark, warehouse=warehouse,
        namespace="geo", table="region_{{ ds_nodash }}",
        action="{{ params.action }}",
    )
    _render_templates(snap_op, {"ds_nodash": "20260814", "params": {"action": "list"}})
    assert len(snap_op.execute({})) >= 2

    # rendered-but-invalid action fails at execute, not silently
    bad = TableSnapshotOperator(
        spark=spark, warehouse=warehouse, namespace="geo",
        table="region_20260814", action="{{ params.action }}",
    )
    _render_templates(bad, {"params": {"action": "explode"}})
    with pytest.raises(ValueError, match="unknown snapshot action"):
        bad.execute({})

    aged = TableAgingOperator(
        spark=spark, warehouse=warehouse,
        namespace="geo", table="region_{{ ds_nodash }}",
        retain_last="{{ params.keep }}", older_than_ms="{{ params.horizon }}",
    )
    _render_templates(aged, {"ds_nodash": "20260814",
                             "params": {"keep": 1, "horizon": 0}})
    assert aged.execute({})["expired"]  # string "1"/"0" coerced, expiry ran
