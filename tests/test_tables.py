"""Managed-table layer tests: snapshot semantics, file-pruned merge,
maintenance services."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog, maintenance


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def test_create_append_read(cat, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("geo.nation")
    t.append(nation)
    assert t.read().count() == nation.count()
    t.append(nation)
    assert t.read().count() == 2 * nation.count()
    assert [s.operation for s in t.snapshots()] == ["create", "append"]


def test_overwrite_is_atomic_snapshot(cat, spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    t = cat.table("geo.region")
    t.append(region)
    t.overwrite(region.limit(2))
    assert t.read().count() == 2
    # previous snapshot still readable (time travel)
    assert t.read(version=1).count() == region.count()


def test_merge_updates_inserts_and_prunes_files(cat, spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    t = cat.table("sales.orders")
    t.append(orders.repartition(8))
    n = orders.count()

    delta = orders.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") * 0 + 1.0).alias("o_totalprice"),
        "o_orderdate", F.lit("X").alias("o_orderpriority"),
    )
    n_updates = delta.count()
    snap = t.merge(delta, keys=["o_orderkey"])

    assert t.read().count() == n  # pure update, no inserts
    updated = t.read().where(F.col("o_orderpriority") == "X").count()
    assert updated == n_updates
    # carried files only exist if some files had no matched keys; with 8
    # files and sparse keys this may rewrite all 8 — but never more.
    assert snap.summary["rewritten_files"] <= 8

    # now insert-only merge
    inserts = orders.limit(5).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    )
    snap2 = t.merge(inserts, keys=["o_orderkey"])
    assert t.read().count() == n + 5
    # insert-only merge touches NO existing files
    assert snap2.summary["rewritten_files"] == 0


def test_merge_dedups_source_latest_wins(cat, spark):
    t = cat.table("s.kv")
    base = cat.spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k int, v string, ver int")
    t.append(base)
    src = cat.spark.createDataFrame(
        [(1, "old", 2), (1, "new", 3), (3, "c", 1)], "k int, v string, ver int"
    )
    t.merge(src, keys=["k"], dedup_order_by=["ver"])
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows == {1: "new", 2: "b", 3: "c"}


def test_merge_with_delete_clause(cat, spark):
    t = cat.table("s.kv2")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    src = spark.createDataFrame(
        [(1, "__DEL__"), (2, "b2"), (3, "c")], "k int, v string"
    )
    t.merge(src, keys=["k"], delete_matched_when="v = '__DEL__'")
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows == {2: "b2", 3: "c"}


def test_delete_where(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    t = cat.table("s.ev")
    t.append(ev.repartition(4))
    n_err = ev.where("event_type = 'error'").count()
    t.delete_where("event_type = 'error'")
    assert t.read().count() == ev.count() - n_err
    assert t.read().where("event_type = 'error'").count() == 0


def test_partitioned_write_prunes(cat, spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.year("l_shipdate").alias("l_year")
    )
    t = cat.table("s.li_part")
    t.create(li, partition_by=["l_year"])
    years = [r.l_year for r in t.read().select("l_year").distinct().collect()]
    assert len(years) > 1
    one = t.read().where(F.col("l_year") == years[0])
    expected = li.where(F.col("l_year") == years[0]).count()
    assert one.count() == expected
    # physical partition dirs exist
    snap = t.snapshot()
    assert any(f"l_year={years[0]}" in fe.path for fe in snap.files)


def test_compaction_reduces_files_preserves_rows(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    t = cat.table("s.ev_c")
    # Small files come from many small COMMITS (each append is sized to
    # the target-file-size, so a single small append is one file now —
    # the compaction target is the accumulation across commits).
    for k in range(4):
        t.append(ev.where(F.col("event_id") % 4 == k))
    before = len(t.snapshot().files)
    assert before >= 4
    snap = maintenance.compact(t, target_file_size_mb=512)
    assert len(snap.files) < before
    assert t.read().count() == ev.count()
    assert snap.operation == "replace"


def test_expire_snapshots_gc(cat, spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_age")
    for _ in range(4):
        t.overwrite(region)
    all_files = [fe.path for s in t.snapshots() for fe in s.files]
    res = maintenance.expire_snapshots(t, older_than_ms=2**62, retain_last=1)
    assert res["expired_snapshots"] == 3
    assert res["removed_data_files"] > 0
    # current still readable; expired version is not
    assert t.read().count() == region.count()
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)
    # orphaned files physically gone
    live = {fe.path for s in t.snapshots() for fe in s.files}
    for p in all_files:
        if p not in live:
            assert not os.path.exists(p)


def test_rollback_and_history(cat, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("s.n_rb")
    t.append(nation)
    t.overwrite(nation.limit(1))
    maintenance.rollback(t, 1)
    assert t.read().count() == nation.count()
    ops = [s.operation for s in t.snapshots()]
    assert ops == ["create", "overwrite", "rollback"]


def test_incremental_read(cat, spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    t = cat.table("s.sup")
    t.append(sup.where("s_suppkey % 2 = 0"))
    t.append(sup.where("s_suppkey % 2 = 1"))
    inc = t.incremental_read(1, 2)
    assert inc.count() == sup.where("s_suppkey % 2 = 1").count()
    assert inc.where("s_suppkey % 2 = 0").count() == 0


def test_catalog_namespaces(cat, spark):
    df = spark.range(3).toDF("id")
    cat.table("ns1.a").append(df)
    cat.table("ns2.b").append(df)
    assert cat.list_namespaces() == ["ns1", "ns2"]
    assert cat.list_tables("ns1") == ["a"]
    assert cat.table_exists("ns1.a")
    cat.drop_table("ns1.a")
    assert not cat.table_exists("ns1.a")


def test_time_travel_as_of_ms(cat, spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_tt")
    t.append(region.limit(2))
    ts1 = t.snapshot().timestamp_ms
    t.append(region)
    assert t.read(as_of_ms=ts1).count() == 2


def test_load_table_on_session_without_engine_confs(spark, sf_dir):
    """The driver contract must work on a session the engine didn't build:
    load_parquet_table re-applies required runtime confs itself."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    if hasattr(spark, "_e2is_confs_ensured"):
        del spark._e2is_confs_ensured
    try:
        from etl_to_iceberg_spark.sources.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        assert ev.limit(1).count() == 1
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_merge_rewrites_only_touched_partition(spark, sf_dir):
    """A delta confined to one partition must carry every other
    partition's files by reference."""
    import tempfile

    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.tables import Catalog

    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_mps_"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    t = cat.table("s.orders_part")
    t.create(orders, partition_by=["o_year"])
    n_years = orders.select("o_year").distinct().count()
    files_before = len(t.snapshot().files)

    delta = orders.where((F.col("o_year") == 1995) & (F.col("o_orderkey") % 2 == 0)) \
        .select("o_orderkey", (F.col("o_totalprice") * 10).alias("o_totalprice"), "o_year")
    snap = t.merge(delta, keys=["o_orderkey"])

    assert snap.summary["carried_files"] > 0
    # rewritten files are a minority when only 1 of n_years partitions is hit
    assert snap.summary["rewritten_files"] < files_before
    assert snap.summary["rewritten_files"] <= max(1, files_before // max(n_years - 1, 1) + 1)
    # content: merged rows changed, others untouched
    got = t.read()
    changed = got.where((F.col("o_year") == 1995) & (F.col("o_orderkey") % 2 == 0))
    base = orders.where((F.col("o_year") == 1995) & (F.col("o_orderkey") % 2 == 0))
    assert changed.count() == base.count()
    assert got.count() == orders.count()


def test_iceberg_conf_contract():
    """The sandbox ships no iceberg-spark-runtime jar, so the real catalog
    path can't execute here (every table op runs on the snapshot-log
    format instead — the tests above). This pins the EXACT conf the
    session applies when the jar IS present, mirroring the reference's
    builder semantics (spark_builder.py:199-211): SQL extensions (MERGE /
    time travel / CALL procedures), a SparkCatalog named 'ice', and the
    warehouse root."""
    from etl_to_iceberg_spark.session import _iceberg_jar_available, iceberg_conf

    conf = iceberg_conf("/tmp/wh")
    assert conf["spark.sql.extensions"] == (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    )
    assert conf["spark.sql.catalog.ice"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.ice.type"] == "hadoop"
    assert conf["spark.sql.catalog.ice.warehouse"] == "/tmp/wh"
    # and the gate is honest about this environment
    assert _iceberg_jar_available() is False


def test_session_conf_assembly_iceberg_gate(monkeypatch):
    """assemble_conf injects the Iceberg catalog wiring exactly when the
    runtime jar is present (and enable_iceberg is on), and never
    otherwise — the gate logic itself, not just the conf constants. This
    is the strongest signal obtainable here for session.py's real-Iceberg
    branch: the jar cannot execute in this environment (none ships for
    this Spark build, no network to fetch one — SCALING.md watchpoint 1),
    so the assembly contract is what gets pinned."""
    from etl_to_iceberg_spark import session as S

    cfg = S.SessionConfig(iceberg_warehouse="/tmp/wh_gate")

    monkeypatch.setattr(S, "_iceberg_jar_available", lambda: True)
    conf = S.assemble_conf(cfg)
    assert conf["spark.sql.catalog.ice.warehouse"] == "/tmp/wh_gate"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
    # extra_conf layers OVER the iceberg block (deployment overrides win)
    cfg_over = S.SessionConfig(
        iceberg_warehouse="/tmp/wh_gate",
        extra_conf={"spark.sql.catalog.ice.type": "rest"},
    )
    assert S.assemble_conf(cfg_over)["spark.sql.catalog.ice.type"] == "rest"

    monkeypatch.setattr(S, "_iceberg_jar_available", lambda: False)
    no_jar = S.assemble_conf(cfg)
    assert not any(k.startswith("spark.sql.catalog.ice") for k in no_jar)
    assert "spark.sql.extensions" not in no_jar

    monkeypatch.setattr(S, "_iceberg_jar_available", lambda: True)
    disabled = S.assemble_conf(S.SessionConfig(enable_iceberg=False))
    assert not any(k.startswith("spark.sql.catalog.ice") for k in disabled)
    # the non-iceberg engine confs are identical either way
    base_keys = set(no_jar) | {"spark.sql.shuffle.partitions"}
    assert base_keys <= set(disabled) | set(no_jar)


def test_minio_catalog_conf_mirrors_reference_assembly(monkeypatch):
    """minio_catalog_conf mirrors the reference's catalog-config
    semantics (utils/minio_manager.py:7-80): explicit args win, env vars
    layer underneath with the reference's defaults, warehouse defaults
    to s3://{bucket}/warehouse, path-style access is always on, and the
    optional ICEBERG_AUTH_TYPE/ICEBERG_CREDENTIAL pass through."""
    from etl_to_iceberg_spark.session import minio_catalog_conf

    for v in ("MINIO_ENDPOINT", "MINIO_ACCESS_KEY", "MINIO_SECRET_KEY",
              "MINIO_BUCKET", "ICEBERG_REST_URI", "ICEBERG_AUTH_TYPE",
              "ICEBERG_CREDENTIAL"):
        monkeypatch.delenv(v, raising=False)

    conf = minio_catalog_conf()
    assert conf["spark.sql.catalog.ice.type"] == "rest"
    assert conf["spark.sql.catalog.ice.uri"] == "http://localhost:8181"
    assert conf["spark.sql.catalog.ice.warehouse"] == "s3://iceberg/warehouse"
    assert conf["spark.sql.catalog.ice.s3.endpoint"] == "http://localhost:9000"
    assert conf["spark.sql.catalog.ice.s3.path-style-access"] == "true"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "minioadmin"
    assert "spark.sql.catalog.ice.rest.auth.type" not in conf

    monkeypatch.setenv("MINIO_ENDPOINT", "http://minio.svc:9000")
    monkeypatch.setenv("MINIO_BUCKET", "lake")
    monkeypatch.setenv("ICEBERG_AUTH_TYPE", "oauth2")
    monkeypatch.setenv("ICEBERG_CREDENTIAL", "cid:csecret")
    conf = minio_catalog_conf()
    assert conf["spark.sql.catalog.ice.s3.endpoint"] == "http://minio.svc:9000"
    assert conf["spark.sql.catalog.ice.warehouse"] == "s3://lake/warehouse"
    assert conf["spark.sql.catalog.ice.rest.auth.type"] == "oauth2"
    assert conf["spark.sql.catalog.ice.credential"] == "cid:csecret"

    conf = minio_catalog_conf(
        "b2", endpoint="http://e:9", access_key="ak", secret_key="sk",
        warehouse_path="s3://b2/custom", rest_uri="http://r:81",
        catalog="lakehouse",
    )
    assert conf["spark.sql.catalog.lakehouse.warehouse"] == "s3://b2/custom"
    assert conf["spark.sql.catalog.lakehouse.uri"] == "http://r:81"
    assert conf["spark.sql.catalog.lakehouse.s3.access-key-id"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert not any(".ice." in k for k in conf)


def test_kerberos_conf_mirrors_reference_hook_branches(monkeypatch):
    """kerberos_conf mirrors the reference HdfsHook's two auth branches
    (hdfs_to_iceberg/hooks.py:55-77): credentials present -> secure
    client (here: spark.kerberos.* principal/keytab wiring + the Hadoop
    auth switch, with the optional namenode token list), no credentials
    but a user -> insecure simple-auth identity, neither -> empty.
    Explicit args win; env vars layer underneath."""
    from etl_to_iceberg_spark.session import kerberos_conf

    for v in ("KERBEROS_PRINCIPAL", "KERBEROS_KEYTAB", "HDFS_NAMENODES",
              "HADOOP_USER_NAME"):
        monkeypatch.delenv(v, raising=False)

    assert kerberos_conf() == {}

    conf = kerberos_conf("etl@REALM", keytab="/etc/sec/etl.keytab")
    assert conf["spark.kerberos.principal"] == "etl@REALM"
    assert conf["spark.kerberos.keytab"] == "/etc/sec/etl.keytab"
    assert conf["spark.hadoop.hadoop.security.authentication"] == "kerberos"
    assert "spark.kerberos.access.hadoopFileSystems" not in conf

    conf = kerberos_conf(
        "etl@REALM", keytab="/k", namenodes="hdfs://nn1:8020,hdfs://nn2:8020"
    )
    assert (
        conf["spark.kerberos.access.hadoopFileSystems"]
        == "hdfs://nn1:8020,hdfs://nn2:8020"
    )

    # principal without keytab cannot renew tokens -> not the secure branch
    assert kerberos_conf("etl@REALM") == {}

    conf = kerberos_conf(user="hdfs")
    assert conf == {
        "spark.executorEnv.HADOOP_USER_NAME": "hdfs",
        "spark.yarn.appMasterEnv.HADOOP_USER_NAME": "hdfs",
    }

    monkeypatch.setenv("KERBEROS_PRINCIPAL", "svc@ENV.REALM")
    monkeypatch.setenv("KERBEROS_KEYTAB", "/env/kt")
    monkeypatch.setenv("HDFS_NAMENODES", "hdfs://env-nn:8020")
    conf = kerberos_conf()
    assert conf["spark.kerberos.principal"] == "svc@ENV.REALM"
    assert conf["spark.kerberos.access.hadoopFileSystems"] == "hdfs://env-nn:8020"
    conf = kerberos_conf("arg@REALM", keytab="/arg/kt", namenodes="hdfs://a:1")
    assert conf["spark.kerberos.principal"] == "arg@REALM"
    assert conf["spark.kerberos.access.hadoopFileSystems"] == "hdfs://a:1"


def test_zorder_clustering_tightens_file_envelopes(spark, sf_dir):
    """After a z-order rewrite, each file's (custkey, day) min/max envelope
    must be tighter than the scattered layout's — the property file/row-
    group skipping depends on."""
    import tempfile

    from etl_to_iceberg_spark.tables import maintenance

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.unix_millis(F.col("o_orderdate").cast("timestamp")) / 86400000)
        .cast("bigint")
        .alias("o_day"),
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="e2is_z_"))
    t = cat.table("a.orders_z")
    t.append(orders.repartition(8))  # scattered: every file spans everything

    def mean_span(table):
        spans = (
            table.read()
            .withColumn("__f", F.col("_metadata.file_path"))
            .groupBy("__f")
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
                (F.max("o_day") - F.min("o_day")).alias("dy"),
            )
            .agg(F.avg("ck").alias("ck"), F.avg("dy").alias("dy"))
            .collect()[0]
        )
        return spans["ck"], spans["dy"]

    ck_before, dy_before = mean_span(t)
    snap = maintenance.cluster_zorder(t, ["o_custkey", "o_day"], n_files=16)
    assert snap.summary["strategy"] == "zorder"
    assert len(snap.files) > 1  # multiple files, else spans are trivially tight
    ck_after, dy_after = mean_span(t)
    # both dimensions tighten — that's the z-order property (a plain sort
    # on custkey would tighten custkey but leave day spans full-width)
    assert ck_after < ck_before * 0.75
    assert dy_after < dy_before * 0.75
    # content unchanged
    assert t.read().count() == orders.count()


def test_zvalue_interleave_is_monotone_in_quadrants():
    from etl_to_iceberg_spark.tables.maintenance import zvalue
    from etl_to_iceberg_spark.session import get_spark

    spark = get_spark()
    rows = spark.range(1).select(
        zvalue(F.lit(0), F.lit(0), bits=4).alias("z00"),
        zvalue(F.lit(3), F.lit(0), bits=4).alias("z30"),
        zvalue(F.lit(0), F.lit(3), bits=4).alias("z03"),
        zvalue(F.lit(3), F.lit(3), bits=4).alias("z33"),
        zvalue(F.lit(15), F.lit(15), bits=4).alias("zmax"),
    ).collect()[0]
    # interleaved bits: z(a,b) = sum a_i 4^i + 2 b_i 4^i
    assert rows["z00"] == 0
    assert rows["z30"] == 0b0101
    assert rows["z03"] == 0b1010
    assert rows["z33"] == 0b1111
    assert rows["zmax"] == (1 << 8) - 1


def test_schema_evolution_append(cat, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = cat.table("evo.nation")
    t.create(nation)
    widened = nation.withColumn("tier", F.lit("gold"))
    t.append(widened)
    out = t.read()
    assert [f.name for f in out.schema.fields] == ["n_nationkey", "n_name", "tier"]
    rows = out.collect()
    assert len(rows) == 2 * nation.count()
    # Pre-evolution rows read as NULL; post-evolution rows keep the value.
    assert sum(1 for r in rows if r.tier is None) == nation.count()
    assert sum(1 for r in rows if r.tier == "gold") == nation.count()
    # Old files were NOT rewritten — evolution is metadata-only.
    snaps = t.snapshots()
    assert {fe.path for fe in snaps[0].files} <= {fe.path for fe in snaps[-1].files}


def test_schema_evolution_rejects_type_change(cat, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = cat.table("evo.nation2")
    t.create(nation)
    bad = nation.withColumn("n_nationkey", F.col("n_nationkey").cast("string"))
    with pytest.raises(TypeError, match="schema evolution"):
        t.append(bad)


def test_schema_evolution_survives_post_era_delete(cat, spark, sf_dir):
    """Deleting every post-evolution row must not break the read: the
    evolved column NULL-fills even when no live file contains it."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = cat.table("evo.nation3")
    t.create(nation.where(F.col("n_nationkey") < 10))
    t.append(
        nation.where(F.col("n_nationkey") >= 10).withColumn("tier", F.lit("gold"))
    )
    t.delete_where("n_nationkey >= 10")
    out = t.read()
    assert [f.name for f in out.schema.fields] == ["n_nationkey", "n_name", "tier"]
    assert out.where(F.col("tier").isNotNull()).count() == 0
    assert out.count() == nation.where(F.col("n_nationkey") < 10).count()


def test_remove_orphan_files(cat, spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("evo.nation4")
    t.create(nation)
    before = t.read().count()
    crash_dir = os.path.join(t.location, "data", "v999")
    nation.limit(1).coalesce(1).write.parquet(crash_dir)
    swept = maintenance.remove_orphan_files(t).collect()
    assert len(swept) == 1 and swept[0].removed
    assert not any(p.endswith(".parquet") for p in os.listdir(crash_dir))
    # Referenced files untouched; table reads identically.
    assert t.read().count() == before
    # Idempotent: second sweep finds nothing.
    assert maintenance.remove_orphan_files(t).count() == 0


def test_merge_schema_evolution(cat, spark, sf_dir):
    """A MERGE source carrying a new column widens the table schema;
    untouched pre-evolution rows read NULL for it."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = cat.table("evo.nation5")
    t.create(nation)
    src = (
        nation.where(F.col("n_nationkey") < 5)
        .withColumn("n_name", F.upper("n_name"))
        .withColumn("reviewed", F.lit(True))
    )
    t.merge(src, keys=["n_nationkey"])
    out = t.read()
    assert [f.name for f in out.schema.fields] == ["n_nationkey", "n_name", "reviewed"]
    assert out.count() == nation.count()
    assert out.where(F.col("reviewed")).count() == 5
    assert out.where(F.col("reviewed").isNull()).count() == nation.count() - 5


def test_partition_stats_matches_data(cat, spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.year("l_shipdate").alias("l_year")
    )
    t = cat.table("s.li_pstat")
    t.create(li, partition_by=["l_year"])
    stats = {r.l_year: (r.file_count, r.row_count)
             for r in maintenance.partition_stats(t).collect()}
    exact = {str(r.l_year): r.n
             for r in li.groupBy("l_year").count().withColumnRenamed("count", "n").collect()}
    assert set(stats) == set(exact)
    for y, (fc, rc) in stats.items():
        assert fc >= 1 and rc == exact[y]


def test_manifest_stats_captured_on_write(cat, spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    t = cat.table("s.o_stats")
    t.create(orders.repartition(4))
    for fe in t.snapshot().files:
        assert fe.stats and "o_orderkey" in fe.stats
        mn, mx = fe.stats["o_orderkey"]
        assert mn <= mx


def test_read_where_prunes_and_matches_filter(cat, spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    t = cat.table("s.o_prune")
    t.create(orders.repartitionByRange(8, "o_orderkey"))
    lo, hi = 100, 500
    kept, skipped = t.pruned_files({"o_orderkey": (lo, hi)})
    assert skipped > 0  # range layout -> most files can't contain the range
    got = t.read_where({"o_orderkey": (lo, hi)})
    want = orders.where(F.col("o_orderkey").between(lo, hi))
    assert got.count() == want.count()
    assert got.select(F.sum("o_custkey")).collect()[0][0] == \
        want.select(F.sum("o_custkey")).collect()[0][0]


def test_zorder_envelopes_are_consumed_by_pruning(cat, spark, sf_dir):
    """cluster_zorder tightens per-file envelopes; read_where must turn
    that into actual file skipping on BOTH clustered dimensions."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        (F.unix_millis(F.col("o_orderdate").cast("timestamp")) / 86400000)
        .cast("bigint").alias("o_day"),
    )
    t = cat.table("s.o_zprune")
    t.append(orders.repartition(8))
    ck = orders.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
    mid = (ck[0] + ck[1]) // 2
    _, skipped_scattered = t.pruned_files({"o_custkey": (ck[0], mid // 4)})
    maintenance.cluster_zorder(t, ["o_custkey", "o_day"], n_files=16)
    kept, skipped_clustered = t.pruned_files({"o_custkey": (ck[0], mid // 4)})
    assert skipped_clustered > skipped_scattered
    assert skipped_clustered > 0 and len(kept) > 0
    got = t.read_where({"o_custkey": (ck[0], mid // 4)}).count()
    want = orders.where(F.col("o_custkey").between(ck[0], mid // 4)).count()
    assert got == want


def test_mor_delete_is_metadata_only_and_reads_filtered(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    t = cat.table("s.ev_mor")
    t.append(ev.repartition(4))
    files_before = {fe.path for fe in t.snapshot().files}
    n_err = ev.where("event_type = 'error'").count()
    snap = t.delete_where("event_type = 'error'", mode="mor")
    # O(1) commit: same files, no rewrite
    assert {fe.path for fe in snap.files} == files_before
    assert snap.summary["mode"] == "mor"
    assert t.read().count() == ev.count() - n_err
    assert t.read().where("event_type = 'error'").count() == 0
    # time travel before the delete still sees everything
    assert t.read(version=1).count() == ev.count()


def test_mor_tombstone_does_not_hit_later_appends(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    t = cat.table("s.ev_mor2")
    t.append(ev.where("event_type <> 'error'"))
    t.delete_where("event_type = 'error'", mode="mor")  # no-op on current rows
    late_errors = ev.where("event_type = 'error'")
    t.append(late_errors)
    # rows appended AFTER the tombstone are NOT deleted by it
    assert t.read().where("event_type = 'error'").count() == late_errors.count()


def test_mor_compaction_materializes_tombstones(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    t = cat.table("s.ev_mor3")
    t.append(ev.repartition(4))
    t.delete_where("event_type = 'error'", mode="mor")
    expected = t.read().count()
    snap = maintenance.compact(t)
    assert snap.summary["tombstones_materialized"] == 1
    assert snap.tombstones == []
    assert t.read().count() == expected
    assert t.read().where("event_type = 'error'").count() == 0


def test_mor_then_merge_does_not_resurrect(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    t = cat.table("s.ev_mor4")
    t.append(ev.repartition(4))
    t.delete_where("event_type = 'error'", mode="mor")
    expected = t.read().count()
    # merge touches some files; their rewrite must keep errors deleted
    delta = ev.where("event_id % 100 = 0 AND event_type <> 'error'").withColumn(
        "value", F.lit(0.0)
    )
    t.merge(delta, keys=["event_id"])
    assert t.read().where("event_type = 'error'").count() == 0
    assert t.read().count() == expected


def test_mor_rollback_restores_tombstone_state(cat, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    t = cat.table("s.ev_mor5")
    t.append(ev)
    t.delete_where("event_type = 'error'", mode="mor")  # v2 with tombstone
    n_after_delete = t.read().count()
    maintenance.compact(t)  # v3, tombstones cleared
    maintenance.rollback(t, 2)  # back to the MOR state
    assert len(t.snapshot().tombstones) == 1
    assert t.read().count() == n_after_delete


def test_commit_conflict_detected_not_lost(cat, spark, sf_dir):
    """Optimistic concurrency: a racing writer that claimed the next
    version makes this commit FAIL instead of silently overwriting."""
    from etl_to_iceberg_spark.tables.format import CommitConflictError

    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_occ")
    t.create(region)
    # Freeze this writer's version choice, then let the rival write that
    # manifest first — modelling the race window between version
    # allocation and the exclusive manifest create.
    nxt = t._next_version()
    t._next_version = lambda: nxt
    with open(os.path.join(t.meta_dir, f"snap-{nxt}.json"), "w") as f:
        f.write("{}")
    with pytest.raises(CommitConflictError):
        t.append(region)


def test_crashed_commit_leftover_does_not_wedge_table(cat, spark, sf_dir):
    """A manifest orphaned by a crash between write and pointer flip must
    be skipped by the next version allocation, not conflict forever."""
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_crash")
    t.create(region)
    # crashed writer: manifest for v2 exists, pointer still at v1
    with open(os.path.join(t.meta_dir, "snap-2.json"), "w") as f:
        f.write("{}")
    assert t.current_version() == 1
    snap = t.append(region)  # must allocate v3, not fight over v2
    assert snap.version == 3
    assert t.read().count() == 2 * region.count()


def test_zorder_three_columns_tightens_all_envelopes(cat, spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        (F.unix_millis(F.col("o_orderdate").cast("timestamp")) / 86400000)
        .cast("bigint").alias("o_day"),
    )
    t = cat.table("s.o_z3")
    t.append(orders.repartition(8))

    def mean_spans(table):
        r = (
            table.read()
            .withColumn("__f", F.col("_metadata.file_path"))
            .groupBy("__f")
            .agg(
                (F.max("o_orderkey") - F.min("o_orderkey")).alias("ok"),
                (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
                (F.max("o_day") - F.min("o_day")).alias("dy"),
            )
            .agg(F.avg("ok").alias("ok"), F.avg("ck").alias("ck"), F.avg("dy").alias("dy"))
            .collect()[0]
        )
        return r["ok"], r["ck"], r["dy"]

    before = mean_spans(t)
    snap = maintenance.cluster_zorder(
        t, ["o_orderkey", "o_custkey", "o_day"], n_files=27
    )
    assert len(snap.files) > 1
    after = mean_spans(t)
    # all three dimensions tighten (bits defaults to 63//3 -> capped 16)
    for b, a in zip(before, after):
        assert a < b * 0.85, (before, after)
    assert t.read().count() == orders.count()


def test_shallow_clone_is_writable_fork(cat, spark, sf_dir, tmp_path):
    """A shallow clone reads the source's data by reference, takes writes
    (append AND merge) privately, and never perturbs the source — the
    Delta SHALLOW CLONE contract."""
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("geo.nation")
    t.append(nation)
    t.delete_where("n_regionkey = 0", mode="mor")  # MOR state must clone too

    clone_cat = cat.shallow_clone(str(tmp_path / "wh_clone"))
    ct = clone_cat.table("geo.nation")
    expected = t.read().count()
    assert ct.read().count() == expected

    # clone metadata is a copy, data is referenced (no parquet under clone)
    import glob as _g
    assert not _g.glob(
        os.path.join(clone_cat.warehouse, "**", "*.parquet"), recursive=True
    )

    # mutations land in the clone only
    ct.append(nation.withColumn("n_name", F.lit("CLONED")))
    ct.merge(
        nation.limit(3).withColumn("n_name", F.lit("MERGED")),
        keys=["n_nationkey"],
    )
    assert ct.read().where("n_name = 'MERGED'").count() == 3
    assert t.read().count() == expected
    assert t.read().where("n_name IN ('CLONED','MERGED')").count() == 0
    # version chains advanced independently
    assert ct.current_version() > t.current_version()


def test_shallow_clone_carries_cursor_state(cat, spark, sf_dir, tmp_path):
    """Non-table control-plane state (the CDC cursor store) must ride the
    clone: a cloned pipeline resumes from the source's cursor, so its next
    tick reads the DELTA, not the full source (ADVICE r4)."""
    import datetime as dt

    from etl_to_iceberg_spark.operators.cdc import CursorStore

    nation = load_table(spark, sf_dir, "nation")
    cat.table("geo.nation").append(nation)
    store = CursorStore(cat)
    store.set("sales", "events",
              last_timestamp=dt.datetime(2024, 1, 15), last_scn=77)

    clone_cat = cat.shallow_clone(str(tmp_path / "wh_clone"))
    cur = CursorStore(clone_cat).get("sales", "events")
    assert cur is not None
    assert cur["last_timestamp"] == dt.datetime(2024, 1, 15)
    assert cur["last_scn"] == 77
    # and the clone's cursor is private: advancing it leaves the source's
    CursorStore(clone_cat).set("sales", "events",
                               last_timestamp=dt.datetime(2025, 1, 1))
    assert store.get("sales", "events")["last_scn"] == 77


def test_expire_snapshots_never_deletes_outside_table_location(
    cat, spark, sf_dir, tmp_path
):
    """Snapshot expiry on a shallow clone must not delete the shared
    source warehouse's data files (ADVICE r4): deletion is scoped to the
    expiring table's own location, like remove_orphan_files."""
    region = load_table(spark, sf_dir, "region")
    t = cat.table("geo.region_exp")
    for _ in range(4):
        t.overwrite(region)
    src_files = {fe.path for s in t.snapshots() for fe in s.files}
    assert src_files and all(os.path.exists(p) for p in src_files)

    clone_cat = cat.shallow_clone(str(tmp_path / "wh_clone"))
    ct = clone_cat.table("geo.region_exp")
    ct.overwrite(region.limit(2))  # clone-owned files now exist too
    stats = maintenance.expire_snapshots(ct, older_than_ms=2**62, retain_last=1)
    assert stats["expired_snapshots"] > 0
    assert stats["skipped_external_files"] > 0
    # every source-owned byte is still there; the pristine source reads fine
    assert all(os.path.exists(p) for p in src_files)
    assert t.read().count() == region.count()


def test_shallow_clone_skips_uncommitted_table_dirs(cat, spark, sf_dir, tmp_path):
    """A table directory left by a writer that crashed before its first
    commit (data/ staged, no _meta/version-hint.txt) must NOT be
    deep-copied into the clone: it holds data-plane bytes and is invisible
    to the catalog, so copying it would break the O(metadata) contract
    (ADVICE r5). Control-plane dirs (no data/_meta subtree) still ride."""
    nation = load_table(spark, sf_dir, "nation")
    cat.table("geo.nation").append(nation)
    # simulate a crashed writer with the REAL staged layout the format
    # produces (format.py::_write_data): data/v<N>-<token>/part-*.parquet
    crashed = os.path.join(cat.warehouse, "geo", "halfborn")
    os.makedirs(os.path.join(crashed, "data", "v1-deadbeef"))
    with open(
        os.path.join(crashed, "data", "v1-deadbeef", "part-000.parquet"), "wb"
    ) as f:
        f.write(b"x" * 4096)
    # a USER control-plane store that happens to organize its payload
    # under a child named data/ is NOT a crashed table — it must ride
    # along (detection is positive on the format's own artifacts, not on
    # generic directory names)
    store = os.path.join(cat.warehouse, "geo", "_statestore")
    os.makedirs(os.path.join(store, "data"))
    with open(os.path.join(store, "data", "cursor.json"), "w") as f:
        f.write('{"cursor": 42}')

    clone_cat = cat.shallow_clone(str(tmp_path / "wh_clone"))
    assert not os.path.exists(os.path.join(clone_cat.warehouse, "geo", "halfborn"))
    # and no data bytes anywhere in the clone (O(metadata) holds)
    import glob as _g
    assert not _g.glob(
        os.path.join(clone_cat.warehouse, "**", "*.parquet"), recursive=True
    )
    with open(
        os.path.join(clone_cat.warehouse, "geo", "_statestore", "data", "cursor.json")
    ) as f:
        assert "42" in f.read()
    assert clone_cat.table("geo.nation").read().count() == nation.count()


def test_expire_snapshots_gc_through_symlinked_warehouse(spark, sf_dir, tmp_path):
    """A warehouse reached via a symlinked path must still classify its own
    files as owned (realpath both sides, ADVICE r5) — otherwise GC silently
    never deletes and disk leaks."""
    real = tmp_path / "wh_real"
    real.mkdir()
    link = tmp_path / "wh_link"
    os.symlink(str(real), str(link))
    cat = Catalog(spark, str(link))
    region = load_table(spark, sf_dir, "region")
    t = cat.table("geo.region_sym")
    for _ in range(3):
        t.overwrite(region)
    stats = maintenance.expire_snapshots(t, older_than_ms=2**62, retain_last=1)
    assert stats["expired_snapshots"] == 2
    assert stats["removed_data_files"] > 0
    assert stats["skipped_external_files"] == 0
    assert t.read().count() == region.count()


def test_seeded_clone_reuses_pristine_and_tracks_clones(spark, sf_dir):
    """seeded_clone seeds once per key, returns distinct clone dirs, and
    registers them for interpreter-exit cleanup (ADVICE r4)."""
    from etl_to_iceberg_spark.operators import table_queries as tq

    calls = []

    def seed(c):
        calls.append(1)
        c.table("geo.n").append(load_table(spark, sf_dir, "nation"))

    a = tq.seeded_clone(spark, "test_seed_reuse", sf_dir, seed)
    b = tq.seeded_clone(spark, "test_seed_reuse", sf_dir, seed)
    assert len(calls) == 1  # pristine built once
    assert a.warehouse != b.warehouse
    assert a.warehouse in tq._CLONES and b.warehouse in tq._CLONES
    assert a.table("geo.n").read().count() == b.table("geo.n").read().count()


def test_load_parquet_table_handles_spark_written_int96(spark, sf_dir, tmp_path):
    """Spark's default parquet timestamp encoding is INT96, which pyarrow's
    footer read reports as timestamp[ns] — the same signature as the
    driver fixtures' TIMESTAMP(NANOS). The ns→µs fixup must fire only when
    Spark actually read the column as a long, so re-loading Spark-written
    output (a round-trip any derived dataset takes) keeps its TIMESTAMP
    type and values."""
    from etl_to_iceberg_spark.sources.tables import load_parquet_table, load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    out = str(tmp_path / "events_rt.parquet")
    ev.write.parquet(out)  # default outputTimestampType = INT96

    back = load_parquet_table(spark, out)
    assert dict(back.dtypes)["ts"] == "timestamp"
    orig = {(r["event_id"], r["ts"]) for r in ev.collect()}
    assert {(r["event_id"], r["ts"]) for r in back.collect()} == orig


def test_incremental_read_skips_compaction_and_rejects_rewrites(
    cat, spark, sf_dir
):
    """A compaction mid-range is data-neutral: the incremental read must
    return only genuinely appended rows, not the rewritten table; a
    rewrite snapshot (overwrite/merge) in range has no defined rows-added
    and must raise unless explicitly skipped."""
    sup = load_table(spark, sf_dir, "supplier")
    t = cat.table("s.sup_inc2")
    t.append(sup.where("s_suppkey % 4 = 0"))           # v1
    maintenance.compact(t, target_file_size_mb=1)       # v2 (replace)
    t.append(sup.where("s_suppkey % 4 = 1"))           # v3
    inc = t.incremental_read(1, 3)
    assert inc.count() == sup.where("s_suppkey % 4 = 1").count()
    assert inc.where("s_suppkey % 4 = 0").count() == 0

    t.overwrite(sup.limit(5))                          # v4 (rewrite)
    t.append(sup.where("s_suppkey % 4 = 2"))           # v5
    with pytest.raises(ValueError, match="overwrite"):
        t.incremental_read(3, 5)
    skipped = t.incremental_read(3, 5, on_rewrite="skip")
    assert skipped.count() == sup.where("s_suppkey % 4 = 2").count()


def test_cherrypick_rejects_rewrite_snapshots(cat, spark, sf_dir):
    """Cherry-picking a MERGE snapshot would re-apply files that carry
    rewritten copies of rows still present in the current state —
    duplicates. Only append/create snapshots are eligible (Iceberg's
    cherrypick_snapshot restriction); the duplicate row count proves why."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    t = cat.table("s.sup_cp")
    t.append(sup)                                             # v1
    t.merge(
        sup.limit(3).withColumn("s_name", F.lit("MERGED")),
        keys=["s_suppkey"],
    )                                                         # v2 (merge)
    merge_v = t.current_version()
    t.append(sup.limit(0))                                    # v3, moves head
    with pytest.raises(ValueError, match="cherry-pick"):
        maintenance.cherrypick(t, merge_v)
    # append snapshots still cherry-pick fine
    base = t.read().count()
    extra = sup.limit(2).withColumn("s_suppkey", F.col("s_suppkey") + 10_000)
    t.append(extra)                                           # v4
    v4 = t.current_version()
    maintenance.rollback(t, merge_v)                          # drop the extras
    maintenance.cherrypick(t, v4)                             # re-apply them
    assert t.read().count() == base + 2


# --- partition-spec evolution ----------------------------------------------


def test_partition_evolution_is_metadata_only_and_layouts_coexist(
    spark, sf_dir, tmp_path
):
    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity",
        F.year("l_shipdate").cast("int").alias("l_year"), "l_returnflag",
    )
    t = cat.table("s.li_evo")
    t.create(li.where("l_year = 1994"), partition_by=["l_year"])
    v1_files = {fe.path for fe in t.snapshot().files}

    snap = t.evolve_partition_spec(["l_returnflag"])
    assert snap.operation == "evolve-partition"
    assert {fe.path for fe in snap.files} == v1_files  # metadata-only
    assert t.snapshot().partition_by == ["l_returnflag"]

    t.append(li.where("l_year = 1995"))  # laid out by the NEW spec
    got = t.read()
    expect = li.where("l_year IN (1994, 1995)")
    assert got.count() == expect.count()
    # both layouts' partition columns fully recovered
    assert got.where("l_year IS NULL OR l_returnflag IS NULL").count() == 0
    assert (
        got.groupBy("l_year").count().orderBy("l_year").collect()
        == expect.groupBy("l_year").count().orderBy("l_year").collect()
    )

    # incremental read across the evolve commit: data-neutral, no error
    inc = t.incremental_read(1)
    assert inc.count() == li.where("l_year = 1995").count()


def test_partition_evolution_guards_and_rollback(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.tables import Catalog, maintenance

    cat = Catalog(spark, str(tmp_path / "wh"))
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_evo")
    t.create(region, partition_by=["r_regionkey"])

    with _pytest.raises(ValueError, match="not in table schema"):
        t.evolve_partition_spec(["no_such_col"])
    # equal spec: no-op, no version burned
    v = t.current_version()
    t.evolve_partition_spec(["r_regionkey"])
    assert t.current_version() == v

    t.evolve_partition_spec([])  # un-partition future writes
    assert t.snapshot().partition_by == []
    maintenance.rollback(t, v)
    assert t.snapshot().partition_by == ["r_regionkey"]  # spec restored


def test_partition_evolution_pins_version_before_reading(spark, sf_dir, tmp_path):
    """Writer-protocol property: evolve_partition_spec must pin its
    commit version BEFORE reading table state, like every other writer.
    A rival append landing between the two then surfaces as a version
    the evolve's own pin accounts for (or a CommitConflictError) — never
    a silently-erased append. Reproduced deterministically by injecting
    the rival inside _next_version: with read-before-pin ordering the
    evolve would commit a stale file list one version past the rival and
    the appended rows would vanish."""
    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.tables import Catalog
    from etl_to_iceberg_spark.tables.format import CommitConflictError

    cat = Catalog(spark, str(tmp_path / "wh"))
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.race_evo")
    t.create(region, partition_by=["r_regionkey"])
    n0 = t.read().count()

    rival_rows = region.limit(2)
    orig = t._next_version
    fired = {"done": False}

    def hooked():
        # The rival lands exactly at the victim's pin point. With the
        # correct pin-before-read ordering the victim's subsequent state
        # read sees the rival's files; with the buggy read-before-pin
        # ordering the victim has already captured a stale file list,
        # allocates one version past the rival, and erases it.
        if not fired["done"]:
            fired["done"] = True
            Catalog(spark, str(tmp_path / "wh")).table("s.race_evo").append(
                rival_rows
            )
        return orig()

    t._next_version = hooked
    try:
        try:
            t.evolve_partition_spec([])
        except CommitConflictError:
            pass  # acceptable outcome: the race was DETECTED, not lost
    finally:
        t._next_version = orig

    # the rival's rows survive no matter which way the race resolved
    assert t.read().count() == n0 + 2


def test_compact_after_partition_evolution_migrates_layout(
    spark, sf_dir, tmp_path
):
    """Compaction rewrites with the CURRENT spec, so it doubles as the
    on-demand migration path for pre-evolution files."""
    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.tables import Catalog, maintenance

    cat = Catalog(spark, str(tmp_path / "wh"))
    nation = load_table(spark, sf_dir, "nation")
    t = cat.table("s.n_evo_cmp")
    t.create(nation, partition_by=["n_regionkey"])
    t.evolve_partition_spec([])  # new spec: unpartitioned
    maintenance.compact(t, target_file_size_mb=512)
    snap = t.snapshot()
    assert snap.operation == "replace" and snap.partition_by == []
    # every live file now lives under the new (flat) layout
    assert all("n_regionkey=" not in fe.path for fe in snap.files)
    assert t.read().count() == nation.count()


def test_merge_and_delete_on_emptied_table(spark, sf_dir, tmp_path):
    """A ZERO-FILE snapshot (fresh explicit-schema table; also reachable
    when Spark writes no part files for an emptied table) must support
    MERGE (insert-all) and DELETE (no-op), not crash with IndexError in
    _read_with_path. Found by the randomized lifecycle sweep."""
    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_emptied")
    t.create(region)
    # Whether Spark emits a 0-row part file for an empty write is
    # plan-dependent; commit the zero-file snapshot directly (the state
    # the sweep reached) so the repro is deterministic.
    t._commit("delete", [], t.schema(), [], summary={"mode": "cow"})
    assert t.read().count() == 0 and not t.snapshot().files

    t.delete_where("r_regionkey = 1", mode="cow")  # no-op, no crash
    assert t.read().count() == 0

    t.merge(region, keys=["r_regionkey"])  # all rows insert
    assert t.read().count() == region.count()
