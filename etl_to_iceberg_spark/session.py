"""SparkSession construction tuned for large-scale ETL.

Replaces the reference's session builder
(``/root/reference/airflow-plugins/utils/spark_builder.py:214-270``) with an
idiomatic, cluster-ready configuration:

- AQE on (runtime coalescing, skew-join splitting) — the reference relies on
  static per-partition jobs instead (``hdfs_to_iceberg_operator.py:199-207``).
- zstd parquet compression (parity with ``spark_builder.py:248``).
- Arrow-accelerated pandas interchange for the Pandas-UDF extension operators.
- Iceberg catalog config is applied only when the Iceberg runtime jar is
  actually on the classpath (``spark_builder.py:199-211`` hard-codes it); in
  its absence the engine's built-in snapshot-table layer
  (:mod:`etl_to_iceberg_spark.tables`) provides the same semantics.

One session per process: the reference creates and stops a SparkSession per
task and even per partition (``hdfs_to_iceberg_operator.py:245-251,301``) —
an anti-pattern at scale; here ``get_spark()`` is get-or-create.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class SessionConfig:
    """Engine session settings.

    ``shuffle_partitions`` should track cluster parallelism: ~2-3x total
    cores for the target stage size; with AQE enabled it is an upper bound
    that AQE coalesces down from, so err high for 100 TB inputs.
    """

    app_name: str = "etl-to-iceberg-spark"
    master: str | None = None  # None -> respect spark-submit / default
    shuffle_partitions: int | None = None  # None -> 32 locally, AQE-managed
    local_cores: int = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parquet_compression: str = "zstd"  # ref: spark_builder.py:248
    enable_iceberg: bool = True  # applied only if the runtime jar is present
    iceberg_warehouse: str | None = None
    extra_conf: dict[str, str] = field(default_factory=dict)


def _iceberg_jar_available() -> bool:
    """True when an iceberg-spark-runtime jar is visible to this JVM."""
    spark_home = os.environ.get("SPARK_HOME")
    candidates = []
    if spark_home:
        candidates.append(os.path.join(spark_home, "jars"))
    try:
        import pyspark

        candidates.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:  # pragma: no cover
        pass
    for d in candidates:
        if os.path.isdir(d):
            for name in os.listdir(d):
                if "iceberg-spark-runtime" in name and name.endswith(".jar"):
                    return True
    return False


def iceberg_conf(warehouse: str) -> dict[str, str]:
    """The Iceberg catalog wiring applied when the runtime jar is present.

    Semantics mirror the reference's builder (spark_builder.py:199-211):
    SQL extensions for MERGE/time-travel/procedures, a named SparkCatalog,
    and a warehouse root — with a local hadoop catalog standing in for the
    reference's REST/MinIO combo (:func:`minio_catalog_conf` assembles
    that deployment shape; layer it via ``SessionConfig.extra_conf``).
    Kept as a pure function so the sandbox
    (which has no iceberg-spark-runtime jar — tests/test_tables.py
    documents the fallback) can still assert the exact conf contract."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        "spark.sql.catalog.ice": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.ice.type": "hadoop",
        "spark.sql.catalog.ice.warehouse": warehouse,
    }


def minio_catalog_conf(
    bucket: str | None = None,
    *,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    warehouse_path: str | None = None,
    rest_uri: str | None = None,
    catalog: str = "ice",
) -> dict[str, str]:
    """Spark conf for an Iceberg REST catalog on MinIO/S3 object storage.

    Mirrors the reference's catalog-config assembly
    (``utils/minio_manager.py:7-80``) — endpoint/keys/bucket with the
    same env-var layering (``MINIO_ENDPOINT``/``MINIO_ACCESS_KEY``/
    ``MINIO_SECRET_KEY``/``MINIO_BUCKET`` defaults, ``ICEBERG_REST_URI``
    for the catalog service, optional ``ICEBERG_AUTH_TYPE``/
    ``ICEBERG_CREDENTIAL`` passthrough), warehouse defaulting to
    ``s3://{bucket}/warehouse``, and MinIO's mandatory path-style access
    — emitted as the Spark-side wiring instead of a pyiceberg dict: the
    named SparkCatalog in REST mode with S3FileIO, plus the mirroring
    ``fs.s3a.*`` Hadoop conf so plain ``spark.read`` against the same
    store resolves too. Layer the result via ``SessionConfig.extra_conf``
    (the jar gate in :func:`assemble_conf` governs whether the catalog
    classes exist; this function is pure assembly, testable sandbox-side
    like :func:`iceberg_conf`)."""
    endpoint = endpoint or os.environ.get("MINIO_ENDPOINT", "http://localhost:9000")
    access_key = access_key or os.environ.get("MINIO_ACCESS_KEY", "minioadmin")
    secret_key = secret_key or os.environ.get("MINIO_SECRET_KEY", "minioadmin")
    bucket = bucket or os.environ.get("MINIO_BUCKET", "iceberg")
    rest_uri = rest_uri or os.environ.get("ICEBERG_REST_URI", "http://localhost:8181")
    warehouse = warehouse_path or f"s3://{bucket}/warehouse"
    c = f"spark.sql.catalog.{catalog}"
    conf = {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        c: "org.apache.iceberg.spark.SparkCatalog",
        f"{c}.type": "rest",
        f"{c}.uri": rest_uri,
        f"{c}.warehouse": warehouse,
        f"{c}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
        f"{c}.s3.endpoint": endpoint,
        f"{c}.s3.access-key-id": access_key,
        f"{c}.s3.secret-access-key": secret_key,
        f"{c}.s3.path-style-access": "true",  # MinIO serves path-style only
        # Hadoop-side mirror for non-catalog reads over the same store.
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": "true",
    }
    if os.environ.get("ICEBERG_AUTH_TYPE"):
        conf[f"{c}.rest.auth.type"] = os.environ["ICEBERG_AUTH_TYPE"]
    if os.environ.get("ICEBERG_CREDENTIAL"):
        conf[f"{c}.credential"] = os.environ["ICEBERG_CREDENTIAL"]
    return conf


def kerberos_conf(
    principal: str | None = None,
    *,
    keytab: str | None = None,
    namenodes: str | None = None,
    user: str | None = None,
) -> dict[str, str]:
    """Spark conf for secure (Kerberized) HDFS access.

    The reference reaches Kerberized HDFS through a WebHDFS client-side
    hook (``hdfs_to_iceberg/hooks.py:55-77``: ``KerberosClient`` when
    credentials are set, ``InsecureClient`` with a plain username
    otherwise) because Airflow tasks list files outside Spark. The
    Spark-native analogue is session conf, not an operator — the
    engine's file listing already goes through Spark/Hadoop (native
    parquet/ORC listing + the snapshot manifest), so securing it is
    this wiring:

    - ``spark.kerberos.principal`` / ``spark.kerberos.keytab`` — lets
      Spark log in AND renew delegation tokens, which long-running jobs
      (streaming ingest ticks) need; a bare ``kinit`` ticket expires
      mid-job.
    - ``spark.kerberos.access.hadoopFileSystems`` — every namenode URI
      the job touches (comma-separated), so tokens are fetched up front
      for cross-cluster reads (e.g. reading one secure HDFS while
      writing another, or HDFS→S3A migrations).
    - ``spark.hadoop.hadoop.security.authentication=kerberos`` — the
      Hadoop-side switch, mirrored the way :func:`minio_catalog_conf`
      mirrors ``fs.s3a.*``.

    Without a principal+keytab pair this emits the reference's
    insecure-dev branch instead: ``HADOOP_USER_NAME`` for executors and
    a cluster-mode (YARN AM) driver — the simple-auth identity
    ``InsecureClient(user=...)`` maps to. A client-mode/local driver
    takes its identity from its own process env, which ``spark.*Env``
    conf cannot set retroactively: export ``HADOOP_USER_NAME`` in the
    launching shell for that case. (The env-var default below covers it
    for free — when the identity comes from ``HADOOP_USER_NAME`` rather
    than the ``user=`` arg, the client-mode driver inherits the same
    variable.) Env layering matches the package convention:
    ``KERBEROS_PRINCIPAL`` / ``KERBEROS_KEYTAB`` / ``HDFS_NAMENODES`` /
    ``HADOOP_USER_NAME`` are the defaults. Pure assembly — layer via
    ``SessionConfig.extra_conf``; nothing here requires the sandbox to
    have a KDC, so the contract is unit-testable like
    :func:`iceberg_conf`."""
    principal = principal or os.environ.get("KERBEROS_PRINCIPAL")
    keytab = keytab or os.environ.get("KERBEROS_KEYTAB")
    namenodes = namenodes or os.environ.get("HDFS_NAMENODES")
    user = user or os.environ.get("HADOOP_USER_NAME")
    if principal and keytab:
        conf = {
            "spark.kerberos.principal": principal,
            "spark.kerberos.keytab": keytab,
            "spark.hadoop.hadoop.security.authentication": "kerberos",
        }
        if namenodes:
            conf["spark.kerberos.access.hadoopFileSystems"] = namenodes
        return conf
    if user:
        # Reference's InsecureClient(user=...) branch: simple auth with an
        # explicit identity — dev/test clusters only.
        return {
            "spark.executorEnv.HADOOP_USER_NAME": user,
            "spark.yarn.appMasterEnv.HADOOP_USER_NAME": user,
        }
    return {}


def assemble_conf(cfg: SessionConfig) -> dict[str, str]:
    """The full conf dict :func:`get_spark` applies, as a pure function
    of the config + jar availability. Split out so the Iceberg gate —
    the one code path the sandbox can never execute (no
    iceberg-spark-runtime jar exists for this environment, and there is
    no network to fetch one) — still has test signal: tests pin that
    the gate injects the catalog wiring exactly when the jar is present
    and stays silent when it is not (tests/test_tables.py)."""
    shuffle = cfg.shuffle_partitions
    if shuffle is None:
        # Locally: match core count. On a cluster, set explicitly (2-3x cores).
        shuffle = cfg.local_cores

    conf: dict[str, str] = {
        "spark.sql.shuffle.partitions": str(shuffle),
        # Runtime re-planning: partition coalescing + skew-join splitting.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Columnar output parity with the reference (zstd parquet).
        "spark.sql.parquet.compression.codec": cfg.parquet_compression,
        # Arrow batches for any pandas interchange (ext/ Pandas UDFs).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Parquet TIMESTAMP(NANOS) is otherwise an illegal type for Spark;
        # read it as long and let the loader (sources.tables.load_table)
        # convert ns→µs timestamps via the parquet footer metadata.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Parquet TIMESTAMP without the isAdjustedToUTC flag would otherwise
        # load as TIMESTAMP_NTZ (Spark 3.4+ inference), breaking LTZ-only
        # functions (unix_micros, window, watermarks) and diverging from the
        # engine's defined-in-UTC semantics. Read naive parquet timestamps
        # as session-UTC instants, matching the DuckDB oracle's naive reads.
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        # Keep partition discovery cheap on huge listings.
        "spark.sql.sources.parallelPartitionDiscovery.threshold": "32",
        # Reliable checkpoints (iterative fixpoints, ext/dedup.py) are
        # deleted by the ContextCleaner once their RDDs are GC'd —
        # without this a long-lived session accumulates every round's
        # checkpoint files forever (the default is false).
        "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
        "spark.sql.session.timeZone": "UTC",
        # Session-catalog tables (bucketed joins) land in a scratch
        # warehouse, not the process cwd.
        "spark.sql.warehouse.dir": os.path.join(
            tempfile.gettempdir(), "e2is_spark_warehouse"
        ),
    }

    if cfg.enable_iceberg and _iceberg_jar_available():
        warehouse = cfg.iceberg_warehouse or os.path.join(
            os.getcwd(), "warehouse", "iceberg"
        )
        conf.update(iceberg_conf(warehouse))

    conf.update(cfg.extra_conf)
    return conf


def get_spark(cfg: SessionConfig | None = None) -> SparkSession:
    """Get-or-create the engine SparkSession."""
    cfg = cfg or SessionConfig()

    builder = SparkSession.builder.appName(cfg.app_name)
    if cfg.master:
        builder = builder.master(cfg.master)
    elif not os.environ.get("SPARK_MASTER") and "SPARK_ENV_LOADED" not in os.environ:
        # Local development / test default. On a real cluster the master
        # comes from spark-submit and this branch is skipped.
        builder = builder.master(f"local[{cfg.local_cores}]")

    for k, v in assemble_conf(cfg).items():
        builder = builder.config(k, v)

    return builder.getOrCreate()


# Confs the engine's semantics DEPEND on (not just tuning): these are
# runtime-settable, so they can be applied defensively to a session the
# engine did not build (e.g. a test harness passing its own SparkSession).
_REQUIRED_RUNTIME_CONFS = {
    # events.ts is parquet TIMESTAMP(NANOS) — illegal to Spark otherwise;
    # sources.tables.load_parquet_table does the long→timestamp fixup.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive parquet timestamps load as UTC instants, not TIMESTAMP_NTZ.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # All checked results are defined in UTC.
    "spark.sql.session.timeZone": "UTC",
    # Arrow batches for the Pandas-UDF extension operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply the engine's required runtime-settable confs to ``spark``.

    Idempotent and cheap (flagged per session object); called from the
    data loaders so the driver contract works on ANY session, not only
    one built by :func:`get_spark`."""
    if getattr(spark, "_e2is_confs_ensured", False):
        return
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on some builds
            pass
    spark._e2is_confs_ensured = True


def stop_spark() -> None:
    """Stop the active session (tests only — a long-lived engine keeps it)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
