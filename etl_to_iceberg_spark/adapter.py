"""Scheduler-facing operator adapter — the reference's actual user API.

The reference packages its engine as Airflow operators
(`oracle_to_iceberg/oracle_to_iceberg_operator.py:71-104`,
`oracle_to_iceberg/oracle_to_iceberg_cdc_operator.py:66-85`,
`maintenance/iceberg_{compaction,aging,snapshot}_operator.py`). This module
provides the same operator surface — constructor parameters, `execute()`
contract, returned summaries — over THIS engine, so a DAG written against
the reference re-targets by changing an import.

Deliberately dependency-light: if `airflow` is importable the classes
subclass `BaseOperator` (usable in a real DAG); otherwise they are plain
Python with the same `execute(context)` duck type — the scheduler is
deployment glue, not engine. Source data enters through either

- ``source`` — a DataFrame or a ``(spark) -> DataFrame`` callable (files,
  an existing view, a test fixture), or
- ``jdbc`` — a :class:`~etl_to_iceberg_spark.sources.jdbc.JdbcSource`
  (the parallel partitioned reader that replaces the reference's
  sequential pandas chunks).

Everything downstream (auto table creation, append/overwrite/merge,
cursor-tracked CDC, compaction/expiry/snapshot maintenance) is the
engine's managed-table layer — the operators orchestrate, they never
touch rows.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from etl_to_iceberg_spark.tables import Catalog

try:  # pragma: no cover - airflow is absent in the sandbox
    from airflow.models import BaseOperator as _Base
except Exception:  # noqa: BLE001

    class _Base:  # type: ignore[no-redef]
        """Duck-typed stand-in for airflow.models.BaseOperator."""

        def __init__(self, *args: Any, **kwargs: Any) -> None:
            self.task_id = kwargs.pop("task_id", self.__class__.__name__)


SourceArg = DataFrame | Callable[[SparkSession], DataFrame]


def _resolve_source(spark: SparkSession, source: SourceArg | None, jdbc) -> DataFrame:
    if source is not None and jdbc is not None:
        raise ValueError("pass either source or jdbc, not both")
    if source is None and jdbc is None:
        raise ValueError("one of source/jdbc is required")
    if jdbc is not None:
        return spark.read.format("jdbc").options(**jdbc.reader_options()).load()
    if callable(source):
        return source(spark)
    return source


class TableTransferOperator(_Base):
    """Full-table source → managed-table transfer (mirrors
    ``OracleToIcebergOperator``: column projection, WHERE pushdown,
    append/overwrite/merge modes, identity partitioning, auto-create).

    The reference's ``chunksize`` (client-side pandas batching) has no
    analogue because nothing is driver-materialized — parallelism comes
    from the source's partitioning (JDBC range predicates / file splits).
    ``write_engine`` is likewise dropped: there is exactly one engine.
    """

    # Jinja-templated by Airflow before execute() (mirrors the ref's
    # oracle_to_iceberg_operator.py:62-68: schema/table names + WHERE),
    # so DAGs can write table="employees_{{ ds_nodash }}" per README
    # usage. No-op outside Airflow — plain attributes.
    template_fields = ("namespace", "table", "where_clause")

    def __init__(
        self,
        *,
        spark: SparkSession,
        warehouse: str,
        source: SourceArg | None = None,
        jdbc=None,
        namespace: str = "default",
        table: str,
        columns: list[str] | None = None,
        where_clause: str | None = None,
        mode: str = "append",
        primary_key: list[str] | None = None,
        partition_by: list[str] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        if mode not in ("append", "overwrite", "merge"):
            raise ValueError(f"mode must be append|overwrite|merge, got {mode!r}")
        if mode == "merge" and not primary_key:
            raise ValueError("mode='merge' requires primary_key")
        self.spark = spark
        self.warehouse = warehouse
        self.source = source
        self.jdbc = jdbc
        self.namespace = namespace
        self.table = table
        self.columns = columns
        self.where_clause = where_clause
        self.mode = mode
        self.primary_key = primary_key
        self.partition_by = partition_by

    def execute(self, context: dict | None = None) -> dict:
        df = _resolve_source(self.spark, self.source, self.jdbc)
        if self.columns:
            df = df.select(*self.columns)
        if self.where_clause:
            df = df.where(self.where_clause)

        catalog = Catalog(self.spark, self.warehouse)
        catalog.create_namespace(self.namespace)
        identifier = f"{self.namespace}.{self.table}"
        target = catalog.table(identifier)
        if not target.exists():
            # auto-create ON the first batch (ref: the create-then-write of
            # oracle_to_iceberg_operator.py:209-244 collapsed to one commit)
            snap = target.create(df, partition_by=self.partition_by)
        elif self.mode == "append":
            snap = target.append(df)
        elif self.mode == "overwrite":
            snap = target.overwrite(df, partition_by=self.partition_by)
        else:
            snap = target.merge(df, keys=self.primary_key)
        return {
            "table": identifier,
            "mode": self.mode,
            "version": snap.version,
            "summary": dict(snap.summary),
        }


class TableCdcTransferOperator(_Base):
    """Incremental CDC sync (mirrors ``OracleToIcebergCDCOperator``:
    cdc_method timestamp|scn, cursor persisted in a metadata table,
    append/upsert modes keyed on primary_key).

    The cursor is DATA-DERIVED (max of the batch's cursor column), fixing
    the reference's wall-clock cursor bug (it stamps ``NOW`` even when the
    batch lags — `oracle_to_iceberg_cdc_operator.py` cursor update); an
    explicit ``last_timestamp``/``last_scn`` override resets the cursor,
    same as the reference's parameters."""

    # Mirrors oracle_to_iceberg_cdc_operator.py:56-63 (schema/table names
    # + cursor override + cursor column are Jinja-templatable).
    template_fields = (
        "source_schema",
        "source_table",
        "namespace",
        "table",
        "last_timestamp",
        "timestamp_column",
    )

    def __init__(
        self,
        *,
        spark: SparkSession,
        warehouse: str,
        source: SourceArg | None = None,
        jdbc=None,
        source_schema: str = "default",
        source_table: str,
        namespace: str = "default",
        table: str | None = None,
        cdc_method: str = "timestamp",
        timestamp_column: str | None = None,
        scn_column: str | None = None,
        last_timestamp: str | None = None,
        last_scn: int | None = None,
        mode: str = "upsert",
        primary_key: list[str] | None = None,
        metadata_table: str = "_system._cdc_metadata",
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        if cdc_method not in ("timestamp", "scn"):
            raise ValueError(f"cdc_method must be timestamp|scn, got {cdc_method!r}")
        if cdc_method == "timestamp" and not timestamp_column:
            raise ValueError("cdc_method='timestamp' requires timestamp_column")
        if cdc_method == "scn" and not scn_column:
            raise ValueError("cdc_method='scn' requires scn_column")
        self.spark = spark
        self.warehouse = warehouse
        self.source = source
        self.jdbc = jdbc
        self.source_schema = source_schema
        self.source_table = source_table
        self.namespace = namespace
        self.table = table or source_table
        self.cdc_method = cdc_method
        self.timestamp_column = timestamp_column
        self.scn_column = scn_column
        self.last_timestamp = last_timestamp
        self.last_scn = last_scn
        self.mode = mode
        self.primary_key = primary_key
        self.metadata_table = metadata_table

    def execute(self, context: dict | None = None) -> dict:
        from etl_to_iceberg_spark.operators.cdc import CdcPipeline, CursorStore

        catalog = Catalog(self.spark, self.warehouse)
        catalog.create_namespace(self.namespace)
        cursors = CursorStore(catalog, identifier=self.metadata_table)
        if self.last_timestamp is not None or self.last_scn is not None:
            from datetime import datetime

            ts = self.last_timestamp
            if isinstance(ts, str):
                ts = datetime.fromisoformat(ts)
            cursors.set(
                self.source_schema,
                self.source_table,
                last_timestamp=ts,
                last_scn=self.last_scn,
            )
        pipeline = CdcPipeline(
            catalog,
            source_schema=self.source_schema,
            source_table=self.source_table,
            target_identifier=f"{self.namespace}.{self.table}",
            ts_col=self.timestamp_column if self.cdc_method == "timestamp" else None,
            version_col=self.scn_column if self.cdc_method == "scn" else None,
            cursor_store=cursors,
        )
        df = _resolve_source(self.spark, self.source, self.jdbc)
        result = pipeline.run(df, mode=self.mode, primary_key=self.primary_key)
        return {
            "table": f"{self.namespace}.{self.table}",
            "rows": result.rows,
            "last_timestamp": str(result.new_last_timestamp)
            if result.new_last_timestamp is not None
            else None,
            "last_scn": result.new_last_scn,
        }


class TableCompactionOperator(_Base):
    """Small-file binpack compaction (mirrors
    ``IcebergCompactionOperator``: target file size, optional partition
    filter; `maintenance/iceberg_compaction_operator.py`)."""

    # Mirrors iceberg_compaction_operator.py:41-45 (minio_endpoint is
    # deployment config, excluded). The identifier is built in execute()
    # — template rendering happens between __init__ and execute.
    template_fields = ("namespace", "table")

    def __init__(
        self,
        *,
        spark: SparkSession,
        warehouse: str,
        namespace: str = "default",
        table: str,
        target_file_size_mb: int = 512,
        strategy: str = "binpack",
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.spark = spark
        self.warehouse = warehouse
        self.namespace = namespace
        self.table = table
        self.target_file_size_mb = target_file_size_mb
        self.strategy = strategy

    @property
    def identifier(self) -> str:
        return f"{self.namespace}.{self.table}"

    def execute(self, context: dict | None = None) -> dict:
        from etl_to_iceberg_spark.tables import maintenance

        table = Catalog(self.spark, self.warehouse).table(self.identifier)
        snap = maintenance.compact(
            table,
            target_file_size_mb=self.target_file_size_mb,
            strategy=self.strategy,
        )
        return {"table": self.identifier, "version": snap.version,
                "summary": dict(snap.summary)}


class TableAgingOperator(_Base):
    """Snapshot expiry + orphan GC (mirrors ``IcebergAgingOperator``:
    retain-last / older-than horizon;
    `maintenance/iceberg_aging_operator.py:188-191`)."""

    # Mirrors iceberg_aging_operator.py:44-50 (namespace/table/horizon
    # knobs; minio_endpoint excluded as deployment config). Numeric
    # fields are int()-coerced in execute: Jinja renders strings unless
    # the DAG opts into render_template_as_native_obj.
    template_fields = ("namespace", "table", "retain_last", "older_than_ms")

    def __init__(
        self,
        *,
        spark: SparkSession,
        warehouse: str,
        namespace: str = "default",
        table: str,
        retain_last: int = 1,
        older_than_ms: int | None = None,
        remove_orphans: bool = False,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.spark = spark
        self.warehouse = warehouse
        self.namespace = namespace
        self.table = table
        self.retain_last = retain_last
        self.older_than_ms = older_than_ms
        self.remove_orphans = remove_orphans

    @property
    def identifier(self) -> str:
        return f"{self.namespace}.{self.table}"

    def execute(self, context: dict | None = None) -> dict:
        from etl_to_iceberg_spark.tables import maintenance

        table = Catalog(self.spark, self.warehouse).table(self.identifier)
        expired = maintenance.expire_snapshots(
            table,
            retain_last=int(self.retain_last),
            older_than_ms=None if self.older_than_ms is None
            else int(self.older_than_ms),
        )
        out = {"table": self.identifier, "expired": expired}
        if self.remove_orphans:
            # Crashed-writer leftovers, beyond what snapshot expiry GCs
            # (those are files no snapshot EVER referenced).
            out["orphans_removed"] = maintenance.remove_orphan_files(table).count()
        return out


class TableSnapshotOperator(_Base):
    """Snapshot listing / creation / rollback (mirrors
    ``IcebergSnapshotOperator`` actions;
    `maintenance/iceberg_snapshot_operator.py:130-187`)."""

    # Mirrors iceberg_snapshot_operator.py:34-39 (action + snapshot id
    # are templatable, e.g. rollback to an XCom-published version).
    # Constructor validation skips values that still contain Jinja
    # markers; execute() re-validates the rendered value.
    template_fields = ("namespace", "table", "action", "version")

    def __init__(
        self,
        *,
        spark: SparkSession,
        warehouse: str,
        namespace: str = "default",
        table: str,
        action: str = "list",
        version: int | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        if "{{" not in action:
            self._validate(action, version)
        self.spark = spark
        self.warehouse = warehouse
        self.namespace = namespace
        self.table = table
        self.action = action
        self.version = version

    @staticmethod
    def _validate(action: str, version) -> None:
        if action not in ("list", "create", "rollback", "cherrypick"):
            raise ValueError(f"unknown snapshot action {action!r}")
        if action in ("rollback", "cherrypick") and version is None:
            raise ValueError(f"action={action!r} requires version")

    @property
    def identifier(self) -> str:
        return f"{self.namespace}.{self.table}"

    def execute(self, context: dict | None = None) -> dict | list[dict]:
        from etl_to_iceberg_spark.tables import maintenance

        self._validate(self.action, self.version)
        table = Catalog(self.spark, self.warehouse).table(self.identifier)
        if self.action == "list":
            return [r.asDict() for r in maintenance.snapshot_list(table).collect()]
        if self.action == "create":
            # snapshots are created by writes (ref:
            # iceberg_snapshot_operator.py:117-128); report the current one
            return [
                r.asDict()
                for r in maintenance.current_snapshot_info(table).collect()
            ]
        if self.action == "rollback":
            snap = maintenance.rollback(table, int(self.version))
        else:
            snap = maintenance.cherrypick(table, int(self.version))
        return {"table": self.identifier, "version": snap.version,
                "summary": dict(snap.summary)}
