"""Warehouse catalog: namespace/table addressing over the snapshot format.

Mirrors the reference's catalog manager surface
(``/root/reference/airflow-plugins/utils/catalog_manager.py:29-69``):
load-or-create namespace, load-or-create table, identity partition specs —
addressed as ``namespace.table`` under one warehouse root. With the Iceberg
runtime jar present, prefer Spark's ``ice`` catalog (session.py) and plain
SQL DDL; this class is the jar-less equivalent plus the hermetic test path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_to_iceberg_spark.tables.format import IceTable


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)

    def _split(self, identifier: str) -> tuple[str, str]:
        parts = identifier.split(".")
        if len(parts) == 1:
            return "default", parts[0]
        if len(parts) == 2:
            return parts[0], parts[1]
        raise ValueError(f"identifier must be [namespace.]table, got {identifier!r}")

    # -- namespaces (ref: catalog_manager.py:41-54) ------------------------

    def create_namespace(self, namespace: str) -> None:
        os.makedirs(os.path.join(self.warehouse, namespace), exist_ok=True)

    def list_namespaces(self) -> list[str]:
        if not os.path.isdir(self.warehouse):
            return []
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def list_tables(self, namespace: str) -> list[str]:
        ns_dir = os.path.join(self.warehouse, namespace)
        if not os.path.isdir(ns_dir):
            return []
        return sorted(
            d
            for d in os.listdir(ns_dir)
            if os.path.exists(os.path.join(ns_dir, d, "_meta", "version-hint.txt"))
        )

    # -- SQL surface -------------------------------------------------------

    def register_views(self, namespace: str) -> list[str]:
        """Expose every table in ``namespace`` as a Spark temp view named
        ``<namespace>_<table>`` and return the view names — the SQL entry
        point for users migrating DAGs that query by table name. (With the
        Iceberg jar, the ``ice`` catalog makes the dotted names first-class
        in SQL; temp views are the jar-less equivalent.)"""
        names = []
        for t in self.list_tables(namespace):
            vname = f"{namespace}_{t}"
            self.table(f"{namespace}.{t}").read().createOrReplaceTempView(vname)
            names.append(vname)
        return names

    def sql(self, query: str) -> DataFrame:
        """Run SQL over previously registered managed-table views."""
        return self.spark.sql(query)

    # -- tables ------------------------------------------------------------

    def table(self, identifier: str) -> IceTable:
        ns, name = self._split(identifier)
        self.create_namespace(ns)
        return IceTable(self.spark, os.path.join(self.warehouse, ns, name))

    def table_exists(self, identifier: str) -> bool:
        ns, name = self._split(identifier)
        return IceTable(
            self.spark, os.path.join(self.warehouse, ns, name)
        ).exists()

    def create_table(
        self,
        identifier: str,
        schema: T.StructType,
        partition_by: list[str] | None = None,
    ) -> IceTable:
        """CREATE TABLE IF NOT EXISTS with explicit schema + identity
        partition spec (ref: catalog_manager.py:57-69 builds identity
        PartitionFields; days/bucket transforms are a config extension)."""
        return self.table(identifier).get_or_create(schema, partition_by)

    def drop_table(self, identifier: str) -> None:
        ns, name = self._split(identifier)
        path = os.path.join(self.warehouse, ns, name)
        if os.path.isdir(path):
            shutil.rmtree(path)

    @staticmethod
    def _is_crashed_table_dir(path: str) -> bool:
        """True iff ``path`` looks like a TABLE directory whose writer
        crashed before the first commit (no version-hint, but table-format
        artifacts present). Identification is positive — the format's own
        ``data/v<N>-<token>`` commit-dir naming (format.py::_write_data)
        or staged ``_meta/snap-*.json`` manifests — never just "has a
        child named data/ or _meta/", which a user-managed control-plane
        store may legitimately use for its own payload."""
        import glob
        import re

        data = os.path.join(path, "data")
        if os.path.isdir(data) and any(
            re.fullmatch(r"v\d+-[0-9a-f]{8}", d) for d in os.listdir(data)
        ):
            return True
        return bool(glob.glob(os.path.join(path, "_meta", "snap-*.json")))

    def shallow_clone(self, dst_warehouse: str) -> "Catalog":
        """Delta-style SHALLOW CLONE of the whole warehouse: copy only the
        ``_meta`` manifests (KBs); data files stay where they are and are
        referenced absolutely by the cloned manifests. Snapshots are
        immutable — writes to the clone only ever ADD files under the
        clone's own location — and destructive maintenance
        (:func:`~etl_to_iceberg_spark.tables.maintenance.expire_snapshots`,
        ``remove_orphan_files``) deletes only files under the mutated
        table's own location, so the source is never perturbed, however
        the clone is mutated. O(metadata) regardless of table size: the
        cheap writable fork for tests, benchmarks, and what-if pipelines.

        Control-plane state rides along too: any non-table directory in a
        namespace (e.g. the ``_system._cdc_metadata`` cursor store —
        metadata-sized JSON, not snapshot-managed) is copied whole, so a
        cloned pipeline resumes from the same cursor the source was at.

        The source warehouse must outlive the clone (same lifetime rule
        as Delta/Iceberg shallow clones)."""
        dst = os.path.abspath(dst_warehouse)
        for ns in self.list_namespaces():
            ns_dir = os.path.join(self.warehouse, ns)
            tables = set(self.list_tables(ns))
            for child in sorted(os.listdir(ns_dir)):
                src_child = os.path.join(ns_dir, child)
                if not os.path.isdir(src_child):
                    continue
                if child in tables:
                    shutil.copytree(
                        os.path.join(src_child, "_meta"),
                        os.path.join(dst, ns, child, "_meta"),
                        dirs_exist_ok=True,
                    )
                elif self._is_crashed_table_dir(src_child):
                    # A table directory without a committed version-hint: a
                    # writer crashed after staging data/ but before its first
                    # commit. It is invisible to the catalog (list_tables) and
                    # holds data-plane bytes, so deep-copying it would break
                    # the O(metadata) contract — the clone must not carry
                    # uncommitted state anyway. Skip it. (Detection is
                    # POSITIVE — the table format's own v<N>-<token> commit
                    # dirs or snap-*.json manifests — so a user control-plane
                    # dir that merely CONTAINS a child named data/ or _meta/
                    # is not silently dropped from the clone.)
                    continue
                else:
                    # control-plane dir (cursor store, state tables' kin):
                    # metadata-sized by construction — copy in full.
                    shutil.copytree(
                        src_child,
                        os.path.join(dst, ns, child),
                        dirs_exist_ok=True,
                    )
        return Catalog(self.spark, dst)
