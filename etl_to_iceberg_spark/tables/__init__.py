"""Managed tables: snapshot-log-over-Parquet with Iceberg-equivalent semantics.

Append / overwrite / MERGE upsert / DELETE / time travel / incremental read /
rollback / cherry-pick / compaction / snapshot expiry — see
:mod:`etl_to_iceberg_spark.tables.format` for the design.
"""

from etl_to_iceberg_spark.tables.catalog import Catalog
from etl_to_iceberg_spark.tables.format import FileEntry, IceTable, Snapshot
from etl_to_iceberg_spark.tables import maintenance

__all__ = ["Catalog", "IceTable", "Snapshot", "FileEntry", "maintenance"]
