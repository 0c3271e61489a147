"""Data sources: file datasets (parquet/ORC/CSV/JSON), JDBC, managed tables."""

from etl_to_iceberg_spark.sources.files import (
    read_files,
    read_parquet,
    read_orc,
    file_metadata,
    list_data_files,
)
from etl_to_iceberg_spark.sources.jdbc import JdbcSource, read_jdbc_table

__all__ = [
    "read_files",
    "read_parquet",
    "read_orc",
    "file_metadata",
    "list_data_files",
    "JdbcSource",
    "read_jdbc_table",
]
