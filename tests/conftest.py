"""Shared test fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Pin the import-time oracle sidecar paths to the SF this test session
# compares at (sidecars.py module docstring) — must be set before any
# etl_to_iceberg_spark.ext module is imported.
os.environ.setdefault("E2IS_ORACLE_SF_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    from etl_to_iceberg_spark.session import SessionConfig, get_spark

    spark = get_spark(
        SessionConfig(
            app_name="etl-to-iceberg-spark-tests",
            local_cores=8,
            shuffle_partitions=8,
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    mirroring the driver's oracle environment."""
    import duckdb

    from etl_to_iceberg_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()
