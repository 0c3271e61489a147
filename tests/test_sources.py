"""File-source reader behaviors (sources/files.py)."""

from __future__ import annotations

import os


def test_read_files_recursive_finds_nested_non_hive_files(spark, tmp_path):
    """recursive=True must actually enable recursiveFileLookup: files under
    arbitrary (non key=value) subdirectories are included. Regression: the
    flag was wired to the string "false", silently omitting nested files."""
    from etl_to_iceberg_spark.sources.files import read_parquet

    df = spark.range(5).toDF("id")
    df.write.mode("overwrite").parquet(str(tmp_path / "root" / "batch1"))
    df.write.mode("overwrite").parquet(str(tmp_path / "root" / "batch2"))
    out = read_parquet(spark, str(tmp_path / "root"), recursive=True)
    assert out.count() == 10


def test_read_files_partition_filter_keeps_hive_discovery(spark, tmp_path):
    """With a partition_filter, Hive partition discovery stays on (the
    recursiveFileLookup option would disable it) and pruning applies."""
    from etl_to_iceberg_spark.sources.files import read_parquet

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, part string"
    )
    df.write.mode("overwrite").partitionBy("part").parquet(str(tmp_path / "pt"))
    out = read_parquet(
        spark, str(tmp_path / "pt"), partition_filter="part = 'a'"
    )
    assert out.count() == 2
    assert "part" in out.columns
