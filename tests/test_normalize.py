"""Tests for the normalization pass (ref: utils/dataframe_utils.py:5-27)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_to_iceberg_spark.normalize import (
    infer_timestamps,
    lower_names,
    nan_to_null,
    prepare_dataframe,
)


def test_lower_names(spark):
    df = spark.createDataFrame([(1, "a")], "ID int, NAME string")
    assert lower_names(df).columns == ["id", "name"]


def test_nan_to_null(spark):
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 1.5), (3, None)], "id int, v double"
    )
    out = nan_to_null(df).orderBy("id").collect()
    assert out[0].v is None
    assert out[1].v == 1.5
    assert out[2].v is None


def test_nan_to_null_noop_on_non_float(spark):
    df = spark.createDataFrame([(1, "x")], "id int, s string")
    assert nan_to_null(df) is df  # no projection inserted


def test_infer_timestamps_promotes_fully_parsable(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-06-30",), (None,)], "ts string"
    )
    out = infer_timestamps(df)
    assert out.schema["ts"].dataType.typeName().startswith("timestamp")
    vals = [r.ts for r in out.orderBy("ts").collect()]
    assert vals[0] is None and vals[1] is not None


def test_infer_timestamps_keeps_mixed_column_as_string(spark):
    df = spark.createDataFrame([("2024-01-01",), ("not a date",)], "ts string")
    out = infer_timestamps(df)
    assert out.schema["ts"].dataType.typeName() == "string"
    assert out is df


def test_prepare_dataframe_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, float("nan"), "2024-01-01")], "ID int, V double, TS string"
    ).select(F.col("ID"), F.col("V"), F.col("TS"))
    out = prepare_dataframe(df, infer_ts=True)
    assert out.columns == ["id", "v", "ts"]
    row = out.collect()[0]
    assert row.v is None
    assert row.ts is not None and not isinstance(row.ts, str)
