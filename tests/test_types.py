"""Table-driven tests for the source→Spark type mapping.

Mirrors the reference's test style and cases
(``/root/reference/tests/utils/test_type_converter.py:10-69``): plain
types, parameterized types, unknown-type fallback — plus the faithful
NUMBER(p,s)→Decimal mode the reference lacks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_to_iceberg_spark.types import (
    SourceColumn,
    build_schema,
    customSchema_for_jdbc,
    oracle_type_to_spark,
)

# Reference-compat mode: every NUMBER → Long (type_converter.py:16).
COMPAT_CASES = [
    ("NUMBER", T.LongType()),
    ("NUMBER(10)", T.LongType()),
    ("NUMBER(10,2)", T.LongType()),
    ("FLOAT", T.DoubleType()),
    ("BINARY_FLOAT", T.FloatType()),
    ("BINARY_DOUBLE", T.DoubleType()),
    ("VARCHAR2(100)", T.StringType()),
    ("CHAR(10)", T.StringType()),
    ("NCHAR(10)", T.StringType()),
    ("NVARCHAR2(50)", T.StringType()),
    ("CLOB", T.StringType()),
    ("NCLOB", T.StringType()),
    ("DATE", T.TimestampType()),
    ("TIMESTAMP", T.TimestampType()),
    ("TIMESTAMP(6)", T.TimestampType()),
    ("TIMESTAMP WITH TIME ZONE", T.TimestampType()),
    ("RAW(16)", T.BinaryType()),
    ("BLOB", T.BinaryType()),
]


@pytest.mark.parametrize("oracle_type,expected", COMPAT_CASES)
def test_compat_mapping(oracle_type, expected):
    assert oracle_type_to_spark(oracle_type, number_as_long=True) == expected


# Faithful mode: precision/scale respected.
FAITHFUL_CASES = [
    ("NUMBER(10,2)", T.DecimalType(10, 2)),
    ("NUMBER(38,10)", T.DecimalType(38, 10)),
    ("NUMBER(5)", T.IntegerType()),
    ("NUMBER(9)", T.IntegerType()),
    ("NUMBER(10)", T.LongType()),
    ("NUMBER(18)", T.LongType()),
    ("NUMBER(19)", T.DecimalType(19, 0)),
    ("NUMBER", T.DecimalType(38, 10)),
]


@pytest.mark.parametrize("oracle_type,expected", FAITHFUL_CASES)
def test_faithful_mapping(oracle_type, expected):
    assert oracle_type_to_spark(oracle_type) == expected


def test_unknown_type_falls_back_to_string():
    # ref: tests/utils/test_type_converter.py:66-69
    assert oracle_type_to_spark("SDO_GEOMETRY") == T.StringType()
    assert oracle_type_to_spark("XMLTYPE") == T.StringType()


def test_explicit_precision_scale_args_beat_parse():
    assert oracle_type_to_spark("NUMBER", 12, 3) == T.DecimalType(12, 3)


def test_build_schema_lowercases_and_keeps_nullability():
    cols = [
        SourceColumn("ID", "NUMBER(10)", nullable=False),
        SourceColumn("NAME", "VARCHAR2(100)"),
        SourceColumn("CREATED_AT", "TIMESTAMP(6)"),
    ]
    schema = build_schema(cols)
    assert [f.name for f in schema.fields] == ["id", "name", "created_at"]
    assert schema.fields[0].dataType == T.LongType()
    assert schema.fields[0].nullable is False
    assert schema.fields[1].nullable is True


def test_custom_schema_string():
    cols = [SourceColumn("ID", "NUMBER(10)"), SourceColumn("V", "NUMBER(10,2)")]
    s = customSchema_for_jdbc(cols)
    assert s == "id bigint, v decimal(10,2)"
