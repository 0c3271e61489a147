"""Source→Spark type mapping.

Re-expresses the reference's Oracle→Iceberg type converter
(``/root/reference/airflow-plugins/utils/type_converter.py:6-42``) and schema
builder (``utils/schema_builder.py:25-43``) on Spark's type system.

Two fidelity modes:

- ``number_as_long=True`` reproduces the reference exactly: every Oracle
  ``NUMBER`` becomes ``LongType`` regardless of precision/scale
  (``type_converter.py:16`` — lossy for ``NUMBER(p, s>0)``).
- ``number_as_long=False`` (default) maps ``NUMBER(p,s)`` with ``s>0`` to
  ``DecimalType(p, s)`` and integral ``NUMBER(p)`` to Long/Int as fits —
  the behavior a faithful engine should have.

Parameterized types are normalized by truncating at ``(`` just like the
reference (``type_converter.py:33``), but precision/scale are parsed first
rather than discarded.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass

from pyspark.sql import types as T

log = logging.getLogger(__name__)

_PARAM_RE = re.compile(r"^\s*([A-Z0-9_ ]+?)\s*(?:\(\s*(\d+)\s*(?:,\s*(-?\d+)\s*)?\))?\s*$")

# Base mapping mirroring type_converter.py:15-31 (NUMBER handled separately).
_SIMPLE: dict[str, T.DataType] = {
    "FLOAT": T.DoubleType(),
    "BINARY_FLOAT": T.FloatType(),
    "BINARY_DOUBLE": T.DoubleType(),
    "VARCHAR2": T.StringType(),
    "CHAR": T.StringType(),
    "NCHAR": T.StringType(),
    "NVARCHAR2": T.StringType(),
    "CLOB": T.StringType(),
    "NCLOB": T.StringType(),
    "LONG": T.StringType(),  # Oracle LONG is a text type
    "DATE": T.TimestampType(),  # Oracle DATE carries time-of-day
    "TIMESTAMP": T.TimestampType(),
    "TIMESTAMP WITH TIME ZONE": T.TimestampType(),  # Spark TS is tz-aware UTC
    "TIMESTAMP WITH LOCAL TIME ZONE": T.TimestampType(),
    "RAW": T.BinaryType(),
    "LONG RAW": T.BinaryType(),
    "BLOB": T.BinaryType(),
}


@dataclass(frozen=True)
class SourceColumn:
    """One column of source metadata, as the reference introspects it from
    ``all_tab_columns`` (``oracle_to_iceberg/hooks.py:79-105``)."""

    name: str
    data_type: str
    precision: int | None = None
    scale: int | None = None
    nullable: bool = True


def oracle_type_to_spark(
    oracle_type: str,
    precision: int | None = None,
    scale: int | None = None,
    *,
    number_as_long: bool = False,
) -> T.DataType:
    """Map an Oracle type name (possibly parameterized, e.g. ``NUMBER(10,2)``
    or ``VARCHAR2(100)``) to a Spark ``DataType``.

    Unknown types fall back to ``StringType`` with a warning, matching
    ``type_converter.py:36-40`` (tested by the reference at
    ``tests/utils/test_type_converter.py:66-69``).
    """
    m = _PARAM_RE.match(oracle_type.upper())
    if not m:
        log.warning("Unmappable type %r -> StringType", oracle_type)
        return T.StringType()
    base = m.group(1).strip()
    if m.group(2) is not None and precision is None:
        precision = int(m.group(2))
    if m.group(3) is not None and scale is None:
        scale = int(m.group(3))

    # TIMESTAMP(6) / TIMESTAMP(9) WITH TIME ZONE → strip fractional precision.
    ts = re.match(r"^TIMESTAMP(?:\s*\(\d\))?(.*)$", base)
    if base.startswith("TIMESTAMP"):
        suffix = ts.group(1).strip() if ts else ""
        base = ("TIMESTAMP " + suffix).strip() if suffix else "TIMESTAMP"

    if base == "NUMBER":
        if number_as_long:
            return T.LongType()  # reference-compat: type_converter.py:16
        if scale is not None and scale > 0:
            p = min(precision or 38, 38)
            return T.DecimalType(p, min(scale, p))
        if precision is not None and precision <= 9:
            return T.IntegerType()
        if precision is not None and precision <= 18:
            return T.LongType()
        if precision is None:
            # Unbounded NUMBER: Decimal(38,10) keeps fractional values.
            return T.DecimalType(38, 10)
        return T.DecimalType(min(precision, 38), 0)

    if base in _SIMPLE:
        return _SIMPLE[base]

    log.warning("Unknown source type %r -> StringType fallback", oracle_type)
    return T.StringType()


def build_schema(
    columns: list[SourceColumn], *, number_as_long: bool = False
) -> T.StructType:
    """Build a Spark schema from introspected source columns.

    Column names are lower-cased and nullability preserved, mirroring the
    reference's schema builder (``schema_builder.py:25-43``).
    """
    fields = [
        T.StructField(
            c.name.lower(),
            oracle_type_to_spark(
                c.data_type, c.precision, c.scale, number_as_long=number_as_long
            ),
            nullable=c.nullable,
        )
        for c in columns
    ]
    return T.StructType(fields)


def customSchema_for_jdbc(
    columns: list[SourceColumn], *, number_as_long: bool = False
) -> str:
    """Render the mapping as a Spark JDBC ``customSchema`` option string so
    the cast happens inside the JDBC reader (no per-row Python)."""
    schema = build_schema(columns, number_as_long=number_as_long)
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
