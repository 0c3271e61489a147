"""Scalar function library (JVM-side column expressions only).

Re-expresses the reference's scattered scalar logic (SURVEY.md §2.7) as
reusable Column builders. Everything here compiles to Catalyst expressions
inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# --- deterministic aggregation helpers -----------------------------------


def exact_sum(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Order-independent sum of a double column.

    ``SUM(double)`` depends on partition/accumulation order (IEEE addition
    is not associative), so two engines — or two runs at different
    parallelism — can disagree in the low bits. Casting to DECIMAL first
    makes the sum exact and order-independent; the final cast back to
    DOUBLE is then bit-identical everywhere. This is the engine-wide
    pattern for checkable double aggregates.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum, then one double divide."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, precision, scale) / F.count(F.lit(1))


def sql_exact_sum(expr: str, precision: int = 18, scale: int = 6) -> str:
    """DuckDB-side mirror of :func:`exact_sum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_exact_avg(expr: str, precision: int = 18, scale: int = 6) -> str:
    return f"{sql_exact_sum(expr, precision, scale)} / COUNT(*)"


# --- reference scalar surface (SURVEY §2.7) ------------------------------


def ts_format(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Timestamp→string (ref: ``fn_ts_format``, TO_TIMESTAMP/strftime usage)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def epoch_ms(col: Column | str) -> Column:
    """Timestamp→epoch milliseconds (ref: ``fn_epoch_ms``,
    ``hdfs_to_iceberg_cdc_operator.py:293``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c)


def from_epoch_ms(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c)


def path_partition_value(path_col: Column | str, key: str) -> Column:
    """Extract ``key=value`` from a path string (ref: ``fn_path_parse``,
    ``hdfs_to_iceberg_operator.py:84-101``)."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    return F.regexp_extract(c, f"{key}=([^/]+)", 1)


def json_get(col: Column | str, path: str) -> Column:
    """Extract a field from a JSON string column (events.props)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)
