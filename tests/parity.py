"""Spark-vs-DuckDB parity comparison used by the test suite.

Approximates the driver's check: row count + column names + value
equality, order-insensitive (rows sorted by their full value tuple,
columns sorted by name). Floats are compared EXACTLY — the engine's
determinism discipline (exact-decimal sums, literal time anchors,
unique-key tie-breaks) is supposed to make results bit-identical; any
mismatch is a real defect, not noise to tolerate.
"""

from __future__ import annotations

import datetime as _dt
import math


def _norm_cell(v):
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.timedelta):
        return str(v)
    if hasattr(v, "as_py"):  # pyarrow scalar
        return _norm_cell(v.as_py())
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(str(_norm_cell(x)) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except ImportError:  # pragma: no cover
        pass
    return v


def _normalize(rows: list[tuple], names: list[str]) -> list[tuple]:
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def compare(spark_df, duck_con, sql: str) -> None:
    """Assert the Spark result matches the DuckDB oracle."""
    s_names = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = duck_con.execute(sql)
    d_names = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_names) == sorted(d_names), (
        f"column mismatch: spark={sorted(s_names)} duckdb={sorted(d_names)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    s_norm = _normalize(s_rows, s_names)
    d_norm = _normalize(d_rows, d_names)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"row {i} differs:\n  spark : {a}\n  duckdb: {b}"
