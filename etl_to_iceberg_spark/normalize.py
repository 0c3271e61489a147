"""DataFrame normalization pass.

Re-expresses the reference's ``prepare_dataframe``
(``/root/reference/airflow-plugins/utils/dataframe_utils.py:5-27``) —
lower-case column names, NaN→NULL, opportunistic string→timestamp parsing —
as a declarative, JVM-side Spark transform:

- Name lower-casing is metadata-only (no shuffle, no scan cost).
- NaN→NULL uses ``nanvl``-style expressions on float/double columns only
  (Spark already distinguishes NaN from NULL; the reference needed this
  because of its pandas hop).
- Timestamp inference is **deterministic and schema-driven**: instead of the
  reference's try/except ``pd.to_datetime`` per column (row-content
  dependent, ``dataframe_utils.py:19-25``), we parse string columns with
  ``try_to_timestamp`` and keep the parse only if every non-null value
  parses — decided per column from data via one aggregate, then applied as a
  plain cast. At scale this is one extra pass you opt into, not silent
  per-row drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

# Formats the reference's pandas `to_datetime` accepted implicitly; we make
# the accepted set explicit. First match wins.
_TS_FORMATS = [
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
]


def lower_names(df: DataFrame) -> DataFrame:
    """Lower-case all column names (ref: ``dataframe_utils.py:13``)."""
    return df.toDF(*[c.lower() for c in df.columns])


def nan_to_null(df: DataFrame) -> DataFrame:
    """Replace NaN with NULL in float/double columns
    (ref: ``dataframe_utils.py:16``)."""
    exprs: list[Column] = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            exprs.append(
                F.when(F.isnan(F.col(f.name)), F.lit(None)).otherwise(F.col(f.name)).alias(f.name)
            )
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


def _try_ts(col: Column) -> Column:
    """Best-effort timestamp parse over the accepted format list."""
    parsed = F.try_to_timestamp(col)
    for fmt in _TS_FORMATS:
        parsed = F.coalesce(parsed, F.try_to_timestamp(col, F.lit(fmt)))
    return parsed


def infer_timestamps(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Promote string columns that fully parse as timestamps.

    A column is promoted only when it has ≥1 non-null value and zero parse
    failures — computed in ONE aggregate pass over the candidate columns
    (the reference decides per-column via pandas try/except,
    ``dataframe_utils.py:19-25``).
    """
    candidates = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
        and (columns is None or f.name in columns)
    ]
    if not candidates:
        return df

    aggs = []
    for c in candidates:
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
        aggs.append(
            F.count(F.when(F.col(c).isNotNull() & _try_ts(F.col(c)).isNull(), 1)).alias(
                f"__bad_{c}"
            )
        )
    stats = df.agg(*aggs).collect()[0]

    promote = [c for c in candidates if stats[f"__n_{c}"] > 0 and stats[f"__bad_{c}"] == 0]
    if not promote:
        return df
    return df.select(
        *[
            _try_ts(F.col(c)).alias(c) if c in promote else F.col(c)
            for c in df.columns
        ]
    )


def prepare_dataframe(
    df: DataFrame, *, infer_ts: bool = False, ts_columns: list[str] | None = None
) -> DataFrame:
    """Full normalization pass (ref: ``dataframe_utils.py:5-27``).

    Timestamp inference is opt-in (`infer_ts=True`) because it costs an extra
    aggregate scan and the reference's implicit behavior is a footgun at
    100 TB; explicit ``ts_columns`` limits the scan to named columns.
    """
    out = nan_to_null(lower_names(df))
    if infer_ts:
        out = infer_timestamps(out, ts_columns)
    return out
