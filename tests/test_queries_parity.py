"""Every registered query with an oracle must match DuckDB exactly.

This mirrors the driver's t2 correctness gate locally (at sf0.001 by
default; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full
check).
"""

from __future__ import annotations

import pytest

from etl_to_iceberg_spark.registry import all_specs

from tests.parity import compare

_SPECS = all_specs()
_WITH_SQL = sorted(name for name, s in _SPECS.items() if s.sql is not None)
_ROWS_ONLY = sorted(name for name, s in _SPECS.items() if s.sql is None)


@pytest.mark.parametrize("name", _WITH_SQL)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = _SPECS[name]
    df = spec.fn(spark, sf_dir)
    compare(df, duck, spec.sql)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = _SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 10
