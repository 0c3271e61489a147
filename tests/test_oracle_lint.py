"""Determinism lint over every registered DuckDB oracle.

The driver hashes oracle results through pandas. Two output-type classes
are known to break that hash even when values are identical:

- ``HUGEINT`` (DuckDB's 128-bit result of ``SUM(integer)``) — pandas has
  no int128, so it lands as float64 and hashes ``1085.0`` against Spark's
  ``1085`` (r3 failures ``q12_priority_by_flag``, ``sessionize_events``).
- ``LIST``/``STRUCT``/``MAP`` columns — the driver's canonicalizer
  crashed on arrays in r2 (``agg_collect_ordered``); nested output must
  be serialized (``concat_ws``/``to_json``) on both sides instead.

This lint runs ``DESCRIBE <oracle>`` through DuckDB for every spec so
the whole class is caught at test time, not in a driver round.
"""

from __future__ import annotations

import pytest

from etl_to_iceberg_spark.registry import all_specs

_BANNED = ("HUGEINT", "UHUGEINT", "STRUCT", "MAP")

# The sidecar oracles (dedup_simhash, dedup_minhash_lsh, ...) read a
# parquet the QUERY writes before its oracle runs; DESCRIBE here runs
# without the query, so seed each path with one schema-correct row if
# it's absent. Paths come from sidecars.oracle_sidecar_path — the same
# call the oracle SQL f-strings embed at import.
from etl_to_iceberg_spark.ext.corpus_queries import (
    _IVF2L_PARAMS,
    _IVF2L_Q_PARAMS,
    _IVFK_PARAMS,
    _IVFK_V2_PARAMS,
    _PQ_PARAMS,
    _PQ_RES2L_PARAMS,
    _PQ_RES_PARAMS,
    _SEMDECON_IDX_PARAMS,
)
from etl_to_iceberg_spark.ext.incremental_queries import _MH_TICK_PARAMS
from etl_to_iceberg_spark.ext.queries import _MINHASH_PARAMS, _SIMHASH_PARAMS
from etl_to_iceberg_spark.sidecars import oracle_sidecar_path

_SIDECAR_SEEDS = {
    oracle_sidecar_path("simhash_sigs", _SIMHASH_PARAMS): (
        "SELECT CAST(0 AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS simhash"
    ),
    oracle_sidecar_path("minhash_sidecar", _MINHASH_PARAMS): (
        "SELECT CAST(0 AS BIGINT) AS doc_id, CAST('' AS VARCHAR) AS fp, "
        "CAST([0] AS BIGINT[]) AS band_hashes"
    ),
    oracle_sidecar_path("ivfk_centroids", _IVFK_PARAMS): (
        'SELECT CAST(0 AS INT) AS cell, CAST([0.0] AS DOUBLE[]) AS "__cent"'
    ),
    oracle_sidecar_path("ivfk_centroids_v2", _IVFK_V2_PARAMS): (
        'SELECT CAST(0 AS INT) AS cell, CAST([0.0] AS DOUBLE[]) AS "__cent"'
    ),
    oracle_sidecar_path("pq_codebooks", _PQ_PARAMS): (
        "SELECT CAST(0 AS INT) AS m, CAST(0 AS INT) AS code, "
        "CAST([0.0] AS DOUBLE[]) AS cent"
    ),
    oracle_sidecar_path("pq_codebooks", _PQ_RES_PARAMS): (
        "SELECT CAST(0 AS INT) AS m, CAST(0 AS INT) AS code, "
        "CAST([0.0] AS DOUBLE[]) AS cent"
    ),
    oracle_sidecar_path("pq_codebooks", _PQ_RES2L_PARAMS): (
        "SELECT CAST(0 AS INT) AS m, CAST(0 AS INT) AS code, "
        "CAST([0.0] AS DOUBLE[]) AS cent"
    ),
    oracle_sidecar_path("ivfk_centroids", _IVF2L_Q_PARAMS): (
        'SELECT CAST(0 AS INT) AS cell, CAST([0.0] AS DOUBLE[]) AS "__cent"'
    ),
    oracle_sidecar_path("ivf2l_assign", _IVF2L_PARAMS): (
        "SELECT CAST('c' AS VARCHAR) AS side, CAST(0 AS BIGINT) AS id, "
        "CAST(0 AS INT) AS cell"
    ),
    oracle_sidecar_path("mh_tick_sigs", _MH_TICK_PARAMS): (
        "SELECT CAST(0 AS BIGINT) AS doc_id, CAST([0] AS BIGINT[]) AS sig, "
        "CAST([0] AS BIGINT[]) AS band_hashes"
    ),
    oracle_sidecar_path("semdecon_eval_index", _SEMDECON_IDX_PARAMS): (
        "SELECT CAST(0 AS BIGINT) AS eval_id, CAST(0 AS INT) AS cell, "
        "CAST([0.0] AS DOUBLE[]) AS embedding"
    ),
}


@pytest.fixture(scope="module", autouse=True)
def _seed_sidecars(duck):
    import glob
    import os

    for path, sel in _SIDECAR_SEEDS.items():
        if not glob.glob(os.path.join(path, "*.parquet")):
            os.makedirs(path, exist_ok=True)
            duck.execute(
                f"COPY ({sel}) TO '{os.path.join(path, '_lint_seed.parquet')}'"
                " (FORMAT PARQUET)"
            )


def _oracle_specs():
    return [(n, s.sql) for n, s in all_specs().items() if s.sql is not None]


@pytest.mark.parametrize("name,sql", _oracle_specs(), ids=lambda v: v if isinstance(v, str) and "\n" not in v else "")
def test_oracle_output_types_hash_safely(duck, name, sql):
    cols = duck.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (cname, ctype)
        for cname, ctype, *_ in cols
        if any(b in ctype.upper() for b in _BANNED) or ctype.upper().endswith("[]")
    ]
    assert not bad, (
        f"oracle {name!r} outputs driver-hash-unsafe column types {bad}: "
        "CAST integer SUMs to BIGINT; serialize arrays/structs with "
        "concat_ws/to_json on both the Spark and oracle sides"
    )


def test_sidecar_seeds_cover_every_oracle_family():
    """_SIDECAR_SEEDS is hand-maintained (seed rows need per-family
    schemas the registry can't synthesize), so pin it against the
    registry's sidecars= manifest (VERDICT r13 #5): every declared
    family whose op has an ORACLE (the DESCRIBE lint above only runs
    SQL-backed specs) must have at least one seeded path, else a new
    sidecar oracle would fail DESCRIBE here with a missing-parquet
    error instead of a clear message."""
    import os

    declared = {f for s in all_specs().values() for f in s.sidecars}
    # longest-declared-prefix match (ivfk_centroids vs ivfk_centroids_v2)
    seeded_families = set()
    for p in _SIDECAR_SEEDS:
        hits = [f for f in declared if os.path.basename(p).startswith(f + "_")]
        if hits:
            seeded_families.add(max(hits, key=len))
    needed = {
        f
        for s in all_specs().values()
        if s.sql is not None and s.sidecars
        for f in s.sidecars
        # engine-only families never appear in oracle SQL; DESCRIBE
        # doesn't read them (the oracle re-derives independently)
        if f in s.sql
    }
    missing = needed - seeded_families
    assert not missing, (
        f"oracle-referenced sidecar families with no _SIDECAR_SEEDS "
        f"entry: {sorted(missing)}"
    )
