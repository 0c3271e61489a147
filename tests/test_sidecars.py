"""Contract tests for sidecar placement + freshness (sidecars.py).

The sidecar is the stored-model half of its operator; these pin the two
properties parity silently depends on: (1) the path key separates every
(sf_dir, training-params) combination — a knob change must be a NEW
directory, not a silently-reused stale sketch served to engine AND
oracle; (2) ensure_sidecar's on-disk marker self-heals deletion and
foreign content but never rebuilds a fresh same-key sidecar.
"""

from __future__ import annotations

import os

from etl_to_iceberg_spark.sidecars import (
    ensure_sidecar,
    oracle_sidecar_path,
    sidecar_path,
)


def test_params_key_separates_directories():
    a = sidecar_path("fam", "/data/sf0.01", {"nlist": 16, "seed": 7})
    b = sidecar_path("fam", "/data/sf0.01", {"nlist": 32, "seed": 7})
    c = sidecar_path("fam", "/data/sf0.01", {"seed": 7, "nlist": 16})
    d = sidecar_path("fam", "/data/sf0.1", {"nlist": 16, "seed": 7})
    bare = sidecar_path("fam", "/data/sf0.01")
    assert a != b, "param change must relocate the sidecar"
    assert a == c, "key order must not matter (sorted fingerprint)"
    assert a != d, "sf_dir still separates"
    assert a != bare, "params-keyed path never collides with the bare one"


def test_oracle_path_matches_builder_path_for_same_params():
    # The import-time oracle SQL and the query-fn builder must resolve
    # the SAME directory when handed the same constants — the property
    # every params-keyed family relies on.
    import etl_to_iceberg_spark.sidecars as sc

    params = {"m": 8, "dsub": 8}
    assert oracle_sidecar_path("fam2", params) == sidecar_path(
        "fam2", sc.oracle_sf_dir(), params
    )


def test_ensure_sidecar_builds_once_and_self_heals(spark, tmp_path):
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).toDF("id")

    path = str(tmp_path / "side")
    sf = "/data/sf0.01"
    ensure_sidecar(path, sf, build)
    assert len(calls) == 1
    ensure_sidecar(path, sf, build)
    assert len(calls) == 1, "fresh same-key sidecar must not rebuild"
    # foreign marker content (another sf_dir's leftovers) => rebuild
    with open(os.path.join(path, "_sfkey"), "w") as f:
        f.write("/somewhere/else")
    ensure_sidecar(path, sf, build)
    assert len(calls) == 2, "stale-keyed directory must rebuild"
