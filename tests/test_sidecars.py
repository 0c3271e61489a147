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


def _ivf2l_live_routing(spark, sf_dir):
    """Fresh two-level routing from the stored quantizer — the ground
    truth the assignment sidecar must carry (the same derivation the
    live-vs-sidecar pin in test_corpus_model_sweep.py uses)."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.corpus_queries import (
        _IVF2L_PARAMS,
        _ivf2l_centroids,
    )
    from etl_to_iceberg_spark.ext.similarity import _to_double, ivf_assign
    from etl_to_iceberg_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf2l_centroids(spark, sf_dir)
    c = emb.select("vec_id", _to_double("embedding").alias("__v"))
    q = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("__v")
    )
    return {
        ("c", r.vec_id, r.cell)
        for r in ivf_assign(
            c, cents, id_col="vec_id", n_best=1, with_vector=False
        ).collect()
    } | {
        ("q", r.query_id, r.cell)
        for r in ivf_assign(
            q, cents, id_col="query_id",
            n_best=_IVF2L_PARAMS["nprobe"], with_vector=False,
        ).collect()
    }


def test_poisoned_assignment_sidecar_defense_stack(spark, sf_dir):
    """Planted pathology for the assignment-sidecar oracle pattern's
    one structural blind spot (VERDICT r12 #6): the ivf2l_assign
    sidecar is ENGINE-WRITTEN and consumed by engine AND oracle, so if
    wrong rows sit at the right path, driver parity stays green. This
    pins exactly which layer catches each poisoning:

    1. wrong rows + missing/stale ``_sfkey`` marker — the FRESHNESS
       machinery rebuilds (foreign content is never trusted);
    2. wrong rows + a forged valid marker — ensure_sidecar trusts the
       directory BY DESIGN (the stored-index posture: re-runs must read,
       not re-seed), and the live-vs-sidecar routing-equality tripwire
       (test_ivf2l_assignment_sidecar_matches_live_routing) is what
       detects it — asserted here as stored != live on the poisoned
       rows, i.e. that pin genuinely fails loudly rather than both
       engines silently agreeing.
    """
    import shutil

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext.corpus_queries import (
        _IVF2L_PARAMS,
        _ivf2l_assignments,
    )

    path = sidecars.sidecar_path("ivf2l_assign", sf_dir, _IVF2L_PARAMS)
    truth = {
        (r.side, r.id, r.cell)
        for r in _ivf2l_assignments(spark, sf_dir).collect()
    }
    live = _ivf2l_live_routing(spark, sf_dir)
    assert truth == live  # healthy baseline

    def plant_poison():
        # same schema, systematically wrong cells (every assignment
        # shifted to a different cell) — the silent-wrongness shape.
        # Materialize the good rows BEFORE overwriting: a lazy read of
        # `path` would see its own overwrite delete the files mid-scan.
        good = spark.read.parquet(path).select("side", "id", "cell")
        schema = good.schema
        rows = [
            (r.side, r.id, (r.cell + 1) % _IVF2L_PARAMS["nlist"])
            for r in good.collect()
        ]
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(path)  # marker nuked too

    try:
        # --- 1. poison without a valid marker: freshness rebuilds -----
        plant_poison()
        assert not os.path.exists(os.path.join(path, "_sfkey"))
        healed = {
            (r.side, r.id, r.cell)
            for r in _ivf2l_assignments(spark, sf_dir).collect()
        }
        assert healed == truth, "marker-less foreign content must be rebuilt"

        # --- 2. poison with a FORGED valid marker: trusted by design, -
        # caught by the live-vs-sidecar equality tripwire
        plant_poison()
        with open(os.path.join(path, "_sfkey"), "w") as f:
            f.write(os.path.abspath(sf_dir))
        stored = {
            (r.side, r.id, r.cell)
            for r in _ivf2l_assignments(spark, sf_dir).collect()
        }
        assert stored != truth, (
            "a forged-marker sidecar must be READ, not rebuilt (the stored-"
            "index posture) — if this rebuilds, the freshness contract grew "
            "a content check and this test should be rewritten"
        )
        assert stored != live, (
            "the routing-equality tripwire failed to distinguish poisoned "
            "rows from live routing — the blind spot is uncovered"
        )
    finally:
        # Drop the (possibly still-poisoned) directory even when an
        # assertion above fails — with the forged marker in place every
        # later consumer in this process would trust the wrong rows and
        # bury the root cause under cascading failures.
        shutil.rmtree(path, ignore_errors=True)

    # --- restore: rebuild truth from scratch ---------------------------
    rebuilt = {
        (r.side, r.id, r.cell)
        for r in _ivf2l_assignments(spark, sf_dir).collect()
    }
    assert rebuilt == truth == _ivf2l_live_routing(spark, sf_dir)


def _source_sidecar_families() -> set[str]:
    """Family names at every ``sidecar_path(``/``oracle_sidecar_path(``
    call site in the package source — AST-walked, not regexed (ADVICE
    r14): a call passing the family via a variable would silently drop
    out of both directions of the manifest check under a literal-only
    string scan, so every call whose first argument is NOT a string
    literal fails loudly here instead of vanishing. ``sidecars.py``
    itself is excluded (it defines the API; its internal
    ``oracle_sidecar_path -> sidecar_path`` delegation forwards a
    parameter by design)."""
    import ast
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "etl_to_iceberg_spark"
    fams: set[str] = set()
    non_literal: list[str] = []
    for p in pkg.rglob("*.py"):
        if p.name == "sidecars.py":
            continue
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            name = fn.id if isinstance(fn, ast.Name) else (
                fn.attr if isinstance(fn, ast.Attribute) else None
            )
            if name not in ("sidecar_path", "oracle_sidecar_path"):
                continue
            first = node.args[0] if node.args else None
            if first is None:
                # family passed as a keyword (name="fam") is still a
                # literal call site — don't misreport it as non-literal
                # (ADVICE r15)
                first = next(
                    (kw.value for kw in node.keywords if kw.arg == "name"),
                    None,
                )
            if isinstance(first, ast.Constant) and isinstance(first.value, str):
                fams.add(first.value)
            else:
                non_literal.append(f"{p.name}:{node.lineno}")
    assert not non_literal, (
        f"sidecar_path call sites whose family is not a string literal: "
        f"{non_literal} — the manifest check (and cold_sweep's coverage "
        "guarantee) can only see literal families; inline the name"
    )
    return fams


def test_sidecar_manifest_covers_every_call_site():
    """The registry's ``sidecars=`` manifest (VERDICT r13 #5) and the
    package's actual sidecar_path call sites must agree in BOTH
    directions: a family used in source but declared by no op would
    silently drop its consumers out of tools/cold_sweep.py (the
    engine-only-sidecar hole the old oracle-SQL substring discovery
    had); a declared family absent from source is a stale manifest
    entry."""
    from etl_to_iceberg_spark.registry import all_specs

    specs = all_specs()
    declared = {f for s in specs.values() for f in s.sidecars}
    in_source = _source_sidecar_families()
    assert in_source - declared == set(), (
        f"sidecar families used in source but declared by no QuerySpec: "
        f"{sorted(in_source - declared)} — add sidecars=(...) at the "
        "consuming ops' register() sites"
    )
    assert declared - in_source == set(), (
        f"declared sidecar families with no sidecar_path call site: "
        f"{sorted(declared - in_source)} — stale manifest entries"
    )


def test_sidecar_manifest_superset_of_oracle_substring_scan():
    """Every op whose ORACLE SQL embeds the sidecar base path must also
    declare its families — the manifest may only ever widen the old
    substring-derived cold-sweep set, never lose part of it."""
    from etl_to_iceberg_spark.registry import all_specs
    from etl_to_iceberg_spark.sidecars import sidecar_base

    base = sidecar_base()
    for n, s in all_specs().items():
        if s.sql and base in s.sql:
            assert s.sidecars, (
                f"{n} reads {base} in its oracle but declares no "
                "sidecars= families"
            )


def test_cold_sweep_isolate_smoke(tmp_path):
    """CI-speed smoke of cold_sweep's --isolate mode (VERDICT r14 #6):
    one sidecar-dependent op in its own re-exec'd child process — a
    fresh process starts from a cold base by construction (atexit
    cleanup), so this is a true per-op cold-start proof, not the
    shared-process audit that can warm-ride an earlier op's family
    dir. One cheap single-family op keeps it ~20s; the full isolated
    sweep is `python tools/cold_sweep.py --isolate`.

    The child gets a PRIVATE sidecar base via TMPDIR
    (sidecars.sidecar_base honors tempfile.gettempdir): when this test
    runs inside the full suite, the suite's own process has already
    built family dirs under the shared base, and the child's cold
    pre-check would (correctly) refuse with rc=2."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [
            _sys.executable,
            str(root / "tools" / "cold_sweep.py"),
            "--isolate",
            "--only",
            "dedup_semantic_kmeans",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": str(root), "TMPDIR": str(tmp_path)},
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "isolated cold sweep done: 1 checked, 0 failed" in r.stdout, r.stdout
