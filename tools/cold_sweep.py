"""Cold-start parity sweep over every sidecar-dependent operator.

The oracle sidecars (sidecars.py) are process-scoped: ``ensure_sidecar``
registers each directory with scratch.register_cleanup, so a normally
exiting process removes what it built and EVERY fresh process starts
cold. That makes cold-start the default posture, but a sweep that runs
ONLY the sidecar-dependent ops from a verified-empty base is the
targeted check VERDICT r12 #3 asked for: a missing ``ensure_sidecar``
call or an engine/oracle params-key mismatch fails here with an empty
``<tmpdir>/e2is-<uid>`` instead of riding a warm dir from an earlier op
in the same process.

Op discovery is REGISTRY-DRIVEN (VERDICT r13 #5): each QuerySpec
declares the sidecar families it touches (``sidecars=`` at
registration), so engine-only sidecars whose oracle reads nothing —
e.g. the label-vote ``knn_vote_index`` — are covered without the old
oracle-SQL substring trick. tests/test_sidecars.py pins the manifest
against the package's actual ``sidecar_path`` call sites.

Within one sweep process ops run sequentially against ONE base, so only
the FIRST op per shared family is truly cold (ADVICE r13): op #1 builds
e.g. the shared ivfk_centroids dir and later ops ride it warm. The
sweep makes that visible instead of silent — it snapshots the base's
top-level dirs around each op, records which op CREATED each dir, and
prints per op which of its declared families were warm and who built
them. A later op missing its own ensure_sidecar call for a family no
earlier op builds still fails cold here; one sharing an earlier op's
family is reported as warm-riding so the limitation is auditable.

Usage:

    PYTHONPATH=/root/repo python tools/cold_sweep.py [sf_dir]
    PYTHONPATH=/root/repo python tools/cold_sweep.py --isolate [sf_dir]
    PYTHONPATH=/root/repo python tools/cold_sweep.py --only op1,op2 [sf_dir]

``--isolate`` (VERDICT r14 #6) upgrades the audit to prevention: each
sidecar-dependent op runs in its OWN re-exec'd process (`--only` child)
— a normally exiting process atexit-removes every sidecar it built
(scratch.register_cleanup in ensure_sidecar), so every child starts
from a genuinely cold base and warm-riding within a shared family is
impossible, not just printed. Costs one Spark session per op (~15-25s
each); the default shared-process mode remains the fast audit.

Exits non-zero if any declared sidecar-family dir pre-exists under the
base (not a cold run; the scale scripts' persistent replica caches are
tolerated — they warm no op) or any op fails its driver-style compare.
"""

from __future__ import annotations

import os
import sys
import time

_argv = [a for a in sys.argv[1:]]
ISOLATE = "--isolate" in _argv
if ISOLATE:
    _argv.remove("--isolate")
ONLY: list[str] | None = None
if "--only" in _argv:
    i = _argv.index("--only")
    if i + 1 >= len(_argv):
        sys.exit("usage: --only requires a comma-separated op list")
    ONLY = _argv[i + 1].split(",")
    del _argv[i : i + 2]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
os.environ["E2IS_ORACLE_SF_DIR"] = SF_DIR


def _families(entry: str, fams: set[str]) -> set[str]:
    """Declared families a base-dir entry belongs to (dirs are named
    ``<family>_<sfkey>[_<paramskey>]``; family names can be prefixes of
    one another — ivfk_centroids / ivfk_centroids_v2 — so match the
    longest declared prefix only)."""
    hits = {f for f in fams if entry.startswith(f + "_")}
    longest = max((len(f) for f in hits), default=0)
    return {f for f in hits if len(f) == longest}


def _isolate() -> int:
    """Re-exec one ``--only`` child per sidecar-dependent op. No Spark
    in the parent: the registry import is enough to enumerate ops."""
    import subprocess

    from etl_to_iceberg_spark.registry import all_specs

    specs = all_specs()
    dep = ONLY or [n for n, s in specs.items() if s.sidecars]
    # Validate in the parent: a typo'd op name should be a usage error
    # here, not a full child process spawned just to fail with rc=2.
    unknown = [n for n in dep if n not in specs]
    if unknown:
        sys.exit(f"unknown op name(s): {', '.join(unknown)}")
    print(f"isolate mode: {len(dep)} ops, one process each")
    fails = 0
    for i, n in enumerate(dep):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", n, SF_DIR],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))},
        )
        # the child prints its own [1/1] line; surface its verdict
        verdict = "ok"
        if r.returncode != 0:
            fails += 1
            tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
            verdict = f"FAIL rc={r.returncode}: {' | '.join(tail)}"
        print(
            f"[{i + 1}/{len(dep)}] {n}: {verdict} ({time.time() - t0:.1f}s, cold process)",
            flush=True,
        )
    print(f"isolated cold sweep done: {len(dep)} checked, {fails} failed")
    return 1 if fails else 0


def main() -> int:
    import duckdb

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.registry import all_specs
    from etl_to_iceberg_spark.session import SessionConfig, get_spark
    from tests.parity import compare

    base = sidecars.sidecar_base()

    spark = get_spark(SessionConfig(local_cores=8, shuffle_partitions=8))
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    specs = all_specs()
    dep = [n for n, s in specs.items() if s.sidecars]
    if ONLY is not None:
        missing = [n for n in ONLY if n not in specs]
        if missing:
            print(f"unknown ops: {missing}", file=sys.stderr)
            return 2
        dep = ONLY
    declared = {f for s in specs.values() for f in s.sidecars}
    # Cold means no DECLARED-FAMILY dir pre-exists. Non-sidecar entries
    # (the scale scripts' replica caches, e.g. sf1_embeddings_*) are
    # deliberately persistent and don't warm any op — tolerate them
    # instead of demanding a fully empty base every run.
    warm_pre = sorted(
        e.name for e in os.scandir(base) if _families(e.name, declared)
    )
    if warm_pre:
        print(
            f"{base} holds sidecar dirs from a prior run — move them "
            f"aside for a cold run: {warm_pre}",
            file=sys.stderr,
        )
        return 2
    # Lint: the old substring heuristic must never find an op the
    # manifest misses — an oracle that reads the base without a
    # declaration is a coverage hole.
    undeclared = [
        n for n, s in specs.items() if s.sql and base in s.sql and not s.sidecars
    ]
    if undeclared:
        print(
            f"ops reading {base} in their oracle but declaring no "
            f"sidecars= families: {undeclared}",
            file=sys.stderr,
        )
        return 2
    print(
        f"{len(dep)} sidecar-dependent ops (registry manifest), "
        "no pre-existing sidecar dirs — cold"
    )

    built_by: dict[str, str] = {}  # base-dir entry -> op that created it
    fails = 0
    for i, n in enumerate(dep):
        before = {e.name for e in os.scandir(base)}
        warm = sorted(
            {
                f
                for e in before
                for f in _families(e, declared)
                if f in specs[n].sidecars
            }
        )
        t0 = time.time()
        try:
            df = specs[n].fn(spark, SF_DIR)
            if specs[n].sql is None:
                status = f"rows-only ({df.count()} rows)"
            else:
                compare(df, duck, specs[n].sql)
                status = "ok"
        except Exception as e:  # noqa: BLE001 — report, keep going
            fails += 1
            status = f"FAIL {type(e).__name__}: {str(e)[:200]}"
        created = {e.name for e in os.scandir(base)} - before
        for e in created:
            built_by[e] = n
        note = ""
        if warm:
            builders = sorted(
                {
                    built_by.get(e, "?")
                    for e in before
                    for f in _families(e, declared)
                    if f in warm
                }
            )
            note = f" [warm: {','.join(warm)} built by {','.join(builders)}]"
        print(
            f"[{i + 1}/{len(dep)}] {n}: {status} ({time.time() - t0:.1f}s){note}",
            flush=True,
        )
    print(f"cold sweep done: {len(dep)} checked, {fails} failed")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(_isolate() if ISOLATE else main())
