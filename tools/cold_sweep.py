"""Cold-start parity sweep over every sidecar-dependent operator.

The oracle sidecars (sidecars.py) are process-scoped: ``ensure_sidecar``
registers each directory with scratch.register_cleanup, so a normally
exiting process removes what it built and EVERY fresh process starts
cold. That makes cold-start the default posture, but a sweep that runs
ONLY the sidecar-dependent ops from a verified-empty base is the
targeted check VERDICT r12 #3 asked for: a missing ``ensure_sidecar``
call or an engine/oracle params-key mismatch fails here with an empty
``<tmpdir>/e2is-<uid>`` instead of riding a warm dir from an earlier op
in the same process. Usage:

    PYTHONPATH=/root/repo python tools/cold_sweep.py [sf_dir]

Exits non-zero if the base dir is non-empty (not a cold run) or any op
fails its driver-style compare.
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
os.environ["E2IS_ORACLE_SF_DIR"] = SF_DIR


def main() -> int:
    import duckdb

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.registry import all_specs
    from etl_to_iceberg_spark.session import SessionConfig, get_spark
    from tests.parity import compare

    base = sidecars.sidecar_base()
    if any(os.scandir(base)):
        print(f"{base} is not empty — move it aside for a cold run", file=sys.stderr)
        return 2

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
    # Ops whose ORACLE reads a sidecar, plus sidecar-writing ops whose
    # oracle re-derives independently (the sidecar is engine-only).
    dep = [n for n, s in specs.items() if s.sql and base in s.sql]
    dep += [
        n
        for n in ("similarity_quantizer_refresh",)
        if n not in dep and n in specs
    ]
    print(f"{len(dep)} sidecar-dependent ops, cold base verified empty")
    fails = 0
    for i, n in enumerate(dep):
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
        print(f"[{i + 1}/{len(dep)}] {n}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"cold sweep done: {len(dep)} checked, {fails} failed")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
