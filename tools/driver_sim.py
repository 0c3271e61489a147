"""Simulate the driver's CORRECTNESS check locally.

Runs the first N rotation-ordered registry queries at sf0.01 against
their DuckDB oracles with the same comparison the driver uses (column
sort + row sort + exact value compare), so a failing row is caught
before the round's real check. Usage:

    PYTHONPATH=/root/repo python tools/driver_sim.py [N] [sf_dir]
    PYTHONPATH=/root/repo python tools/driver_sim.py op1,op2 [sf_dir]

A non-numeric first argument names specific ops (comma-separated)
instead of taking the rotation head — the one-op re-check after a
targeted change.
"""

from __future__ import annotations

import sys
import time
import traceback

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
BUDGET = 50
ONLY: list[str] | None = None
if len(sys.argv) > 1:
    if sys.argv[1].isdigit():
        BUDGET = int(sys.argv[1])
    else:
        ONLY = sys.argv[1].split(",")

# Import-time oracle SQL embeds sidecar paths keyed by the oracle SF
# (sidecars.py) — pin it to the SF this run compares at, before the
# registry modules are imported inside main().
import os  # noqa: E402

os.environ["E2IS_ORACLE_SF_DIR"] = SF_DIR


def main() -> int:
    import duckdb

    from pyspark.sql import SparkSession

    from etl_to_iceberg_spark.registry import all_specs
    from tests.parity import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    specs = all_specs()
    if ONLY is not None:
        missing = [n for n in ONLY if n not in specs]
        if missing:
            print(f"unknown ops: {missing}")
            return 1
        head = [(n, specs[n]) for n in ONLY]
    else:
        head = list(specs.items())[:BUDGET]
    n_fail = 0
    for i, (name, spec) in enumerate(head):
        t0 = time.time()
        try:
            df = spec.fn(spark, SF_DIR)
            if spec.sql is None:
                rows = df.count()
                status = f"rows-only ({rows} rows)"
            else:
                compare(df, duck, spec.sql)
                status = "ok"
        except Exception as e:  # noqa: BLE001 — report, keep going
            n_fail += 1
            status = f"FAIL {type(e).__name__}: {str(e)[:300]}"
            traceback.print_exc(limit=3)
        print(f"[{i + 1}/{len(head)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"done: {len(head)} checked, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
