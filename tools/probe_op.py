"""Isolated per-op bench probe — the drift-adjudication instrument.

Every round some in-bench line drifts on unchanged code and the
adjudication protocol (SCALING.md "per_calib") prescribes the same
manual steps: fresh session, calibration probe first, isolated warm
pass, min-of-N timed runs, compare per_calib to the in-bench series.
This tool IS that protocol, so a drift read is one command instead of
an ad-hoc script each round:

    python tools/probe_op.py dedup_semantic_clusters [more ops...] \
        [--runs 5] [--sf /root/testdata/sf0.1]

Prints one JSON line per op: wall (min-of-N), all runs, per_calib
(wall / min(pre, post) calibration spark_cpu_sec — the op walls are
min-of-N so they reflect the fastest substrate state the session
passed through), per_calib_start (wall / START calibration — the exact
convention bench.py's r01_compat_per_calib uses, for comparing against
the in-bench series when pre/post calibrations disagree), and the
loadavg at probe time so a
non-idle read is self-documenting (the r14 lesson: a single isolated
probe at a non-idle moment can read 25-70% high — check loadavg ~1 and
prefer min-of-5 before trusting one).

Mirrors bench.py's measurement hygiene exactly: same session config,
same JVM/Python-worker warm-up, the SAME calibrate() (imported from
bench.py), per-op cache isolation (release_operator_caches +
clearCache, as bench's composite tranche does), an sf0.001 JIT warm
pass plus an untimed pass at the measured SF, then N timed noop-write
runs with the min reported.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ops", nargs="+", help="registry op names to probe")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    with open("/proc/loadavg") as f:
        loadavg = f.read().split()[0]

    from bench import calibrate
    from etl_to_iceberg_spark.caching import release_operator_caches
    from etl_to_iceberg_spark.registry import all_specs
    from etl_to_iceberg_spark.session import SessionConfig, get_spark

    spark = get_spark(
        SessionConfig(
            app_name="etl-to-iceberg-spark-probe",
            local_cores=args.cpus,
            shuffle_partitions=args.cpus,
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    unknown = [n for n in args.ops if n not in specs]
    if unknown:
        sys.exit(f"unknown ops: {unknown}")

    # Same session warm-up as bench.py: JVM codegen + parquet reader +
    # the Python worker daemon / per-core fork pool.
    from etl_to_iceberg_spark.sources.tables import load_table

    spark.range(1000).selectExpr("sum(id)").collect()
    load_table(spark, args.sf, "nation").limit(5).collect()

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(0, args.cpus * 10, 1, args.cpus).toDF("id").mapInPandas(
        _noop, "id long"
    ).write.format("noop").mode("overwrite").save()

    calibration = calibrate(spark, args.cpus)
    print(f"loadavg={loadavg} calibration={calibration}", file=sys.stderr)
    if calibration["spark_cpu_sec"] > 0.35:
        # Outside the pinned same-box envelope (0.21-0.31 across every
        # r11-r15 read): usually the post-idle frequency-ramp state —
        # the first all-core burst after long idle runs on parked/low
        # clocks. A probe normalized against a transient substrate
        # state misleads in BOTH directions, so ramp the cores and
        # re-read rather than trusting it.
        print("calibration outside envelope — re-reading after a ramp burst", file=sys.stderr)
        for _ in range(2):
            spark.range(0, 600_000_000, 1, args.cpus).selectExpr(
                "bit_xor(xxhash64(id)) AS h"
            ).collect()
        calibration = calibrate(spark, args.cpus)
        print(f"re-read calibration={calibration}", file=sys.stderr)

    warm_sf = "/root/testdata/sf0.001"
    do_warm = os.path.isdir(warm_sf) and os.path.abspath(
        warm_sf
    ) != os.path.abspath(args.sf)

    for name in args.ops:
        spec = specs[name]
        # Per-op isolation: start from a clean block store so the op's
        # timed runs reuse only what its own warm pass re-primes.
        release_operator_caches()
        spark.catalog.clearCache()
        if do_warm:
            try:
                spec.fn(spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:
                print(f"  warm-up(sf0.001) failed for {name}: {e!r}", file=sys.stderr)
        try:
            spec.fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(f"  warm-up failed for {name}: {e!r}", file=sys.stderr)
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        best = min(runs)
        # Post-run calibration: the substrate can shift WITHIN a probe
        # session (r15 observed 0.408 at session start vs 0.25-0.31
        # minutes later on the same idle box — post-idle clock ramp).
        # A pre/post disagreement > ~20% flags the whole probe as taken
        # on a moving substrate; normalize against the min of the two
        # (the op walls are min-of-N, so they reflect the FASTEST
        # substrate state the session passed through).
        calib_post = calibrate(spark, args.cpus)
        spark_cpu = min(
            calibration["spark_cpu_sec"], calib_post["spark_cpu_sec"]
        )
        print(
            json.dumps(
                {
                    "op": name,
                    "wall_min": best,
                    "runs": runs,
                    "per_calib": round(best / spark_cpu, 2),
                    # bench.py's r01_compat_per_calib divides by the
                    # START calibration (kept for series continuity);
                    # emit that convention too so probe numbers compare
                    # against the in-bench series without re-deriving.
                    # When pre/post agree the two fields are equal.
                    "per_calib_start": round(
                        best / calibration["spark_cpu_sec"], 2
                    ),
                    "calibration": calibration,
                    "calibration_post": calib_post,
                    "loadavg": loadavg,
                    "sf": args.sf,
                }
            )
        )


if __name__ == "__main__":
    main()
