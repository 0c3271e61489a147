"""Per-stage profile of one registry op — the guide §1/§7 instrument.

Runs one op exactly as bench.py times it (fresh session, same conf,
warm pass, then ONE timed noop-write run) and then reads the Spark UI
REST API for every job/stage that run submitted: per-stage wall,
executorRunTime, shuffle read/write bytes, input bytes, task counts.
Answers "where do this op's seconds actually go" — scheduling overhead
(many tiny stages), one hot stage, shuffle volume, or driver gaps
(time between jobs = py4j/driver work: collects, table commits,
sidecar IO).

    python tools/profile_op.py dedup_incremental_minhash [--sf DIR]

Prints a stage table sorted by stage wall, plus a jobs timeline with
inter-job driver gaps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("op")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from etl_to_iceberg_spark.caching import release_operator_caches
    from etl_to_iceberg_spark.registry import all_specs
    from etl_to_iceberg_spark.session import SessionConfig, get_spark

    spark = get_spark(
        SessionConfig(
            app_name=f"e2is-profile-{args.op}",
            local_cores=args.cpus,
            shuffle_partitions=args.cpus,
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_specs()[args.op]

    # Warm exactly like bench.py: sf0.001 JIT pass + untimed same-SF pass.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and os.path.abspath(warm_sf) != os.path.abspath(
        args.sf
    ):
        spec.fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
    release_operator_caches()
    spark.catalog.clearCache()
    spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    base = spark.sparkContext.uiWebUrl + "/api/v1"
    app_id = spark.sparkContext.applicationId
    jobs_before = {j["jobId"] for j in _get(base, f"/applications/{app_id}/jobs")}

    best = None
    for _ in range(args.runs):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"profile: {args.op}")
        spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            jobs_now = _get(base, f"/applications/{app_id}/jobs")
            best = (wall, [j for j in jobs_now if j["jobId"] not in jobs_before])
        jobs_before = {
            j["jobId"] for j in _get(base, f"/applications/{app_id}/jobs")
        }
    wall, new_jobs = best
    new_jobs.sort(key=lambda j: j["jobId"])

    def ts(s):  # "2026-08-17T11:47:07.123GMT" -> epoch seconds
        from datetime import datetime, timezone

        return (
            datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )

    stage_ids = set()
    print(f"\n== {args.op}: wall {wall:.3f}s, {len(new_jobs)} jobs ==")
    print("jobs timeline (gap = driver-side time since previous job ended):")
    prev_end = None
    total_gap = 0.0
    for j in new_jobs:
        start, end = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = (start - prev_end) if prev_end is not None else 0.0
        total_gap += max(gap, 0.0)
        prev_end = end
        stage_ids.update(j["stageIds"])
        print(
            f"  job {j['jobId']:>4}  {end - start:6.3f}s  gap {gap:6.3f}s  "
            f"tasks {j['numTasks']:>4}  {(j.get('description') or j['name'])[:70]}"
        )
    print(f"  total inter-job driver gap: {total_gap:.3f}s of {wall:.3f}s wall")

    stages = _get(base, f"/applications/{app_id}/stages?status=complete")
    rows = []
    for s in stages:
        if s["stageId"] not in stage_ids:
            continue
        rows.append(
            (
                ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"]),
                s["stageId"],
                s["numCompleteTasks"],
                s["executorRunTime"] / 1000.0,
                s["inputBytes"],
                s["shuffleReadBytes"],
                s["shuffleWriteBytes"],
                s["name"].split("\n")[0][:60],
            )
        )
    rows.sort(reverse=True)
    print(
        f"\nstages ({len(rows)}) by wall: "
        "wall | id | tasks | execRun | input | shufR | shufW | name"
    )
    for r in rows[:25]:
        print(
            f"  {r[0]:6.3f}s  {r[1]:>5}  {r[2]:>4}  {r[3]:7.2f}s  "
            f"{r[4] / 1e6:8.2f}MB {r[5] / 1e6:8.2f}MB {r[6] / 1e6:8.2f}MB  {r[7]}"
        )
    tot_stage_wall = sum(r[0] for r in rows)
    print(
        f"\nsummary: wall {wall:.3f}s, stage-wall sum {tot_stage_wall:.3f}s, "
        f"driver gaps {total_gap:.3f}s, stages {len(rows)}, "
        f"tasks {sum(r[2] for r in rows)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
