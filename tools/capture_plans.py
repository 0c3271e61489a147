"""Capture .explain('formatted') for headline queries into plans/r18/.

Optimization-round instrument (guide §1: measure first, §7.2: read the
plan): builds each bench HEADLINE query exactly as bench.py does
(fn(spark, SF_DIR)) and writes the formatted physical plan to
plans/r18/<name>_<tag>.txt, so plan-shape claims in OPTIMIZATION_r18.md
(Exchange counts, join strategies, PushedFilters) are checkable without
running Spark.

    python tools/capture_plans.py before [op ...]    # default: all HEADLINE
    python tools/capture_plans.py after  [op ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE, SF_DIR

    names = sys.argv[2:] or HEADLINE

    from etl_to_iceberg_spark.registry import all_specs
    from etl_to_iceberg_spark.session import SessionConfig, get_spark

    spark = get_spark(
        SessionConfig(
            app_name="e2is-capture-plans",
            local_cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "plans",
        os.environ.get("E2IS_PLANS_ROUND", "r18"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = specs[name].fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as e:  # visible, not fatal: capture the rest
            text = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        print(f"  {name}: {len(text)} bytes, ~{n_exch} Exchange mentions")
    spark.stop()


if __name__ == "__main__":
    main()
