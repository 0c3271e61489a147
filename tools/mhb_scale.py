"""Bucketed vs flat incremental-minhash tick: the pruning trend.

The claim under test (SCALING.md "Bucketed incremental-index layout"):
with the exploded band index Hive-partitioned by pmod(band_hash, N), a
tick's index I/O is O(touched buckets) — touched scales with the BATCH
(≈ N·(1-exp(-batch·bands/N))), total buckets with the CORPUS — so at a
fixed small batch, growing the corpus 10x grows the bucketed tick's
SCANNED bytes by ~the touched-bucket share while the flat tick always
rescans everything. Wall at fixture SF is reported but expected to
FAVOR the flat tick (file-open and planning overhead dominate a few-MB
index); the scannable terms — files/bytes touched — are what carry the
argument to corpus scale, exactly like the semantic-decontamination
tick's s/M-vec reading. Note the bucketed table is LARGER than the
flat one (the exploded layout rides the signature on every band row —
bands_bytes_total vs flat_bytes in the output shows the real ratio
after parquet encoding); pruned_pct is measured against the bucketed
table's own bytes.

Measures, per (corpus scale x bucket count x batch size): bands files
and bytes total vs in touched partitions, flat table bytes, flat vs
bucketed tick wall and shuffle-write bytes (0 can also mean the
executor REST poll failed — treat as missing, not as proof of zero).

Run: PYTHONPATH=. python tools/mhb_scale.py
"""
import json
import os
import sys
import tempfile
import time
import urllib.request

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.incremental import (
    bucketed_band_rows,
    incremental_minhash_tick,
    incremental_minhash_tick_bucketed,
    minhash_index_rows,
)
from etl_to_iceberg_spark.caching import release_frame
from etl_to_iceberg_spark.plans import ensure_parallelism
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")

spark = get_spark(
    SessionConfig(app_name="mhb-scale", local_cores=32, shuffle_partitions=32)
)
spark.sparkContext.setLogLevel("ERROR")
app_id = spark.sparkContext.applicationId
ui = spark.sparkContext.uiWebUrl


def shuffle_write_bytes():
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/executors"
        ) as r:
            return sum(e.get("totalShuffleWrite", 0) for e in json.load(r))
    except Exception:
        return 0


def timed(tick, runs=3):
    """tick(caches) -> DataFrame; every run's internal caches are
    unpersisted after its save — dozens of combos x 4 runs each would
    otherwise pile hundreds of cached frames into the block store (the
    first tool version did, and died mid-sweep with executor-side
    "unread block data" once the store was saturated)."""

    def once():
        caches = []
        tick(caches).write.format("noop").mode("overwrite").save()
        for c in caches:
            release_frame(c)

    once()  # warm
    best, sb = None, None
    for _ in range(runs):
        s0, t0 = shuffle_write_bytes(), time.perf_counter()
        once()
        w, s = time.perf_counter() - t0, shuffle_write_bytes() - s0
        if best is None or w < best:
            best, sb = w, s
    return best, sb


def table_bytes(t):
    return sum(os.path.getsize(fe.path) for fe in t.snapshot().files)


docs = ensure_parallelism(load_table(spark, SRC, "documents"))
results = {}
for mult in (1, 10):
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(f" replica {i}")))
        for i in range(mult)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    rows = minhash_index_rows(u).cache()
    n_idx = rows.count()
    cat = Catalog(spark, tempfile.mkdtemp(prefix=f"mhb_x{mult}_"))
    tf = cat.table("d.flat")
    tf.create(rows)
    flat_bytes = table_bytes(tf)

    for nb in (256, 2048):
        tb = cat.table(f"d.bands_{nb}")
        tb.create(
            bucketed_band_rows(rows, num_buckets=nb),
            partition_by=["band_bucket"],
        )
        files = tb.snapshot().files
        files_total = len(files)
        bytes_total = table_bytes(tb)

        for bsz in (40, 200, 1000):
            batch = (
                docs.where(F.col("doc_id") < bsz)
                .withColumn("doc_id", F.col("doc_id") + 100_000_000)
            )
            batch.cache().count()
            bsigs = minhash_index_rows(batch)
            touched = {
                r[0]
                for r in bucketed_band_rows(bsigs, num_buckets=nb)
                .select("band_bucket").distinct().collect()
            }
            kept = [
                fe for fe in files
                if any(f"band_bucket={t}/" in fe.path for t in touched)
            ]
            kept_bytes = sum(os.path.getsize(fe.path) for fe in kept)
            wall_f, sh_f = timed(
                lambda caches: incremental_minhash_tick(
                    tf.read(), batch, threshold=0.5, caches=caches
                )
            )
            wall_b, sh_b = timed(
                lambda caches: incremental_minhash_tick_bucketed(
                    tb.read(), batch,
                    band_buckets=nb, threshold=0.5, caches=caches,
                )
            )
            r = {
                "index_docs": n_idx,
                "batch_docs": bsz,
                "bands_files": f"{len(kept)}/{files_total}",
                "bands_bytes_touched": kept_bytes,
                "bands_bytes_total": bytes_total,
                "flat_bytes": flat_bytes,
                "pruned_pct": round(
                    100 * (1 - kept_bytes / max(bytes_total, 1)), 1
                ),
                "wall_flat_s": round(wall_f, 3),
                "wall_bucketed_s": round(wall_b, 3),
                "shuffle_flat": sh_f,
                "shuffle_bucketed": sh_b,
            }
            results[f"x{mult}/nb{nb}/b{bsz}"] = r
            print(json.dumps({f"x{mult}/nb{nb}/b{bsz}": r}), flush=True)
            batch.unpersist()
    rows.unpersist()

print(json.dumps(results))
