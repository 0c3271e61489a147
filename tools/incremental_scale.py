"""Incremental-dedup tick cost vs index size (FIXED batch).

The claim under test (SCALING.md "Training-data extensions →
Incremental dedup"): a tick is O(batch sketch + one narrow index scan)
with zero corpus-sized shuffle, so a 10x larger already-ingested corpus
must grow tick wall only by the narrow scan term, and shuffle bytes
must stay ~batch-sized (flat).

Setup: index = all documents of the corpus (sf0.1 -> ~5k docs;
sf1 slice -> ~50k docs, run tools/gen_scale_slice.py first); batch =
the SAME 500 sf0.1 docs in both cases, id-shifted above the index
range. Warmed min-of-3 wall + per-run shuffle-write bytes on local[32].

Run: PYTHONPATH=. python tools/incremental_scale.py
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
    exact_index_rows,
    incremental_exact_tick,
    incremental_minhash_tick,
    minhash_index_rows,
)
from etl_to_iceberg_spark.plans import ensure_parallelism
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog

SFS = {
    "sf0.1": os.environ.get("SCALE_SRC", "/root/testdata/sf0.1"),
    "sf1": os.environ.get("SCALE_DST", os.path.join(__import__("tempfile").gettempdir(), f"e2is-{os.getuid()}", "sf1")),
}

spark = get_spark(
    SessionConfig(app_name="incremental-scale", local_cores=32, shuffle_partitions=32)
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


def docs(sf_dir):
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# Fixed 500-doc batch, ids shifted far above any index id.
batch = (
    docs(SFS["sf0.1"])
    .where(F.col("doc_id") < 500)
    .withColumn("doc_id", F.col("doc_id") + 10_000_000)
)
batch.cache().count()  # charge batch read to setup, not the tick

results = {}
for label, sf_dir in SFS.items():
    if not os.path.isdir(sf_dir):
        print(f"skip {label}: {sf_dir} missing (run tools/gen_scale_slice.py)")
        continue
    cat = Catalog(spark, tempfile.mkdtemp(prefix=f"incr_{label.replace('.','_')}_"))
    tf = cat.table("d.fp")
    tf.append(exact_index_rows(docs(sf_dir)))
    tm = cat.table("d.mh")
    tm.append(minhash_index_rows(docs(sf_dir)))
    n_idx = tf.read().count()

    for name, tick in (
        ("exact", lambda: incremental_exact_tick(tf.read(), batch)),
        ("minhash", lambda: incremental_minhash_tick(tm.read(), batch, threshold=0.5)),
    ):
        tick().write.format("noop").mode("overwrite").save()  # warm
        best, sb = None, None
        for _ in range(3):
            s0, t0 = shuffle_write_bytes(), time.perf_counter()
            tick().write.format("noop").mode("overwrite").save()
            w, s = time.perf_counter() - t0, shuffle_write_bytes() - s0
            if best is None or w < best:
                best, sb = w, s
        results[f"{name}@{label}"] = {
            "index_docs": n_idx,
            "wall_s": round(best, 3),
            "shuffle_bytes": sb,
        }
        print(f"{name}@{label}: idx={n_idx} wall={best:.3f}s shuffle={sb}")

# --- ANN tick vs index size (fixed 100-vector batch) -------------------------
# The sf1 slice keeps embeddings dim-sized, so the 10x index is synthesized
# by id-shifted replication of the sf0.1 embeddings (bucket distribution is
# identical per copy — candidates per query grow 10x, the honest scan term).
from etl_to_iceberg_spark.ext.incremental import (  # noqa: E402
    ann_index_rows,
    incremental_ann_tick,
)

emb = load_table(spark, SFS["sf0.1"], "embeddings")
ann_batch = (
    emb.where(F.col("vec_id") < 100)
    .withColumn("vec_id", F.col("vec_id") + 100_000_000)
)
ann_batch.cache().count()
for mult in (1, 10):
    parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        for i in range(mult)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    cat = Catalog(spark, tempfile.mkdtemp(prefix=f"incr_ann_x{mult}_"))
    ta = cat.table("a.idx")
    ta.append(ann_index_rows(u))
    n_idx = ta.read().count()
    tick = lambda: incremental_ann_tick(ta.read(), ann_batch, k=5)
    tick().write.format("noop").mode("overwrite").save()  # warm
    best, sb = None, None
    for _ in range(3):
        s0, t0 = shuffle_write_bytes(), time.perf_counter()
        tick().write.format("noop").mode("overwrite").save()
        w, s = time.perf_counter() - t0, shuffle_write_bytes() - s0
        if best is None or w < best:
            best, sb = w, s
    results[f"ann@x{mult}"] = {
        "index_docs": n_idx,
        "wall_s": round(best, 3),
        "shuffle_bytes": sb,
    }
    print(f"ann@x{mult}: idx={n_idx} wall={best:.3f}s shuffle={sb}")

print(json.dumps(results))
