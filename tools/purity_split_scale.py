"""sf0.1 vs 10x scaling for the two r13 ops without a SCALING.md row:

- corpus_label_purity (labeled sign-flip replication from
  knn_vote_scale, nlist scaled 16 -> 160 per the quantizer-family
  posture): assignment scan x broadcast, then two partial-agg
  HashAggregates over (cell, label) rows.
- split_leakage_safe (the gen_scale_slice 10x documents replica —
  within-replica near-dup structure preserved, cross-replica texts
  unrelated): rides dedup_connected_components (already measured) plus
  ONE keyed join from cluster id back to the representative's
  content-hash split.

Run (regenerates the sf1 slice if absent, ~1 min):
    PYTHONPATH=. python tools/purity_split_scale.py
Results rows -> SCALING.md.
"""
import os
import subprocess
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.similarity import (
    _to_double,
    ivf_assign,
    ivf_kmeans_centroids,
)
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sidecars import sidecar_base, sidecar_path
from tools._scale_common import replicate_embeddings, timed
from etl_to_iceberg_spark.sources.tables import load_table

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
SF1 = os.environ.get(
    "SCALE_DST", os.path.join(sidecar_base(), "sf1")
)

spark = get_spark(
    SessionConfig(
        app_name="purity-split-scale",
        local_cores=32,
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

# --- corpus_label_purity -----------------------------------------------
base = load_table(spark, SRC, "embeddings")
# Keyed by SRC (the sidecar_path scheme): a replica built from one
# scale factor must never be silently reused for another.
_lab10_path = sidecar_path("sf1_embeddings_labeled", SRC)
if not os.path.isdir(_lab10_path):
    replicate_embeddings(base, 10, keep=("label",)).write.mode("overwrite").parquet(_lab10_path)

for sf_name, (emb, nlist) in {
    "sf0.1": (base.select("vec_id", "embedding", "label"), 16),
    "sf1 (10x)": (spark.read.parquet(_lab10_path), 160),
}.items():
    n = emb.count()
    cents = ivf_kmeans_centroids(emb, nlist=nlist, train_fraction=0.5)
    cents = spark.createDataFrame(cents.collect(), cents.schema)  # pin rows

    def run_purity():
        assigned = ivf_assign(
            emb.select("vec_id", _to_double("embedding").alias("__v")),
            cents, id_col="vec_id", n_best=1, with_vector=False,
        ).join(emb.select("vec_id", "label"), on="vec_id")
        hist = assigned.groupBy("cell", "label").agg(
            F.count(F.lit(1)).alias("n")
        )
        m32 = F.lit((1 << 32) - 1).cast("long")
        pack = (
            F.col("n").cast("long") * F.lit(1 << 32).cast("long")
            + (m32 - F.col("label").cast("long"))
        )
        hist.select("cell", pack.alias("__pk")).groupBy("cell").agg(
            F.max("__pk")
        ).write.format("noop").mode("overwrite").save()

    best, sw = timed(spark, run_purity)
    print(
        f"{sf_name} label_purity: n={n} nlist={nlist} wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 2)}MB"
    )

# --- split_leakage_safe ------------------------------------------------
if not os.path.isdir(SF1):
    print("generating 10x slice ->", SF1)
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "gen_scale_slice.py")],
        check=True,
        env={**os.environ, "SCALE_SRC": SRC, "SCALE_DST": SF1,
             "PYTHONPATH": os.path.join(os.path.dirname(__file__), "..")},
    )

from etl_to_iceberg_spark.ext.queries import split_leakage_safe

for sf_name, sf_dir in {"sf0.1": SRC, "sf1 (10x)": SF1}.items():
    n = load_table(spark, sf_dir, "documents").count()

    def run_split():
        split_leakage_safe(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    best, sw = timed(spark, run_split)
    print(
        f"{sf_name} split_leakage_safe: docs={n} wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 2)}MB"
    )
spark.stop()
