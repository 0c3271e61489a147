"""A/B for SCALING.md watchpoint 11: the IVF candidate-pair dedup.

Reproduces the `_ivf_probe` search shape (corpus n_best=1 assignment ×
query nprobe assignment → cell join → [dropDuplicates] → exact re-rank
window) on the sf0.1 embeddings and the 10x replica, WITH and WITHOUT
the provably-redundant ``dropDuplicates(["query_id","vec_id"])``, so
the r16 helper change lands as a measured decision instead of an
argument. Results row -> SCALING.md watchpoint 11.
"""
import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.similarity import (
    _to_double,
    cosine,
    ivf_assign,
    ivf_kmeans_centroids,
)
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sidecars import sidecar_path
from tools._scale_common import ensure_replica, replicate_embeddings, timed
from etl_to_iceberg_spark.sources.tables import load_table

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
K, NPROBE = 10, 4

spark = get_spark(
    SessionConfig(
        app_name="dedup-ab",
        local_cores=32,
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

base = load_table(spark, SRC, "embeddings")
_emb10_path = sidecar_path("sf1_embeddings", SRC)
ensure_replica(_emb10_path, lambda: replicate_embeddings(base, 10))

for sf_name, (emb, nlist) in {
    "sf0.1": (base.select("vec_id", "embedding"), 16),
    "sf1 (10x)": (spark.read.parquet(_emb10_path), 160),
}.items():
    n = emb.count()
    cents = ivf_kmeans_centroids(emb, nlist=nlist, train_fraction=0.5)
    cents = spark.createDataFrame(cents.collect(), cents.schema)
    c = emb.select("vec_id", _to_double("embedding").alias("__v"))
    q = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("__v")
    )
    nq = q.count()

    def run(dedup: bool):
        cc = ivf_assign(c, cents, id_col="vec_id", n_best=1).select(
            "vec_id", F.col("__v").alias("__cv"), "cell"
        )
        qc = ivf_assign(q, cents, id_col="query_id", n_best=NPROBE).select(
            "query_id", F.col("__v").alias("__qv"), "cell"
        )
        scored = cc.join(qc, on="cell").select(
            "query_id", "vec_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("score"),
        )
        if dedup:
            scored = scored.dropDuplicates(["query_id", "vec_id"])
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("vec_id")
        )
        scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= K
        ).write.format("noop").mode("overwrite").save()

    for label, dd in (("with-dedup", True), ("no-dedup", False)):
        best, sw = timed(spark, lambda dd=dd: run(dd))
        print(
            f"{sf_name} ivf_probe {label}: n={n} nq={nq} nlist={nlist} "
            f"wall={best:.2f}s shuffle_write={sw and round(sw / 1e6, 2)}MB"
        )
spark.stop()
