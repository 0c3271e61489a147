"""sf0.1 vs 10x scaling for the kNN label-vote scorer, nlist scaled to
the corpus (the quantizer-family posture: E[cell] constant, so
candidates per query stay flat and total scoring work is query-linear).
Replication reuses pq_scale's sign-flip scheme; labels replicate with
their vector (a replica is the same labeled point in a rotated basis).
Results row -> SCALING.md.
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
from tools._scale_common import replicate_embeddings, timed
from etl_to_iceberg_spark.sources.tables import load_table

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
K, NPROBE = 10, 2

spark = get_spark(
    SessionConfig(
        app_name="knn-vote-scale",
        local_cores=32,
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

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
    idx = emb.where(F.col("vec_id") % 5 != 0)
    qry = emb.where(F.col("vec_id") % 5 == 0)
    nq = qry.count()

    def run_vote():
        ia = ivf_assign(
            idx.select("vec_id", _to_double("embedding").alias("__v")),
            cents, id_col="vec_id", n_best=1, with_vector=False,
        )
        qa = ivf_assign(
            qry.select(
                F.col("vec_id").alias("query_id"),
                _to_double("embedding").alias("__v"),
            ),
            cents, id_col="query_id", n_best=NPROBE, with_vector=False,
        )
        # Mirrors the op: no forced broadcast of the query (scored)
        # side — it is corpus-proportional (20% by split).
        cand = (
            ia.join(qa, on="cell")
            .select("query_id", "vec_id")
            .dropDuplicates(["query_id", "vec_id"])
        )
        scored = (
            cand.join(
                idx.select(
                    "vec_id", "label", _to_double("embedding").alias("__cv")
                ),
                on="vec_id",
            )
            .join(
                qry.select(
                    F.col("vec_id").alias("query_id"),
                    _to_double("embedding").alias("__qv"),
                ),
                on="query_id",
            )
            .select(
                "query_id", "vec_id", "label",
                F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("s"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("s").desc(), F.col("vec_id")
        )
        topk = scored.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= K
        )
        votes = topk.groupBy("query_id", "label").agg(
            F.count(F.lit(1)).alias("v")
        )
        m32 = F.lit((1 << 32) - 1).cast("long")
        pack = (
            F.col("v").cast("long") * F.lit(1 << 32).cast("long")
            + (m32 - F.col("label").cast("long"))
        )
        votes.select("query_id", pack.alias("__pk")).groupBy(
            "query_id"
        ).agg(F.max("__pk")).write.format("noop").mode("overwrite").save()

    best, sw = timed(spark, run_vote)
    per_q = best / nq * 1000
    print(
        f"{sf_name} knn_label_vote: n={n} nq={nq} nlist={nlist} "
        f"wall={best:.2f}s shuffle_write={sw and round(sw / 1e6, 2)}MB "
        f"ms_per_query={per_q:.2f}"
    )
spark.stop()
