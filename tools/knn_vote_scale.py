"""sf0.1 vs 10x scaling for the kNN label-vote scorer, nlist scaled to
the corpus (the quantizer-family posture: E[cell] constant, so
candidates per query stay flat and total scoring work is query-linear).
Replication reuses pq_scale's sign-flip scheme; labels replicate with
their vector (a replica is the same labeled point in a rotated basis).
Results row -> SCALING.md.
"""
import json
import os
import sys
import time
import urllib.request

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
from etl_to_iceberg_spark.sidecars import sidecar_base
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
app_id = spark.sparkContext.applicationId
ui = spark.sparkContext.uiWebUrl


def shuffle_write_bytes():
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/executors"
        ) as r:
            return sum(e.get("totalShuffleWrite", 0) for e in json.load(r))
    except Exception:
        return None


def timed(run):
    run()
    best, sw = None, None
    for _ in range(3):
        s0 = shuffle_write_bytes()
        t0 = time.perf_counter()
        run()
        el = time.perf_counter() - t0
        s1 = shuffle_write_bytes()
        if best is None or el < best:
            best = el
            sw = None if (s0 is None or s1 is None) else s1 - s0
    return best, sw


def replicate_labeled(emb, r):
    """pq_scale's orthogonal sign-flip replication, keeping label."""
    import random

    d = 64
    parts = []
    for i in range(r):
        rng = random.Random(9000 + i)
        signs = F.array(
            *[F.lit(1.0 if (i == 0 or rng.random() < 0.5) else -1.0)
              for _ in range(d)]
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    signs,
                    lambda x, s: x * s,
                ).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


spark.range(1000).selectExpr("sum(id)").collect()

base = load_table(spark, SRC, "embeddings")
_lab10_path = os.path.join(sidecar_base(), "sf1_embeddings_labeled")
if not os.path.isdir(_lab10_path):
    replicate_labeled(base, 10).write.mode("overwrite").parquet(_lab10_path)

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
        cand = (
            ia.join(F.broadcast(qa), on="cell")
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
                F.broadcast(
                    qry.select(
                        F.col("vec_id").alias("query_id"),
                        _to_double("embedding").alias("__qv"),
                    )
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

    best, sw = timed(run_vote)
    per_q = best / nq * 1000
    print(
        f"{sf_name} knn_label_vote: n={n} nq={nq} nlist={nlist} "
        f"wall={best:.2f}s shuffle_write={sw and round(sw / 1e6, 2)}MB "
        f"ms_per_query={per_q:.2f}"
    )
spark.stop()
