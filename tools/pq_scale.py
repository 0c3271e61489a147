"""sf0.1 vs 10x scaling measurement for the IVF-PQ search and the
embedding outlier report, with nlist scaled to the corpus (the same
posture as tools/semantic_scale.py: E[cell size] stays ~constant, so
candidates per query are flat and total ADC work is query-linear).
Codebook/quantizer training runs OUTSIDE the timed loop — both are
stored tables in deployment (the sidecar convention) — and PQ training
cost is CONSTANT by construction (a bounded 256-row sample regardless
of corpus size).

Uses tools/_scale_common.replicate_embeddings (the single copy of the
seeded sign-flip replication: within-replica cosines invariant,
cross-replica ~0). Results rows -> SCALING.md.
"""
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.similarity import (
    _to_double,
    embedding_outlier_report,
    ivf_kmeans_centroids,
    pq_adc_topk,
    pq_train_codebooks,
)
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sidecars import sidecar_path
from tools._scale_common import ensure_replica, replicate_embeddings, timed
from etl_to_iceberg_spark.sources.tables import load_table

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")

spark = get_spark(
    SessionConfig(
        app_name="pq-scale",
        local_cores=32,
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

base = load_table(spark, SRC, "embeddings")
# uid-scoped AND keyed by SRC (ADVICE r13): a replica built from one
# scale factor must never be silently reused for another — the unkeyed
# sidecar_base()/"sf1_embeddings" path would serve a stale replica when
# SCALE_SRC changes.
_emb10_path = sidecar_path("sf1_embeddings", SRC)
ensure_replica(_emb10_path, lambda: replicate_embeddings(base, 10))

for sf_name, (emb, nlist) in {
    "sf0.1": (base.select("vec_id", "embedding"), 16),
    "sf1 (10x)": (spark.read.parquet(_emb10_path), 160),
}.items():
    n = emb.count()
    cents = ivf_kmeans_centroids(emb, nlist=nlist, train_fraction=0.5)
    cents = spark.createDataFrame(cents.collect(), cents.schema)  # pin rows
    t0 = time.perf_counter()
    cbs = pq_train_codebooks(emb, m=8, dsub=8, ksub=16, train_rows=256)
    cbs = spark.createDataFrame(cbs.collect(), cbs.schema)
    train_s = time.perf_counter() - t0
    c = emb.select("vec_id", _to_double("embedding").alias("__v"))
    q = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("__v")
    )
    nq = q.count()

    def run_pq():
        pq_adc_topk(
            c, q, cents, cbs, k=10, nprobe=4, m=8, dsub=8, rerank=64
        ).write.format("noop").mode("overwrite").save()

    best, sw = timed(spark, run_pq)
    print(
        f"{sf_name} ann_ivf_pq: n={n} nq={nq} nlist={nlist} "
        f"train={train_s:.2f}s wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 2)}MB"
    )

    # r12: the refine-less production composition
    # (similarity_ann_ivf_pq_residual_two_level) — residual codebooks
    # against THIS corpus's scaled quantizer, pure ADC, routing
    # two-level at nlist>=64. Same constant-training posture.
    t0 = time.perf_counter()
    cbs_res = pq_train_codebooks(
        emb, m=8, dsub=8, ksub=16, train_rows=256, centroids=cents
    )
    cbs_res = spark.createDataFrame(cbs_res.collect(), cbs_res.schema)
    train_res_s = time.perf_counter() - t0

    def run_res2l():
        pq_adc_topk(
            c, q, cents, cbs_res, k=10, nprobe=4, m=8, dsub=8, residual=True
        ).write.format("noop").mode("overwrite").save()

    best, sw = timed(spark, run_res2l)
    print(
        f"{sf_name} ann_ivfadc (residual, pure ADC): n={n} nq={nq} "
        f"nlist={nlist} train={train_res_s:.2f}s wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 2)}MB"
    )

    # Two-level assignment audit (r11, the n×nlist fix): scored
    # cells/vector, plus recall@10 of the full search two-level vs
    # FLAT assignment on a 50-query sample against exact bruteforce.
    import functools
    import math

    import etl_to_iceberg_spark.ext.similarity as S
    from etl_to_iceberg_spark.ext.similarity import cosine_topk

    if nlist >= 64:
        cellmap, supers = S._super_quantizer(cents)
        from collections import Counter

        sizes = Counter(s for _, s in cellmap)
        nsuper = len(supers)
        avg_children = sum(sizes.values()) / nsuper
        per_vec = nsuper + 4 * avg_children
        print(
            f"{sf_name} assign work/vector: flat={nlist} cells, "
            f"two-level={per_vec:.0f} (nsuper={nsuper} + 4 probes x "
            f"{avg_children:.1f} avg children) = {nlist / per_vec:.1f}x less"
        )
    qs = q.limit(50).cache()
    qs.count()
    exact = cosine_topk(
        emb, qs.withColumn("embedding", F.col("__v")), k=10
    ).cache()
    nq_s = exact.select("query_id").distinct().count()
    orig_assign = S.ivf_assign
    for label, fn in (
        ("two-level", orig_assign),
        ("flat", functools.partial(orig_assign, two_level_min_nlist=10**9)),
    ):
        S.ivf_assign = fn
        t0 = time.perf_counter()
        approx = pq_adc_topk(
            c, qs, cents, cbs, k=10, nprobe=4, m=8, dsub=8, rerank=64
        )
        hits = approx.join(exact, on=["query_id", "vec_id"]).count()
        wall_r = time.perf_counter() - t0
        print(
            f"{sf_name} recall@10 ({label} assign): "
            f"{hits / (nq_s * 10):.3f} wall={wall_r:.2f}s"
        )
    S.ivf_assign = orig_assign
    exact.unpersist()
    qs.unpersist()

    def run_outlier():
        embedding_outlier_report(
            emb, cents, margin=0.1
        ).write.format("noop").mode("overwrite").save()

    best, sw = timed(spark, run_outlier)
    flagged = (
        embedding_outlier_report(emb, cents, margin=0.1)
        .where("is_outlier")
        .count()
    )
    print(
        f"{sf_name} outlier_prune: n={n} nlist={nlist} wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 2)}MB flagged={flagged}"
    )
spark.stop()
