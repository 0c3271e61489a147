"""Recall@10 for the ANN paths (lsh_topk multiprobe grid, ivf_topk grid)
vs the exact bruteforce baseline, on a 10x replica of the sf0.1
embeddings (~20k vectors, 64-dim) — VERDICT r7 #7: measure approximation
quality like the cost claims, not just the >=0.2 fixture floor.

Two corpus regimes, because recall depends on data geometry, not just
parameters:

- ``neardup``: 10x id-shifted replicas, replicas i>0 multiplicatively
  perturbed (deterministic +-2% per element) — every vector has 9
  near-clones at cosine ~0.9996. This is the training-data regime the
  engine targets (embedding near-dup retrieval): true neighbors are
  MUCH closer than random points, the case LSH/IVF are built for.
- ``isotropic``: the raw sf0.1 embeddings (one copy, 2k vectors) —
  i.i.d. random components, so a query's "top-10" are barely closer
  than the bulk (cosine ~0.3-0.44). The pessimal regime: no geometry
  for any sublinear index to exploit.

Also reports the measured candidate fraction (scored candidate rows /
(n_queries * corpus)) so recall is judged against its cost — recall 1.0
at fraction 1.0 is just bruteforce with extra steps.

Run: PYTHONPATH=. python tools/ann_recall.py   (~4 min on local[32])
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from etl_to_iceberg_spark.ext.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    lsh_topk,
    rp_lsh_buckets,
)
from etl_to_iceberg_spark.session import SessionConfig, get_spark  # noqa: E402
from etl_to_iceberg_spark.sources.tables import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 50

spark = get_spark(SessionConfig(app_name="ann-recall", local_cores=32,
                                shuffle_partitions=32))
spark.sparkContext.setLogLevel("ERROR")

emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")


def perturbed_replicas(df, copies=10, eps=0.02):
    """id-shifted replicas; replica i>0 scales element d by
    1 + eps*sign(LCG(i*64+d) bit 16) — deterministic, cosine(original,
    replica) ~= 1 - eps^2/2, so replicas are genuine near-dups."""
    parts = []
    for i in range(copies):
        p = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        if i > 0:
            p = p.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, d: x.cast("double")
                    * (
                        1
                        + F.lit(eps)
                        * F.when(
                            F.shiftright(
                                (F.lit(i * 64).cast("long") + d)
                                * F.lit(1103515245)
                                + F.lit(12345),
                                16,
                            ).bitwiseAND(F.lit(1))
                            == 1,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                    ),
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def recall_at_k(approx, exact):
    """mean over queries of |approx_topk ∩ exact_topk| / k."""
    hit = approx.join(exact, on=["query_id", "vec_id"], how="inner")
    per_q = hit.groupBy("query_id").count()
    n = exact.select("query_id").distinct().count()
    total = per_q.agg(F.sum("count")).collect()[0][0] or 0
    return total / (n * K)


def lsh_candidate_fraction(corpus, queries, planes, probes):
    masks = [0] + [1 << p for p in range(planes)] + [
        (1 << a) | (1 << b)
        for a in range(planes)
        for b in range(a + 1, planes)
    ]
    cb = rp_lsh_buckets(corpus, planes=planes, dim=64)
    qb = rp_lsh_buckets(
        queries.withColumnRenamed("query_id", "__qid"),
        id_col="__qid", planes=planes, dim=64,
    ).select(
        "__qid",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m))
                      for m in masks[:probes]])
        ).alias("bucket"),
    )
    n_c = corpus.count()
    n_q = queries.count()
    return cb.join(qb, on="bucket").count() / (n_c * n_q)


def clustered(df, n_clusters=40, noise=0.35):
    """Genuine cluster structure — the regime where PQ COMPRESSION error
    (not routing) binds, i.e. where residual encoding must show up:
    vector i = center[i % n_clusters] + noise·(its own raw embedding).
    Cells are tight, so x − centroid has far lower variance than x; raw
    codebooks waste their 2^bits entries spanning the center spread."""
    centers = (
        df.where(F.col("vec_id") < n_clusters)
        .select(F.col("vec_id").alias("__cid"), F.col("embedding").alias("__c"))
    )
    return (
        df.withColumn("__cid", F.col("vec_id") % n_clusters)
        .join(F.broadcast(centers), on="__cid")
        .select(
            "vec_id",
            F.zip_with(
                "__c",
                "embedding",
                lambda c, e: c.cast("double") + F.lit(noise) * e.cast("double"),
            ).alias("embedding"),
        )
    )


results = {}
for regime, corpus in (
    ("neardup", perturbed_replicas(emb).cache()),
    ("isotropic", emb.cache()),
    ("clustered", clustered(emb).cache()),
):
    n = corpus.count()
    queries = (
        corpus.where(F.col("vec_id") % (n // N_QUERIES) == 0)
        .limit(N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .cache()
    )
    queries.count()
    exact = cosine_topk(corpus, queries, k=K).cache()
    exact.count()

    for planes in (4, 6, 8):
        max_probes = 1 + planes + planes * (planes - 1) // 2
        for probes in sorted({1, planes + 1, max_probes}):
            t0 = time.perf_counter()
            approx = lsh_topk(corpus, queries, k=K, planes=planes,
                              probes=probes)
            r = recall_at_k(approx, exact)
            wall = time.perf_counter() - t0
            frac = lsh_candidate_fraction(corpus, queries, planes, probes)
            key = f"{regime}/lsh p{planes} probes{probes}"
            results[key] = {"recall": round(r, 3),
                            "cand_frac": round(frac, 4),
                            "wall_s": round(wall, 2)}
            print(key, results[key], flush=True)

    for nlist, nprobe in ((16, 2), (16, 4), (64, 8), (64, 16)):
        t0 = time.perf_counter()
        approx = ivf_topk(corpus, queries, k=K, nlist=nlist, nprobe=nprobe)
        r = recall_at_k(approx, exact)
        wall = time.perf_counter() - t0
        key = f"{regime}/ivf nlist{nlist} nprobe{nprobe}"
        results[key] = {"recall": round(r, 3),
                        "cand_frac": round(nprobe / nlist, 4),
                        "wall_s": round(wall, 2)}
        print(key, results[key], flush=True)

    # IVF-PQ (r9): same routing cost axis as ivf (cand_frac =
    # nprobe/nlist), but candidates scored from 8-byte codes; the
    # rerank row shows what the exact-cosine refine of the ADC top-64
    # shortlist recovers (compression error decides the shortlist,
    # never the final order).
    from etl_to_iceberg_spark.ext.similarity import (
        _to_double,
        ivf_kmeans_centroids,
        pq_adc_topk,
        pq_train_codebooks,
    )

    nlist, nprobe = 64, 8
    cents = ivf_kmeans_centroids(corpus, nlist=nlist, train_fraction=0.5)
    cents = spark.createDataFrame(cents.collect(), cents.schema)
    c = corpus.select("vec_id", _to_double("embedding").alias("__v"))
    qv = queries.select("query_id", _to_double("embedding").alias("__v"))
    for residual in (False, True):
        cbs = pq_train_codebooks(corpus, m=8, dsub=8, ksub=16,
                                 train_rows=256,
                                 centroids=cents if residual else None)
        cbs = spark.createDataFrame(cbs.collect(), cbs.schema)
        for rerank in (None, 64):
            t0 = time.perf_counter()
            approx = pq_adc_topk(c, qv, cents, cbs, k=K, nprobe=nprobe,
                                 m=8, dsub=8, rerank=rerank,
                                 residual=residual)
            r = recall_at_k(approx, exact)
            wall = time.perf_counter() - t0
            key = (f"{regime}/ivfpq{'-res' if residual else ''} "
                   f"nlist{nlist} nprobe{nprobe} rerank{rerank or 0}")
            results[key] = {"recall": round(r, 3),
                            "cand_frac": round(nprobe / nlist, 4),
                            "wall_s": round(wall, 2)}
            print(key, results[key], flush=True)

    exact.unpersist()
    queries.unpersist()
    corpus.unpersist()

print(json.dumps(results))
spark.stop()
