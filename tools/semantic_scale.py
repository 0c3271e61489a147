"""sf0.1 vs sf1 scaling measurement for semantic dedup, with nlist
scaled to the corpus (the documented 100 TB posture: E[cluster size]
stays ~constant, so the per-cluster quadratic term is bounded). The
registered fixture query keeps nlist=16, which at sf1 would mostly
demonstrate the cluster cap instead of the pairing cost — this script
measures the shape a deployment actually runs.

Run tools/gen_scale_slice.py first; results row -> SCALING.md.
"""
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.similarity import (
    ivf_kmeans_centroids,
    knn_graph,
    semantic_clusters,
    semantic_dedup_pairs,
)
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sidecars import sidecar_path
from tools import _scale_common
from etl_to_iceberg_spark.sources.tables import load_table

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")


spark = get_spark(
    SessionConfig(
        app_name="semantic-scale",
        local_cores=32,
        shuffle_partitions=32,
        # the sf1 composite's fixpoint accumulates plan/broadcast state
        # beyond the 1g driver default (same lesson as scale_bench)
        extra_conf={"spark.driver.memory": "8g"},
    )
)
spark.sparkContext.setLogLevel("ERROR")

def shuffle_write_bytes():
    return _scale_common.shuffle_write_bytes(spark)


def replicate_embeddings(emb, r):
    # Sign-flip scheme shared with the other scale scripts; see
    # tools/_scale_common.replicate_embeddings for why sign patterns
    # (an orthogonal transform) rather than a plain rotation: they keep
    # within-replica cosines invariant while cross-replica cosines
    # cancel even for the fixture's STRUCTURED label clusters.
    return _scale_common.replicate_embeddings(emb, r)


spark.range(1000).selectExpr("sum(id)").collect()

base = load_table(spark, SRC, "embeddings")
# Materialize the 10x replica to parquet and read it back rather than
# localCheckpoint: an RDD-scan leaf carries Catalyst's DEFAULT size
# estimate (effectively unbounded), and the clusters composite's nested
# join estimation multiplies those defaults into BigIntegers until the
# driver heap dies (the watchpoint-9 mechanism, triggered by leaf stats
# rather than plan depth). A parquet leaf has real stats — and a stored
# table is the deployment shape for a corpus anyway.
# Keyed by SRC (ADVICE r13, the sidecar_path scheme): the replica dir
# must be a function of the scale factor it was built from, so changing
# SCALE_SRC can never silently reuse another run's replica. Content is
# deterministic by (SRC, seed), so sharing the key with pq_scale.py's
# cached copy is safe; the _SUCCESS-guarded build (ADVICE r14) makes
# the reuse safe against a partial dir from an interrupted write.
_emb10_path = sidecar_path("sf1_embeddings", SRC)
_scale_common.ensure_replica(
    _emb10_path, lambda: replicate_embeddings(base, 10)
)
for sf_name, (emb, nlist) in {
    "sf0.1": (base, 16),
    "sf1 (10x)": (spark.read.parquet(_emb10_path), 160),
}.items():
    n = emb.count()
    # the quantizer is a stored table in deployment: train once, outside
    # the timed loop (similarity_ivf_kmeans's sidecar convention)
    cents = ivf_kmeans_centroids(emb, nlist=nlist, train_fraction=0.5)
    cents = spark.createDataFrame(cents.collect(), cents.schema)  # pin rows

    # Scored-pair volume (VERDICT r11 #6): every consumer below scores
    # all within-cell pairs of the CAPPED assignment — Σ C(n_cell, 2) is
    # the work denominator that separates pair-volume growth (the
    # quantizer fitting real structure as nlist scales — desirable) from
    # per-pair runtime cost (a regression). Report wall ÷ Mpairs so the
    # next 10× factor is attributable to one or the other.
    from etl_to_iceberg_spark.ext.similarity import _to_double, ivf_assign

    _assigned = ivf_assign(
        emb.select("vec_id", _to_double("embedding").alias("__v")),
        cents, id_col="vec_id", with_vector=False,
    )
    _hist = _assigned.groupBy("cell").count().where(F.col("count") <= 256)
    # coalesce: sum() is NULL when no cell passes the cap filter (a
    # degenerate quantizer fit shouldn't abort the sweep), and the
    # denominator is 0 when every kept cell is a singleton — report
    # 'n/a' for the ratio instead of dividing by zero.
    scored_pairs = int(
        _hist.selectExpr(
            "coalesce(sum(count * (count - 1) / 2), 0) AS p"
        ).collect()[0]["p"]
    )

    def per_mpair(wall):
        if scored_pairs == 0:
            return "n/a"
        return round(wall / (scored_pairs / 1e6), 2)

    def run():
        semantic_dedup_pairs(
            emb, cents, threshold=0.3, max_cluster_size=256
        ).write.format("noop").mode("overwrite").save()

    run()  # warm
    best, sw = None, None
    for _ in range(3):
        s0 = shuffle_write_bytes()
        t0 = time.perf_counter()
        run()
        el = time.perf_counter() - t0
        if best is None or el < best:
            best = el
            s1 = shuffle_write_bytes()
            sw = None if (s0 is None or s1 is None) else s1 - s0
        else:
            shuffle_write_bytes()
    pairs = semantic_dedup_pairs(
        emb, cents, threshold=0.3, max_cluster_size=256
    ).count()
    print(
        f"{sf_name}: n={n} nlist={nlist} wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 1)}MB pairs={pairs} "
        f"scored_pairs={scored_pairs} s_per_Mpair={per_mpair(best)}"
    )

    # kNN graph over the same corpus + quantizer (the third consumer of
    # the stored centroid table) — same nlist-scales-with-corpus posture
    def run_knn():
        knn_graph(
            emb, cents, k=3, max_cluster_size=256
        ).write.format("noop").mode("overwrite").save()

    run_knn()  # warm
    best, sw = None, None
    for _ in range(3):
        s0 = shuffle_write_bytes()
        t0 = time.perf_counter()
        run_knn()
        el = time.perf_counter() - t0
        if best is None or el < best:
            best = el
            s1 = shuffle_write_bytes()
            sw = None if (s0 is None or s1 is None) else s1 - s0
        else:
            shuffle_write_bytes()
    edges = knn_graph(emb, cents, k=3, max_cluster_size=256).count()
    print(
        f"{sf_name} knn_graph: n={n} nlist={nlist} wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 1)}MB edges={edges} "
        f"s_per_Mpair={per_mpair(best)}"
    )

    # r9: the full composite — mutual-kNN edges + connected components.
    # The fixpoint executes eagerly inside the call, so wall measures the
    # whole pipeline; rounds-to-converge is the scale-invariance claim.
    st = {}

    def run_clusters():
        semantic_clusters(
            emb, cents, k=3, threshold=0.3, max_cluster_size=256,
            stats=st,
        ).write.format("noop").mode("overwrite").save()

    run_clusters()  # warm
    best, sw = None, None
    for _ in range(3):
        s0 = shuffle_write_bytes()
        t0 = time.perf_counter()
        run_clusters()
        el = time.perf_counter() - t0
        if best is None or el < best:
            best = el
            s1 = shuffle_write_bytes()
            sw = None if (s0 is None or s1 is None) else s1 - s0
        else:
            shuffle_write_bytes()
    res = semantic_clusters(
        emb, cents, k=3, threshold=0.3, max_cluster_size=256
    )
    agg = res.selectExpr(
        "count(*) AS n",
        "count(DISTINCT cluster_id) AS clusters",
        "sum(CASE WHEN NOT is_canonical THEN 1 ELSE 0 END) AS dropped",
    ).collect()[0]
    print(
        f"{sf_name} semantic_clusters: n={n} nlist={nlist} wall={best:.2f}s "
        f"shuffle_write={sw and round(sw / 1e6, 1)}MB "
        f"clusters={agg.clusters} dropped={agg.dropped} "
        f"cc_rounds={st.get('rounds')} s_per_Mpair={per_mpair(best)}"
    )
