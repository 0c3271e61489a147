"""Rounds-to-converge for dedup_connected_components at sf0.1 vs sf1.

Complements tools/scale_bench.py (wall + shuffle bytes): the iterative
operator's scaling story also needs the ROUND count — pointer doubling
promises O(log diameter), so 10x the data (10 key-shifted replicas, i.e.
10x the components at the same per-component diameter) must NOT grow the
round count. Run after tools/gen_scale_slice.py.
"""
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.dedup import connected_components
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sources.tables import load_table

SFS = {"sf0.1": os.environ.get("SCALE_SRC", "/root/testdata/sf0.1"),
       "sf1": os.environ.get("SCALE_DST", os.path.join(__import__("tempfile").gettempdir(), f"e2is-{os.getuid()}", "sf1"))}

spark = get_spark(SessionConfig(app_name="cc-rounds", local_cores=32,
                                shuffle_partitions=32))
spark.sparkContext.setLogLevel("ERROR")

for sf_name, sf_dir in SFS.items():
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("src"),
                    F.col("source").alias("s1"), F.col("n_chars").alias("l1"))
    b = docs.select(F.col("doc_id").alias("dst"),
                    F.col("source").alias("s2"), F.col("n_chars").alias("l2"))
    edges = (
        a.join(b, F.col("s1") == F.col("s2"))
        .where((F.abs(F.col("l1") - F.col("l2")) <= 2)
               & (F.col("src") < F.col("dst")))
        .select("src", "dst")
    )
    n_edges = edges.count()
    stats: dict = {}
    t0 = time.perf_counter()
    out = connected_components(edges, docs, id_col="doc_id", stats=stats)
    n_clusters = out.select("cluster_id").distinct().count()
    wall = time.perf_counter() - t0
    print(f"{sf_name}: rounds={stats['rounds']} wall={wall:.1f}s "
          f"nodes={docs.count()} edges={n_edges} clusters={n_clusters}",
          flush=True)
spark.stop()
