"""Generate a 10x replica of sf0.1 into $SCALE_DST (default <tmp>/e2is-<uid>/sf1).

Run: PYTHONPATH=. python tools/gen_scale_slice.py  (~1 min on local[32])

Replica i shifts every key family by a disjoint offset (joins stay
consistent), and bijectively remaps document letters per replica so
within-replica near-dup structure is preserved (translate is a bijection:
pairwise Jaccard is invariant) while cross-replica texts are unrelated —
near-dup pair count scales ~linearly, the honest scaling shape.
Dimensions (nation, region) stay fixed size, like a real 100 TB star.
"""
import os, shutil, sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE_DST", os.path.join(__import__("tempfile").gettempdir(), f"e2is-{os.getuid()}", "sf1"))
R = 10

from pyspark.sql import functions as F
from etl_to_iceberg_spark.session import SessionConfig, get_spark
from etl_to_iceberg_spark.sources.tables import load_table

spark = get_spark(SessionConfig(app_name="gen-sf1", local_cores=32,
                                shuffle_partitions=32))
spark.sparkContext.setLogLevel("ERROR")

if os.path.isdir(DST):
    shutil.rmtree(DST)
os.makedirs(DST)

O_SHIFT = 10_000_000   # orderkeys (max ~6e5; merge inserts add 1e8 on top)
C_SHIFT = 1_000_000    # custkeys (max ~1.5e4)
S_SHIFT = 100_000      # suppkeys (max ~1e3)
P_SHIFT = 1_000_000    # partkeys (max ~2e4)
E_SHIFT = 10_000_000   # event ids
U_SHIFT = 1_000_000    # user ids
D_SHIFT = 1_000_000    # doc ids

LET = "etaoinsrhldcum"


def rot(s, i):
    return s[i % len(s):] + s[: i % len(s)]


def replicate(name, shifts, extra=None, files=8):
    src = load_table(spark, SRC, name)
    parts = []
    for i in range(R):
        df = src
        for col, shift in shifts.items():
            df = df.withColumn(col, F.col(col) + F.lit(i * shift))
        if extra is not None:
            df = extra(df, i)
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(files).write.mode("overwrite").parquet(
        os.path.join(DST, f"{name}.parquet")
    )
    print(name, "rows:", spark.read.parquet(os.path.join(DST, f"{name}.parquet")).count())


def perturb_text(df, i):
    if i == 0:
        return df
    m = rot(LET, i)
    return df.withColumn(
        "text", F.translate("text", LET + LET.upper(), m + m.upper())
    )


replicate("orders", {"o_orderkey": O_SHIFT, "o_custkey": C_SHIFT})
replicate("lineitem", {"l_orderkey": O_SHIFT, "l_partkey": P_SHIFT,
                       "l_suppkey": S_SHIFT}, files=16)
replicate("customer", {"c_custkey": C_SHIFT})
replicate("supplier", {"s_suppkey": S_SHIFT})
replicate("part", {"p_partkey": P_SHIFT})
replicate("events", {"event_id": E_SHIFT, "user_id": U_SHIFT})
replicate("documents", {"doc_id": D_SHIFT}, extra=perturb_text)

for dim in ("nation", "region", "embeddings"):
    load_table(spark, SRC, dim).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(DST, f"{dim}.parquet")
    )
    print(dim, "copied")
print("done ->", DST)
spark.stop()
