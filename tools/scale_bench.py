"""sf0.1 vs sf1 scaling measurement for the 5 most expensive headline
queries: wall (warm, min of 3) + shuffle write bytes per run.

Run tools/gen_scale_slice.py first; results table -> SCALING.md."""
import json, os, sys, time, urllib.request

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from etl_to_iceberg_spark.registry import all_specs
from etl_to_iceberg_spark.session import SessionConfig, get_spark

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "merge_keyed_upsert",
    "join_multiway_star",
    "cdc_incremental_upsert",
    # r6: the iterative + text/vocabulary families and the curation composite
    "dedup_connected_components",
    "text_unigram_logprob",
    "text_ngram_topk",
    "corpus_curate_v2",
    # r6 additions: span-level dedup + chunking
    "dedup_exact_substring",
    "text_chunk_documents",
    # r8 additions: named quality rules + temperature mixture (pure
    # scans; dedup_semantic_kmeans is measured separately with nlist
    # scaled to the corpus — the registered fixture query's fixed
    # nlist=16 would just demonstrate the cluster cap at sf1)
    "text_gopher_quality",
    "corpus_temperature_sample",
    # r8 additions: DSIR importance resampling + per-doc TF-IDF keywords
    "corpus_importance_resample",
    "text_tfidf_topk",
    # r9 additions: the Gopher repetition filters (line metrics pure
    # scan; gram metrics the md5-keyed tf shape) + the C4 page/line
    # heuristics (pure scan). dedup_semantic_clusters is measured in
    # tools/semantic_scale.py with nlist scaled to the corpus, like its
    # quantizer siblings.
    "text_gopher_repetition",
    "text_c4_quality",
    # r9 additions, tranche 2: Bloom decontamination (bitset broadcast +
    # scan-side membership), tier-based token budget mix (agg+broadcast,
    # no corpus window), char-entropy filter (pure scan)
    "corpus_bloom_decontaminate",
    "corpus_token_budget_mix",
    "text_entropy_filter",
    # r9 additions, tranche 3: corpus bigram LM (vocabulary-sized tables
    # + one doc agg) and the eval-overlap contamination report
    # (decontaminate's broadcast shape, counts instead of drops).
    # similarity_ann_ivf_pq / corpus_embedding_outlier_prune are
    # measured in tools/pq_scale.py with nlist scaled to the corpus,
    # like their quantizer siblings.
    "text_bigram_logprob",
    "corpus_eval_overlap_report",
    # r12: the multimodal family — the one headline family without a 10x
    # row. features = Arrow-batched mapInPandas over binary payloads
    # (the Python-worker path's scaling is the claim under test);
    # byte_segments / frame_sample = pure Catalyst explode shapes.
    "multimodal_features",
    "multimodal_byte_segments",
    "multimodal_frame_sample",
]
# SCALE_ONLY=a,b,c restricts the run (e.g. re-measuring one new tranche
# without re-paying the whole table)
_only = os.environ.get("SCALE_ONLY")
if _only:
    QUERIES = [q for q in QUERIES if q in _only.split(",")]
SFS = {"sf0.1": os.environ.get("SCALE_SRC", "/root/testdata/sf0.1"),
       "sf1": os.environ.get("SCALE_DST", os.path.join(__import__("tempfile").gettempdir(), f"e2is-{os.getuid()}", "sf1"))}

spark = get_spark(SessionConfig(app_name="scale-bench", local_cores=32,
                                shuffle_partitions=32,
                                # sf1 broadcast builds (multiway star dims
                                # + minhash band indexes) exceed the 1g
                                # driver default once several queries'
                                # broadcasts coexist pre-GC
                                extra_conf={"spark.driver.memory": "8g"}))
spark.sparkContext.setLogLevel("ERROR")
app_id = spark.sparkContext.applicationId
ui = spark.sparkContext.uiWebUrl


def shuffle_write_bytes():
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/executors") as r:
            execs = json.load(r)
        return sum(e.get("totalShuffleWrite", 0) for e in execs)
    except Exception:
        return None


# session warmup
spark.range(1000).selectExpr("sum(id)").collect()
def _noop(batches):
    for b in batches:
        yield b
spark.range(0, 320, 1, 32).toDF("id").mapInPandas(_noop, "id long") \
    .write.format("noop").mode("overwrite").save()

from etl_to_iceberg_spark.caching import release_operator_caches

specs = all_specs()
out = {}
for sf_name, sf_dir in SFS.items():
    for q in QUERIES:
        fn = specs[q].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        release_operator_caches()  # plan-matched tracked caches would make
        # later runs of the same query read the first run's cached frame
        best, sbytes = None, None
        for _ in range(3):
            s0 = shuffle_write_bytes()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            s1 = shuffle_write_bytes()
            release_operator_caches()
            if best is None or el < best:
                best = el
                sbytes = (s1 - s0) if (s0 is not None and s1 is not None) else None
        out[(sf_name, q)] = (round(best, 3), sbytes)
        print(sf_name, q, round(best, 3), "s, shuffle", sbytes, flush=True)

print("\n| query | sf0.1 wall | sf1 wall | wall x | sf0.1 shuffle MB | sf1 shuffle MB | shuffle x |")
print("|---|---|---|---|---|---|---|")
for q in QUERIES:
    w1, b1 = out[("sf0.1", q)]
    w2, b2 = out[("sf1", q)]
    mb1 = b1 / 1e6 if b1 else float("nan")
    mb2 = b2 / 1e6 if b2 else float("nan")
    print(f"| {q} | {w1:.2f}s | {w2:.2f}s | {w2/w1:.1f}x | {mb1:.1f} | {mb2:.1f} | {mb2/mb1 if mb1 else 0:.1f}x |")
spark.stop()
