"""Physical-plan assertions: the optimizations SURVEY §4 promises must
actually appear in the executed plans — pushdown, pruning, broadcast,
top-k, and no accidental cartesian products."""

from __future__ import annotations

import pytest

from etl_to_iceberg_spark.plans import explain_str
from etl_to_iceberg_spark.registry import all_specs

_SPECS = all_specs()


def _plan(spark, sf_dir, name) -> str:
    return explain_str(_SPECS[name].fn(spark, sf_dir), "formatted")


def test_explode_expensive_evaluates_tokenizer_once(spark, sf_dir):
    """Regression guard for the r6 generator-input fix: an inner explode
    over a tokenizer-derived array lets InferFiltersFromGenerate push a
    size()>0 filter below the projection with the whole expression
    inlined — the regex then re-runs per array index (profiled 17x on the
    decontamination stage). explode_expensive must keep the optimized
    plan at exactly ONE tokenizer evaluation."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.pipeline_queries import (
        _SHINGLE,
        _shingles,
        explode_expensive,
    )
    from etl_to_iceberg_spark.ext.text import words
    from etl_to_iceberg_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # plain token explode
    ex = explode_expensive(docs, ["doc_id"], words("text"), "token")
    plan = ex._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_extract_all") == 1, plan

    # shingle explode over a materialized token column (the curate shape)
    toks = docs.select("doc_id", words("text").alias("__t"))
    sh = toks.select("doc_id", _shingles(F.col("__t"), _SHINGLE).alias("sh"))
    ex2 = explode_expensive(sh, ["doc_id"], F.col("sh"), "s")
    plan2 = ex2._jdf.queryExecution().optimizedPlan().toString()
    assert plan2.count("regexp_extract_all") == 1, plan2


def test_projection_prunes_scan_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "project_columns")
    # ReadSchema carries only the 3 projected columns of 5
    assert "c_custkey" in plan and "c_acctbal" in plan
    assert "c_mktsegment" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_where")
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "c_acctbal" in pushed and "c_nationkey" in pushed


def test_q1_filter_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_orders_customer")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact table must not shuffle


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_multiway_star")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_sum_groupby")
    # partial + final HashAggregate pair => map-side combine is in place
    assert plan.count("HashAggregate") >= 2


def test_lsh_candidates_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anti_join_stays_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "anti_join_new_files")
    assert "LeftAnti" in plan


def test_q18_having_subquery_single_lineitem_shuffle_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q18_large_orders")
    # qualifying-key set and customer side broadcast; top-100 is TakeOrdered
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q19_quantity_envelope_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    # the OR-of-ANDs must reach the lineitem scan as a pushed filter on
    # l_quantity (Catalyst factors the 1..30 envelope / per-branch Or)
    pushed = plan.split("PushedFilters:")[1]
    assert "l_quantity" in pushed.splitlines()[0] or "Or(" in pushed.splitlines()[0]
    assert "BroadcastHashJoin" in plan


def test_q4_semi_join_no_row_multiplication(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    # quarter filter reaches the orders parquet scan
    assert "o_orderdate" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_q22_scalar_threshold_is_broadcast_not_collected(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q22_dormant_customers")
    # one-row average joins in via broadcast; dormancy test is an anti join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def _scan_nodes(plan: str) -> int:
    """Number of scan nodes in a formatted plan (each node is listed in
    the tree AND the details section — count the numbered detail lines)."""
    import re

    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def test_q17_uses_window_not_self_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    # the correlated per-part average must compile to a Window over ONE
    # lineitem scan, not a second scan + self-join
    assert "Window" in plan
    assert _scan_nodes(plan) <= 2  # lineitem + part, no 2nd lineitem


def test_q21_single_grouped_pass_no_correlated_rescans(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_suppliers_kept_waiting")
    # the double-EXISTS rewrite reads lineitem twice (late lines +
    # per-order profile) — the textbook correlated form would read it 3×
    assert _scan_nodes(plan) <= 7
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivf_seeding_is_take_ordered_not_global_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "similarity_ann_ivf")
    # centroid seeding must be orderBy().limit(nlist) = TakeOrderedAndProject
    # (distributed per-partition top-n), not a row_number window that funnels
    # the whole corpus through one task
    assert "TakeOrderedAndProject" in plan


def test_q2_min_cost_is_one_window_with_broadcast_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    # correlated min-cost subquery compiled to ONE window over the filtered
    # partsupp; supplier/nation/region/part all broadcast
    assert "Window" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q20_preaggregates_lineitem_before_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q20_promotion_suppliers")
    # the year filter must reach the lineitem scan, and the only full-fact
    # shuffle is the (partkey, suppkey) pre-aggregation
    pushed_sections = [
        seg.splitlines()[0] for seg in plan.split("PushedFilters:")[1:]
    ]
    assert any("l_shipdate" in p for p in pushed_sections)
    assert plan.count("HashAggregate") >= 2  # partial+final pre-agg


def test_q11_threshold_is_broadcast_single_derivation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q11_important_stock")
    # the 0.1% threshold joins in as a broadcast 1-row agg, never a collect
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q16_exclusion_is_broadcast_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_part_counts")
    # NOT IN (negative-balance suppliers) must compile to a broadcast anti
    # join; the distinct-count agg is the only shuffle
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_decontaminate_is_all_broadcast_no_text_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_decontaminate")
    # Benchmark shingles + contaminated-id exclusion both broadcast; the
    # corpus never sort-merge-joins (its text would enter the exchange).
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ngram_topk_partial_agg_and_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_ngram_topk")
    # Map-side partial collapse before the exchange; top-k never sorts
    # globally.
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_retention_cohort_single_user_shuffle_before_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_retention_cohort")
    # min-over-window computes the cohort inline, so the whole query is
    # two exchanges (window on user_id + final distinct agg) and NO join —
    # the naive first-events-aggregate + self-join shape would show a
    # third exchange and a join operator.
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Exchange") == 2, tree
    assert "Join" not in plan


def test_ingest_scans_have_no_infer_pass(spark, sf_dir):
    # Explicit schemas: the JSON/CSV relation appears once — scan only,
    # no second inference job is encoded in the plan.
    for name in ("scan_jsonl_docs", "scan_csv_typed"):
        plan = _plan(spark, sf_dir, name)
        assert "Scan json" in plan or "Scan csv" in plan


def test_curate_v2_decontamination_stays_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_curate_v2")
    # The added decontamination stage must not change the pipeline's
    # shuffle character: corpus text enters no sort-merge join.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_delta_cursor_filter_is_pushed_to_scan(spark, sf_dir, tmp_path):
    """The steady-state CDC tick must restrict the SOURCE SCAN by the
    persisted cursor — a pushed ts filter, not a post-scan one: at 100 TB
    the delta read prunes row groups at the reader, so the tick costs
    O(delta), not O(table). Guards the clone-carries-cursor fix: without
    a cursor the plan shows no pushed ts bound at all."""
    import datetime as dt

    from etl_to_iceberg_spark.operators.cdc import CdcPipeline, CursorStore
    from etl_to_iceberg_spark.plans import explain_str
    from etl_to_iceberg_spark.sources.tables import load_table
    from etl_to_iceberg_spark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    store = CursorStore(cat)
    store.set("sales", "events", last_timestamp=dt.datetime(2024, 1, 15))
    pipe = CdcPipeline(
        cat, source_schema="sales", source_table="events",
        target_identifier="sales.sync", ts_col="ts", cursor_store=store,
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    plan = explain_str(pipe.read_delta(ev), "formatted")
    assert "PushedFilters:" in plan, "no PushedFilters section in plan at all"
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThan(ts" in pushed


def test_tfidf_topk_window_group_limit_and_broadcast_df(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_tfidf_topk")
    # The per-doc top-3 must be rank-limited BEFORE the window exchange as
    # well as after it (WindowGroupLimit twice), so no task ever holds more
    # than a doc's distinct terms; the df side joins broadcast, and nothing
    # degenerates to a sort-merge join or cartesian over (doc, term) rows.
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_importance_resample_shuffles_are_keyed_not_corpus(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_importance_resample")
    # Both unigram models come out of ONE vocabulary aggregate (partial +
    # final HashAggregate pairs), the smoothing totals and the threshold
    # are one-row broadcasts, and no join degenerates to cartesian/SMJ —
    # document text never enters an exchange.
    assert plan.count("HashAggregate") >= 4, plan
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # every Exchange carries agg/window keys, never a raw text column
    # (hashpartitioning on doc_id/lang/token only)
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args, args


def test_knn_graph_broadcast_assign_and_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "similarity_knn_graph")
    # quantizer assignment must be scan x broadcast; the per-vector top-k
    # must be rank-limited on both sides of the window exchange; the
    # within-cell self-join must be an equi-join, never cartesian.
    assert "BroadcastExchange" in plan
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "CartesianProduct" not in plan


def test_semantic_clusters_edge_stage_plan(spark, sf_dir):
    """dedup_semantic_clusters up to (not including) the component
    fixpoint, composed exactly as similarity.semantic_clusters does:
    quantizer assignment broadcast, WindowGroupLimit-bounded top-k, and
    the mutual-kNN filter as ONE aggregation over the unordered pair —
    no self-join of the directed graph (the joined form nested the knn
    plan on both sides and blew up Catalyst's size-only stats estimation
    at 10×), so exactly one join (the cell-bounded knn pairing) and
    never a cartesian. (The fixpoint itself executes eagerly
    driver-side, so its rounds are pinned by the connected-components
    tests, not a plan string.)"""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.corpus_queries import _ivfk_centroids
    from etl_to_iceberg_spark.ext.similarity import knn_graph
    from etl_to_iceberg_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, _ivfk_centroids(spark, sf_dir), k=3, max_cluster_size=256
    )
    mutual = (
        g.select(
            F.least("vec_id", "nbr_id").alias("src"),
            F.greatest("vec_id", "nbr_id").alias("dst"),
            "cos_sim",
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("__n"), F.max("cos_sim").alias("__c"))
        .where((F.col("__n") == 2) & (F.col("__c") >= 0.3))
        .select("src", "dst")
    )
    plan = explain_str(mutual, "formatted")
    assert "BroadcastExchange" in plan
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "CartesianProduct" not in plan
    # the mutual filter is a two-phase agg, and no join type appears
    # more than once — the knn pairing is the only join of each kind
    assert plan.count("HashAggregate") >= 2, plan
    for jt in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert explain_str(mutual, "simple").count(jt) <= 1, jt


def test_entropy_filter_fixed_width_exchanges(spark, sf_dir):
    """text_entropy_filter is histogram-by-explode: a Generate feeding a
    partial+final count (map-side combine bounds shuffle rows at
    alphabet-size per doc), a doc-partitioned window, and the empty-doc
    restore join — every hash exchange carries (doc_id, char, count)-
    width rows, never text."""
    plan = _plan(spark, sf_dir, "text_entropy_filter")
    assert "Generate" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args, args


def test_token_budget_mix_tier_window_not_corpus_window(spark, sf_dir):
    """corpus_token_budget_mix: the budget cut must run on the tiny
    (source, tier) agg table, not a per-source window over the corpus —
    so the corpus exchange is the two-phase agg (partial+final), the
    admitted tiers come back as a BROADCAST join, and no exchange
    carries document text."""
    plan = _plan(spark, sf_dir, "corpus_token_budget_mix")
    assert plan.count("HashAggregate") >= 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args, args


def test_bloom_decontaminate_corpus_side_never_shuffles(spark, sf_dir):
    """corpus_bloom_decontaminate: the training text stays inside its
    scan — membership is a codegen'd probe filter on exploded (doc_id,
    md5) rows against the broadcast one-row bitmap
    (BroadcastNestedLoopJoin over a single row), and contaminated
    doc_ids come back as a BROADCAST anti-join. No SortMergeJoin
    anywhere; no hash exchange partitions on text or shingles (the only
    corpus-derived exchange is the hit-sized doc_id distinct)."""
    plan = _plan(spark, sf_dir, "corpus_bloom_decontaminate")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args and "sh#" not in args, args


def test_quantizer_refresh_broadcasts_and_never_shuffles_vectors(
    spark, sf_dir
):
    """similarity_quantizer_refresh: cell matching is an nlist x nlist
    broadcast cross (metadata-sized — broadcast nested loop is correct
    there), corpus occupancy is scan x broadcast(new quantizer) + a
    16-group two-phase agg, and no exchange may carry the embedding
    vectors — the corpus never shuffles to be audited."""
    plan = _plan(spark, sf_dir, "similarity_quantizer_refresh")
    assert "BroadcastExchange" in plan
    assert plan.count("HashAggregate") >= 2, plan  # partial+final occupancy
    assert "SortMergeJoin" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in args and "__v" not in args, args


def test_gopher_repetition_gram_exchange_is_hashed_not_text(spark, sf_dir):
    """text_gopher_repetition's gram metrics are the tf shape: two-phase
    hash aggs keyed by (doc_id, xxhash64(gram)) — the exchange must
    carry the fixed-width hash key, never document text or gram text,
    and no join may degenerate to a cartesian."""
    plan = _plan(spark, sf_dir, "text_gopher_repetition")
    assert plan.count("HashAggregate") >= 4, plan  # partial+final, g2+g5
    assert "CartesianProduct" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args, args
        assert not re.search(r"\bg#\d", args), args  # gram text column


def test_pq_scoring_never_exchanges_vectors(spark, sf_dir):
    """similarity_ann_ivf_pq: raw vectors appear only in the scan-side
    assignment stages — the scoring joins carry (query_id, vec_id, m,
    code) rows against a BROADCAST lookup table, and no hash exchange
    carries an embedding/vector column (column pruning drops __v below
    the assignment windows because only (id, cell)/(id, m, code)
    survive). Codebooks and quantizer are broadcast; no cartesian."""
    plan = _plan(spark, sf_dir, "similarity_ann_ivf_pq")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    # r11 regression guard: the packed-long argmax must stay a codegen
    # HashAggregate — a struct-buffered agg (max_by over structs) falls
    # to SortAggregate, measured 1.4x slower than the window it replaced
    assert "SortAggregate" not in plan, plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in args and "__v" not in args and "sv#" not in args, args


def test_outlier_prune_broadcasts_and_fixed_width_exchanges(spark, sf_dir):
    """corpus_embedding_outlier_prune: quantizer and per-cell means are
    broadcast; the only hash exchanges are the per-vector assignment
    window and the nlist-group stats agg — fixed-width rows, never the
    vectors themselves."""
    plan = _plan(spark, sf_dir, "corpus_embedding_outlier_prune")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in args and "__v" not in args, args


def test_bigram_logprob_vocab_joins_no_text_exchange(spark, sf_dir):
    """text_bigram_logprob: two-phase aggs for the bigram/unigram tables
    (partial collapse before the exchange), and no hash exchange carries
    the document text — only token-pair keys and doc_id."""
    plan = _plan(spark, sf_dir, "text_bigram_logprob")
    assert plan.count("HashAggregate") >= 4, plan  # bigram+unigram+doc aggs
    assert "CartesianProduct" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args, args


def test_eval_overlap_broadcasts_bench_side(spark, sf_dir):
    """corpus_eval_overlap_report: the eval shingle set joins in as a
    BROADCAST (decontaminate's shape); the training side's exchanges are
    (doc_id, shingle) dedup and doc_id counts — never raw text."""
    plan = _plan(spark, sf_dir, "corpus_eval_overlap_report")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args, args


def test_connected_components_output_plan_is_checkpoint_truncated(spark):
    """The r11 CC rewrite (contraction seed + bridge merge, parquet
    checkpoints): the RETURNED labels plan must hang off the durable
    checkpoint, not the edge pipeline. Concretely: (a) the per-partition
    union-find contraction runs via mapInPandas, so a plan that still
    contains MapInPandas is recomputing the contraction (and, upstream
    of real callers, the whole minhash/kNN candidate pipeline) on every
    downstream action — the exact double-compute _reliable_checkpoint
    exists to kill; (b) the seed labels must be read back from parquet
    (the durable truncation point); (c) label composition joins are
    equi-joins, never cartesian."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.dedup import connected_components

    edges = (
        spark.range(12)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .repartition(6)
    )
    nodes = spark.range(20).select(F.col("id").alias("doc_id"))
    out = connected_components(edges, nodes)
    plan = explain_str(out, "formatted")
    assert "MapInPandas" not in plan, (
        "CC output recomputes the contraction — checkpoint not truncating"
    )
    assert "Scan parquet" in plan, "seed labels not read from the checkpoint"
    assert "CartesianProduct" not in plan


def test_residual_two_level_routing_plan_shape(spark, sf_dir):
    """similarity_ann_ivf_pq_residual_two_level routes every assignment
    through the two-level branch LIVE (nlist=64): the super routing is
    scan x broadcast(sup_df) + a partial-aggregated collect_list slice —
    so the plan must show broadcast exchanges (supers, children, LUT),
    two-phase hash aggregation, and no un-broadcast cartesian; and no
    hash exchange may carry the raw text (vectors ride exchanges only
    as grouping keys of the routing agg, by design)."""
    plan = _plan(spark, sf_dir, "similarity_ann_ivf_pq_residual_two_level")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_multimodal_plans_single_rebalance_no_payload_hash_shuffle(
    spark, sf_dir
):
    """The multimodal family's scale shape (SCALING.md): payloads are
    never HASH-shuffled — the only exchange in each plan is the single
    ensure_parallelism round-robin rebalance of the single-file dev
    fixture (a no-op on real multi-split inputs), and the post-UDF /
    post-explode output is fixed-width. Pins the r13 audit fix: the
    features op used to stack _load_balanced on top of
    extract_features' own guard, shipping the binary payload through
    TWO back-to-back round-robin exchanges."""
    import re

    for q, marker in (
        ("multimodal_features", "MapInPandas"),
        ("multimodal_byte_segments", "Generate"),
        ("multimodal_frame_sample", "Generate"),
    ):
        plan = _plan(spark, sf_dir, q)
        assert marker in plan, (q, plan)
        assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
        # no hash exchange at all — the rebalance is round-robin
        assert "hashpartitioning" not in plan, (q, plan)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex <= 1, (
            f"{q}: {n_ex} exchanges — the payload should cross at most "
            f"the one ensure_parallelism rebalance\n{plan}"
        )


def test_label_vote_and_purity_hash_agg_and_broadcast_quantizer(
    spark, sf_dir
):
    """The labeled-embedding scorers: the quantizer fan-out is the
    standard scan x broadcast (BroadcastNestedLoopJoin over the
    metadata-sized centroid set), labels ride keyed joins (no
    SortMergeJoin at fixture scale, never a cartesian), and the
    majority-vote packed-long argmax must stay a codegen HashAggregate —
    zero SortAggregate (the struct-ordered max_by regression,
    similarity.py:_best_cells)."""
    for q in ("similarity_knn_label_vote", "corpus_label_purity"):
        plan = _plan(spark, sf_dir, q)
        assert "SortAggregate" not in plan, (q, plan)
        assert "CartesianProduct" not in plan, (q, plan)
        assert "HashAggregate" in plan, (q, plan)
        assert "BroadcastHashJoin" in plan, (q, plan)


def test_semantic_decontaminate_plan_shape(spark, sf_dir):
    """corpus_semantic_decontaminate: quantizer fan-out is the standard
    scan x broadcast; the EVAL side (benchmark suite, bounded by
    contract) is broadcast-hinted into the candidate cell join and the
    re-rank join, so the corpus-sized training assignment never
    shuffles on cell — no SortMergeJoin anywhere, never a cartesian;
    the threshold filter plus per-vector best pick keep the
    aggregation in codegen HashAggregate / window (no SortAggregate).
    The TRAINING side carries no broadcast hint (it grows with
    data — the similarity_knn_label_vote lesson in reverse)."""
    plan = _plan(spark, sf_dir, "corpus_semantic_decontaminate")
    assert "CartesianProduct" not in plan, plan
    assert "SortAggregate" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_corpus_semantic_decontaminate_incremental_plan(spark, sf_dir):
    """The tick's plan is the batch decontaminator's shape restricted to
    the batch: flat assignment (scan × broadcast quantizer), candidates
    + exact re-rank in ONE join against the broadcast stored eval index
    (which carries the eval vectors — no second corpus-keyed exchange),
    threshold before the hit-sized window. Never a cartesian, never an
    SMJ (nothing corpus-sized ever shuffles on a join key), window in
    codegen (no SortAggregate)."""
    plan = _plan(spark, sf_dir, "corpus_semantic_decontaminate_incremental")
    assert "CartesianProduct" not in plan, plan
    assert "SortAggregate" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_no_cartesian_or_rowwise_udf_anywhere_in_registry(
    spark, sf_dir, name
):
    """Registry-wide lint: no registered op may plan a CartesianProduct
    or a row-at-a-time Python UDF at fixture scale — the per-op pins
    above guard the ops someone thought about, this guards the ones
    nobody did (a future op with a dropped join key, an equi-join
    Catalyst degrades after a refactor, or an ``F.udf`` smuggled in via
    a helper — all slip past correctness checks because the result is
    still right). BroadcastNestedLoopJoin is NOT banned here: every
    instance in the registry is a scalar-subquery/metadata-broadcast
    build (audited r12/r13). BatchEvalPython (row-wise pickle UDF) is
    banned everywhere — the engine's Python boundary is Arrow-batched
    only (MapInPandas / ArrowEvalPython stay allowed, and only the
    multimodal family uses them). Ops whose fn() call has side effects
    still just build a plan here — eager setup (sidecar training,
    table seeding) is idempotent and shared with the other plan tests.
    Parametrized per op (ADVICE r14) so one op's failed fn() — a
    streaming drain, an eager sidecar build — reports as its own test
    instead of masking the rest of the sweep; each op accumulates ALL
    its violations (the old single-assignment dict dropped the
    Cartesian message when a UDF violation followed it)."""
    plan = explain_str(_SPECS[name].fn(spark, sf_dir), "formatted")
    violations = []
    if "CartesianProduct" in plan:
        violations.append("CartesianProduct in plan")
    if "BatchEvalPython" in plan:
        violations.append("row-wise Python UDF (BatchEvalPython) in plan")
    assert not violations, f"{name}: {violations}\n{plan}"
