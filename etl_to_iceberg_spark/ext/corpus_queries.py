"""Corpus-level training-data operators: vocabulary building, quantile
quality filtering, domain mixing, and trained-quantizer ANN.

These extend the reference's surface (it has none of this — BASELINE.json
north star) with the operations a 100 TB pretraining pipeline runs between
ingestion and tokenization. All checked ops are pure Catalyst plans with
DuckDB oracle mirrors; the KMeans op is rows-only (iterative training has
no single-statement SQL equivalent) and is recall-tested against the exact
brute-force ranking in tests/test_ext.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.ext.text import WORD_RE, quality_score, words
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table


@register(
    "text_token_histogram",
    sql=f"""
    SELECT token, COUNT(*) AS cnt
    FROM (
      SELECT unnest(regexp_extract_all(text, '{WORD_RE}')) AS token
      FROM documents
    )
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 200
    """,
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency (top-200) — the vocabulary-building pass
    every tokenizer training run starts with.

    Scale shape: explode → two-phase hash agg. The partial (map-side)
    aggregate collapses each partition to its distinct tokens BEFORE the
    shuffle, so the exchange carries (token, partial_count) — vocabulary-
    sized, not corpus-sized (natural-language vocabulary grows ~O(n^0.5)
    with corpus size, so the shuffle is tiny relative to the scan). The
    top-200 is TakeOrdered, not a global sort."""
    from etl_to_iceberg_spark.ext.pipeline_queries import explode_expensive

    docs = load_table(spark, sf_dir, "documents")
    return (
        explode_expensive(docs, [], words("text"), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(200)
    )


@register(
    "text_quality_rank_filter",
    # the scored CTE mirrors ext/text.py::quality_score exactly (same
    # formula as the text_quality_score oracle in ext/queries.py)
    sql="""
    WITH t AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS wc,
             length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
             len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                 x -> list_contains(['the','and','of','to','is','in','that','with'], x)))
                 AS sw_hits
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             round(0.4 * (least(wc, 100) / 100.0)
                   + 0.3 * (1.0 - CASE WHEN nonspace > 0
                                       THEN CAST(nonspace - alnum AS DOUBLE) / nonspace
                                       ELSE 0.0 END)
                   + 0.3 * least(4.0 * CASE WHEN wc > 0
                                            THEN CAST(sw_hits AS DOUBLE) / wc
                                            ELSE 0.0 END, 1.0), 6) AS q
      FROM t
    ),
    thresholds AS (
      -- threshold rounded to 6dp on BOTH sides: linear-interpolation
      -- low bits differ between engines and would flip boundary docs
      SELECT lang, round(quantile_cont(q, 0.2), 6) AS q20
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.q
    FROM scored s JOIN thresholds t ON s.lang = t.lang
    WHERE s.q > t.q20
    ORDER BY s.doc_id
    """,
)
def text_quality_rank_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile quality floor: drop the bottom 20% of docs per language by
    quality score — the distribution-relative filter used when an absolute
    threshold would over-prune low-resource languages.

    Scale shape: the per-lang p20 threshold is an AGGREGATE (partial
    percentile buffers merge map-side; at 100 TB swap in approx_percentile
    — t-digest — with the same call shape), broadcast back for the filter.
    Deliberately NOT a percent_rank window: a global (or per-hot-lang)
    rank window funnels whole partitions through single tasks; the
    agg+broadcast form never reshuffles the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", F.round(quality_score("text"), 6).alias("q")
    )
    thresholds = scored.groupBy("lang").agg(
        F.round(F.percentile("q", F.lit(0.2)), 6).alias("q20")
    )
    return (
        scored.join(F.broadcast(thresholds), on="lang")
        .where(F.col("q") > F.col("q20"))
        .select("doc_id", "lang", "q")
        .orderBy("doc_id")
    )


@register(
    "corpus_domain_mix",
    sql="""
    WITH kept AS (
      SELECT doc_id, lang FROM documents
      WHERE doc_id % 10 < (CASE WHEN lang = 'en' THEN 5 ELSE 10 END)
    )
    SELECT d.lang,
           COUNT(*) AS total_docs,
           COUNT(k.doc_id) AS kept_docs
    FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixture resampling: downsample the over-represented
    language (en → 50%, everything else kept) with a DETERMINISTIC keep
    rule (doc_id mod 10 vs a per-group quota) — reproducible across runs
    and append-stable, unlike rand()-based sampling. The op reports the
    per-language before/after counts (the mixture audit table every
    training-data pipeline publishes next to the corpus).

    The mod-quota form implements fixed fractions; weight-derived
    fractions (e.g. temperature sampling over domain sizes) compute the
    quota from a prior counts pass and feed the same rule. Scale shape:
    the keep rule is a scan-level filter (no shuffle to sample); the audit
    is one two-phase agg."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    quota = F.when(F.col("lang") == "en", F.lit(5)).otherwise(F.lit(10))
    return (
        docs.withColumn(
            "__kept", (F.col("doc_id") % 10 < quota).cast("int").cast("long")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum("__kept").alias("kept_docs"),
        )
        .orderBy("lang")
    )


_IVFK_SIDECAR = "/tmp/e2is_ivfk_centroids"  # fixed path, same contract as
# the dedup sketch sidecars (ext/queries._ensure_sidecar)


@register(
    "similarity_ivf_kmeans",
    # Lloyd's iterations aren't single-statement SQL, but the FITTED
    # quantizer is just 16 rows — materialized to a parquet sidecar, so
    # the oracle re-derives everything downstream of training (corpus
    # assignment, nprobe routing, exact re-rank) from the identical
    # centroids: the similarity_ann_ivf oracle with its seed CTE swapped
    # for the sidecar read. Training quality itself stays gated by the
    # recall-vs-bruteforce test (tests/test_ext.py).
    sql=f"""
    WITH cent AS (
      SELECT cell, __cent AS cv
      FROM read_parquet('{_IVFK_SIDECAR}/*.parquet')
    ),
    corpus_assign AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                       c.cv), 6) DESC, c.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn <= 1
    ),
    query_assign AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                       c.cv), 6) DESC, c.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id % 97 = 0
      ) WHERE rn <= 4
    ),
    scored AS (
      SELECT DISTINCT qa.query_id, ca.vec_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          ce.embedding::DOUBLE[]), 6) AS score
      FROM query_assign qa
      JOIN corpus_assign ca ON qa.cell = ca.cell
      JOIN embeddings q ON q.vec_id = qa.query_id
      JOIN embeddings ce ON ce.vec_id = ca.vec_id
    )
    SELECT query_id, vec_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a KMeans-trained coarse quantizer: distributed,
    seeded MLlib training on a deterministic hash-sample (train_fraction
    always set — the quantizer needs a sample, never the corpus);
    fitted centroids persisted to the oracle sidecar (once per process ×
    sf_dir — at scale the quantizer IS a stored table, ivf_kmeans_topk
    docstring); probe + exact re-rank from the stored rows
    (ivf_probe_topk). NOTE: eager on first call (training)."""
    from etl_to_iceberg_spark.ext.queries import _ensure_sidecar
    from etl_to_iceberg_spark.ext.similarity import (
        _to_double,
        ivf_kmeans_centroids,
        ivf_probe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    _ensure_sidecar(
        _IVFK_SIDECAR,
        sf_dir,
        lambda: ivf_kmeans_centroids(emb, nlist=16, train_fraction=0.5),
    )
    centroids = spark.read.parquet(_IVFK_SIDECAR).select("cell", "__cent")
    c = emb.select("vec_id", _to_double("embedding").alias("__v"))
    q = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("__v")
    )
    return ivf_probe_topk(c, q, centroids, k=10, nprobe=4)


@register(
    "text_unigram_logprob",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ),
    total AS (SELECT SUM(cnt) AS n FROM vocab)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           -- per-term DECIMAL(20,9) cast: quantizes away sub-nanoscale
           -- libm ln() discrepancies AND makes the sum exact and
           -- order-independent (registry determinism discipline)
           round(CAST(SUM(CAST(ln(v.cnt / CAST(tt.n AS DOUBLE))
                               AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*), 6)
               AS avg_logprob
    FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN total tt
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's own
    unigram distribution — the cheap language-model quality proxy (a
    KenLM-style perplexity filter's first rung): gibberish and boilerplate
    both score abnormally, and the score needs no external model.

    Scale shape: pass 1 builds the unigram table (explode → two-phase
    agg, vocabulary-sized output); pass 2 re-joins tokens to their counts.
    The vocab join side is vocabulary-sized (≈O(n^0.5) of the corpus) —
    broadcast when it fits, hash-join on token otherwise (Spark's planner
    picks by size); the per-doc average is one more two-phase agg keyed
    by doc_id. Each ln() term is cast to DECIMAL(20,9) before summing —
    1e-9 quantization is far above any libm last-ulp divergence between
    engines and far below the 6dp output — so the per-doc sum is exact,
    order-independent, and bit-identical across engines (the registry's
    exact-decimal discipline; plain SUM(double) would be partition-order
    dependent)."""
    from etl_to_iceberg_spark.ext.pipeline_queries import explode_expensive

    docs = load_table(spark, sf_dir, "documents")
    toks = explode_expensive(
        docs, ["doc_id"], words(F.lower(F.col("text"))), "token"
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    logp = F.log(F.col("cnt") / F.col("n").cast("double")).cast("decimal(20,9)")
    return (
        toks.join(vocab, on="token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(logp).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "events_funnel",
    sql="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      COUNT(t_view) AS viewed,
      COUNT(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
      COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
          AS purchased_after_click
    FROM stages
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): users counted
    at each stage only if the stage's FIRST occurrence follows the prior
    stage's — the product-analytics query every event warehouse runs.

    Scale shape: ONE two-phase agg keyed by user builds the per-user
    first-occurrence profile (conditional MIN per stage — no joins, no
    window, no per-stage rescans of the event log), then a 1-row rollup.
    NULL semantics carry the ordering logic: a missing stage yields NULL,
    and NULL comparisons drop the user from later stages in both
    engines."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("viewed"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("purchased_after_click"),
    )


@register(
    "text_chunk_documents",
    sql="""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks, len(toks) AS nt,
             greatest(1, CAST(ceil((len(toks) - 8) / 24.0) AS INT))
                 AS n_chunks
      FROM t
    ),
    c AS (
      SELECT doc_id, toks, nt, unnest(range(n_chunks)) AS chunk_id FROM n
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(
               list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32),
               ' ') AS chunk_text,
           CAST(least(32, nt - chunk_id * 24) AS INT) AS n_tokens
    FROM c
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    32-token chunks (stride 24; sized to the fixture's 10-100-token docs) — the dual of corpus_pack_sequences
    (short docs pack UP to the window, long docs chunk DOWN into it).
    One scan, pure Catalyst; the only shuffle-free explode in the
    tokenization prep path."""
    from etl_to_iceberg_spark.ext.text import chunk_documents
    from etl_to_iceberg_spark.plans import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.posexplode(chunk_documents("text", chunk_tokens=32, overlap=8)),
    ).select("doc_id", "col.chunk_id", "col.chunk_text", "col.n_tokens")
