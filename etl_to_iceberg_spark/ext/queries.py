"""Registry queries for the training-data extensions (dedup, similarity,
text analysis, multimodal) over the documents/embeddings fixtures."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_to_iceberg_spark.plans import ensure_parallelism
from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sidecars import (
    ensure_sidecar,
    oracle_sidecar_path,
    sidecar_path,
)
from etl_to_iceberg_spark.sources.tables import load_table


def _load_balanced(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture loader with the single-file→single-partition guard: these
    tables ship as one parquet file, which would serialize the CPU-heavy
    text/vector work onto one core (no-op on multi-split inputs)."""
    return ensure_parallelism(load_table(spark, sf_dir, name))

# SQL mirrors of ext.text building blocks (kept adjacent for review):
_SQL_WORDS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_SQL_WORD_COUNT = f"len({_SQL_WORDS})"
_SQL_TOKENS_BPE = (
    "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
)


# --- text analysis ---------------------------------------------------------


@register(
    "text_token_count",
    sql=f"""
    SELECT doc_id,
           {_SQL_WORD_COUNT} AS word_count,
           {_SQL_TOKENS_BPE} AS bpe_token_count,
           length(text) AS char_count
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace words + BPE-ish regex) — pure column
    expressions; at 100 TB this is a scan, nothing else."""
    from etl_to_iceberg_spark.ext import text as X

    docs = _load_balanced(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.word_count("text").alias("word_count"),
        X.token_count("text").alias("bpe_token_count"),
        X.char_count("text").alias("char_count"),
    )


@register(
    "text_quality_score",
    sql=f"""
    WITH t AS (
      SELECT doc_id,
             {_SQL_WORD_COUNT} AS wc,
             length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['the','and','of','to','is','in','that','with'], x)))
                 AS sw_hits
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN nonspace > 0
                THEN CAST(nonspace - alnum AS DOUBLE) / nonspace ELSE 0.0 END
               AS punct_ratio,
           CASE WHEN wc > 0 THEN CAST(sw_hits AS DOUBLE) / wc ELSE 0.0 END
               AS stopword_ratio,
           round(0.4 * (least(wc, 100) / 100.0)
                 + 0.3 * (1.0 - CASE WHEN nonspace > 0
                                     THEN CAST(nonspace - alnum AS DOUBLE) / nonspace
                                     ELSE 0.0 END)
                 + 0.3 * least(4.0 * CASE WHEN wc > 0
                                          THEN CAST(sw_hits AS DOUBLE) / wc
                                          ELSE 0.0 END, 1.0), 6)
               AS quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality pre-filter: length/punctuation/stopword mix."""
    from etl_to_iceberg_spark.ext import text as X

    docs = _load_balanced(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.punct_ratio("text").alias("punct_ratio"),
        X.stopword_ratio("text").alias("stopword_ratio"),
        X.quality_score("text").alias("quality"),
    )


@register(
    "text_lang_id",
    sql=f"""
    WITH s AS (
      SELECT doc_id,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['the','and','of','to','is','in','that','with'], x))) AS c_en,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['el','la','de','que','los','una','por','con'], x))) AS c_es,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['le','la','les','des','est','dans','que','pour'], x))) AS c_fr,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) AS c_de
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(c_en, c_es, c_fr, c_de) < 1 THEN 'unknown'
                WHEN c_en = greatest(c_en, c_es, c_fr, c_de) THEN 'en'
                WHEN c_es = greatest(c_en, c_es, c_fr, c_de) THEN 'es'
                WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) THEN 'fr'
                ELSE 'de' END AS detected_lang
    FROM s
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID (n-gram heuristic); argmax with fixed
    tie order, 'unknown' below the hit floor."""
    from etl_to_iceberg_spark.ext import text as X

    docs = _load_balanced(spark, sf_dir, "documents")
    return docs.select("doc_id", X.lang_id("text").alias("detected_lang"))


@register(
    "text_fingerprint",
    sql="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed document fingerprint (md5 of normalized text)."""
    from etl_to_iceberg_spark.ext import text as X

    docs = _load_balanced(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint("text").alias("fingerprint"))


@register(
    "text_corpus_stats",
    sql=f"""
    SELECT lang,
           COUNT(*) AS docs,
           CAST(SUM(CAST({_SQL_WORD_COUNT} AS DECIMAL(18,0))) AS BIGINT) AS total_words,
           CAST(SUM(CAST(length(text) AS DECIMAL(18,0))) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup per language — the monitoring query a data pipeline
    runs per snapshot."""
    from etl_to_iceberg_spark.ext import text as X

    docs = _load_balanced(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(X.word_count("text").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("total_words"),
            F.sum(X.char_count("text").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("total_chars"),
        )
        .orderBy("lang")
    )


# --- dedup -----------------------------------------------------------------


@register(
    "dedup_exact",
    sql="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        ORDER BY doc_id) = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: fingerprint hash-groupBy, keep lowest doc_id."""
    from etl_to_iceberg_spark.ext.dedup import exact_dedup

    docs = _load_balanced(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "fingerprint")


@register(
    "dedup_ngram_jaccard",
    sql="""
    WITH s AS (
      SELECT doc_id, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS st
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_filter(a.st, x -> list_contains(b.st, x))) AS DOUBLE)
                 / (len(a.st) + len(b.st)
                    - len(list_filter(a.st, x -> list_contains(b.st, x)))), 6)
               AS jaccard
    FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE a.doc_id % 25 = 0
      AND round(CAST(len(list_filter(a.st, x -> list_contains(b.st, x))) AS DOUBLE)
                / (len(a.st) + len(b.st)
                   - len(list_filter(a.st, x -> list_contains(b.st, x)))), 6) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard near-dup on bounded candidates (probe docs ×
    same-source partners) — the verification kernel the LSH paths reuse.
    The unbounded version is minhash_near_duplicates."""
    from etl_to_iceberg_spark.ext.dedup import ngram_jaccard_pairs

    docs = _load_balanced(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, group_col="source", shingle_n=1, threshold=0.8,
        probe_filter=F.col("id_a") % 25 == 0,
    )


@register(
    "dedup_exact_substring",
    sql="""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    p AS (
      SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS pos
      FROM t WHERE len(toks) >= 8
    ),
    g AS (
      SELECT doc_id, pos,
             array_to_string(toks[pos + 1 : pos + 8], ' ') AS gram
      FROM p
    ),
    f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 64),
    gg AS (SELECT g.* FROM g JOIN f USING (gram)),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pos_a, b.pos AS pos_b
      FROM gg a JOIN gg b USING (gram) WHERE a.doc_id < b.doc_id
    ),
    i AS (
      SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag,
             pos_a - ROW_NUMBER() OVER (PARTITION BY id_a, id_b,
                                        pos_a - pos_b ORDER BY pos_a) AS grp
      FROM m
    )
    SELECT id_a, id_b,
           CAST(min(pos_a) AS INT) AS a_start,
           CAST(min(pos_b) AS INT) AS b_start,
           CAST(max(pos_a) - min(pos_a) + 8 AS INT) AS span_tokens
    FROM i
    GROUP BY id_a, id_b, diag, grp
    HAVING max(pos_a) - min(pos_a) + 8 >= 16
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup: maximal runs of ≥16 identical
    consecutive word tokens shared across doc pairs (position-stamped
    8-grams → hot-gram cap → anchor equi-join → diagonal gaps-and-islands
    merge). Finds shared verbatim passages that whole-document set
    similarity misses. The oracle joins on gram text; the Spark path
    ships xxhash64(gram) — 8 B/anchor at 100 TB."""
    from etl_to_iceberg_spark.ext.dedup import exact_substring_spans

    docs = _load_balanced(spark, sf_dir, "documents")
    return exact_substring_spans(docs, gram_n=8, min_span_tokens=16)


# Sidecar placement + freshness live in etl_to_iceberg_spark.sidecars
# (uid-scoped base, sf-keyed paths — see that module's docstring for the
# full contract). The oracle SQL below embeds the path keyed by the
# pinned oracle SF; the query fns write the path keyed by their sf_dir —
# identical whenever the oracle actually runs (the driver contract).
_ensure_sidecar = ensure_sidecar  # back-compat alias (tests, siblings)

# effective sketch knobs: minhash_signatures defaults + the band count
_MINHASH_PARAMS = {"num_hashes": 32, "shingle_n": 3, "bands": 16}
_MINHASH_SIDECAR = oracle_sidecar_path("minhash_sidecar", _MINHASH_PARAMS)


@register(
    "dedup_minhash_lsh",
    sidecars=("minhash_sidecar",),
    # The seeded-xxhash64 sketch has no DuckDB mirror; the query
    # materializes (doc_id, fp, band_hashes) to a parquet sidecar and
    # the oracle re-derives the relational half — identical-fingerprint
    # collapse, bucket-capped band equi-join, exact word-3-shingle
    # Jaccard verify >= 0.6 — from the same rows. The shingle/jaccard
    # mirror follows dedup_ngram_jaccard's; <3-token docs fall back to
    # the single joined-tokens shingle exactly like ext/dedup.py's
    # word_shingles.
    sql=f"""
    WITH side AS (
      SELECT doc_id, fp, band_hashes
      FROM read_parquet('{_MINHASH_SIDECAR}/*.parquet')
    ),
    tagged AS (
      SELECT doc_id, fp, band_hashes,
             MIN(doc_id) OVER (PARTITION BY fp) AS rep
      FROM side
    ),
    exact_edges AS (
      SELECT rep AS id_a, doc_id AS id_b, 1.0 AS jaccard
      FROM tagged WHERE doc_id <> rep
    ),
    banded AS (
      SELECT doc_id, b.i - 1 AS band, band_hashes[b.i] AS band_hash
      FROM tagged
      CROSS JOIN (SELECT unnest(range(1, 17)) AS i) b
      WHERE doc_id = rep
    ),
    capped AS (
      SELECT * FROM banded
      QUALIFY COUNT(*) OVER (PARTITION BY band, band_hash) <= 256
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM capped l
      JOIN capped r
        ON l.band = r.band AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3 THEN list_distinct(
                    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     FOR i IN range(1, len(ws) - 1)])
                  ELSE [array_to_string(ws, ' ')] END AS st
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
            FROM documents)
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             len(list_filter(a.st, x -> list_contains(b.st, x))) AS inter,
             len(a.st) + len(b.st)
               - len(list_filter(a.st, x -> list_contains(b.st, x))) AS uni
      FROM cands c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b
    ),
    near AS (
      SELECT id_a, id_b,
             round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
      FROM scored
      WHERE uni > 0 AND round(CAST(inter AS DOUBLE) / uni, 6) >= 0.6
    )
    SELECT * FROM near
    UNION ALL
    SELECT * FROM exact_edges
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → 32 seeded xxhash64 minhashes →
    16 bands → capped bucket equi-join candidates → exact-Jaccard verify
    ≥0.6. The one-scan sketch (fingerprint + band hashes) materializes
    to the oracle sidecar and the pipeline resumes from the stored rows
    (minhash_pairs_from_bands) — flipping the family's flagship from
    rows-only to value-hash checked (VERDICT r7 #5)."""
    from etl_to_iceberg_spark.ext.dedup import (
        fingerprint,
        minhash_pairs_from_bands,
        minhash_signatures,
    )
    from etl_to_iceberg_spark.ext.incremental import band_hashes

    docs = _load_balanced(spark, sf_dir, "documents")
    side = sidecar_path("minhash_sidecar", sf_dir, _MINHASH_PARAMS)
    ensure_sidecar(
        side,
        sf_dir,
        lambda: minhash_signatures(
            docs, extra_cols=[fingerprint("text").alias("fp")]
        ).select(
            "doc_id", "fp", band_hashes("sig", bands=16).alias("band_hashes")
        ),
    )
    stored = spark.read.parquet(side)
    return minhash_pairs_from_bands(stored, docs, threshold=0.6)


_SIMHASH_PARAMS = {"bits": 32}
_SIMHASH_SIDECAR = oracle_sidecar_path("simhash_sigs", _SIMHASH_PARAMS)
# Embedded in the static oracle SQL below. The query writes the
# Spark-computed signatures (overwrite) and builds its own result FROM
# the written files, so the oracle and the Spark result always read the
# identical sketch; the driver runs fn() before the oracle per query,
# so the sidecar is fresh.


@register(
    "dedup_simhash",
    sidecars=("simhash_sigs",),
    # The xxhash64 sign-sum sketch has no DuckDB mirror; the query
    # materializes it to a parquet sidecar and the oracle re-derives the
    # relational half (identical-signature collapse, byte-band pigeonhole
    # candidates, hamming ≤ 3) from the same signatures. The sketch
    # itself stays pinned by the planted-dup/property tests.
    sql=f"""
    WITH sigs AS (
      SELECT doc_id, simhash
      FROM read_parquet('{_SIMHASH_SIDECAR}/*.parquet')
    ),
    reps AS (
      SELECT doc_id, simhash,
             MIN(doc_id) OVER (PARTITION BY simhash) AS rep
      FROM sigs
    ),
    exact_edges AS (
      SELECT rep AS id_a, doc_id AS id_b, 0 AS hamming
      FROM reps WHERE doc_id <> rep
    ),
    banded AS (
      SELECT doc_id, simhash, b.byte_idx,
             (simhash >> (8 * b.byte_idx)) & 255 AS byte_val
      FROM reps
      CROSS JOIN (SELECT unnest(range(0, 4)) AS byte_idx) b
      WHERE doc_id = rep
    ),
    capped AS (
      -- mirrors the Spark path's max_bucket_size=1024 guard
      -- (simhash_pairs via _cap_buckets) so an oversized byte-band
      -- bucket can never diverge engine-vs-oracle (ADVICE r8)
      SELECT * FROM banded
      QUALIFY COUNT(*) OVER (PARTITION BY byte_idx, byte_val) <= 1024
    ),
    near AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
             CAST(bit_count(xor(l.simhash, r.simhash) & 4294967295)
                  AS INT) AS hamming
      FROM capped l
      JOIN capped r
        ON l.byte_idx = r.byte_idx AND l.byte_val = r.byte_val
       AND l.doc_id < r.doc_id
      WHERE bit_count(xor(l.simhash, r.simhash) & 4294967295) <= 3
    )
    SELECT * FROM near
    UNION ALL
    SELECT * FROM exact_edges
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit sign-sum sketch, byte-band candidates,
    Hamming ≤ 3. Signatures are computed once, materialized to the
    oracle sidecar, and the pair logic runs over the written files —
    one extra tiny write (24 B/doc) buys a full value-hash oracle for
    what was a rows-only op (VERDICT r7 #5)."""
    from etl_to_iceberg_spark.ext.dedup import simhash, simhash_pairs

    docs = _load_balanced(spark, sf_dir, "documents")
    side = sidecar_path("simhash_sigs", sf_dir, _SIMHASH_PARAMS)
    ensure_sidecar(
        side,
        sf_dir,
        lambda: simhash(docs, id_col="doc_id", text_col="text", bits=32),
    )
    stored = spark.read.parquet(side)
    return simhash_pairs(stored, id_col="doc_id", max_hamming=3)


@register(
    "dedup_embedding_cosine",
    sql="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id % 20 = 0
      AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (probe side bounded; LSH bounds both
    sides at scale — see similarity_ann_lsh). Threshold 0.35 is calibrated
    to this synthetic corpus (random 64-dim embeddings top out near 0.44
    pairwise cosine); a production near-dup pass would use ~0.9."""
    from etl_to_iceberg_spark.ext.similarity import embedding_near_duplicates

    emb = _load_balanced(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb, threshold=0.35, probe_filter=F.col("id_a") % 20 == 0
    )


# --- similarity search -----------------------------------------------------


@register(
    "similarity_topk_bruteforce",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS score
      FROM q JOIN embeddings c ON true
    )
    SELECT query_id, vec_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-10 for 5 query vectors.
    Plan: broadcast(queries) × corpus scan → windowed top-k; the corpus is
    never shuffled."""
    from etl_to_iceberg_spark.ext.similarity import cosine_topk

    emb = _load_balanced(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries, k=10)


@register(
    "similarity_ann_ivf",
    # Full-pipeline oracle (upgraded from rows-only in r6): seeding is the
    # first nlist=16 vectors by id, cell routing ranks ROUNDED cosine with
    # a cell tie-break, probes nprobe=4 — every stage deterministic and
    # ANSI-SQL-expressible.
    sql="""
    WITH cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell,
             embedding::DOUBLE[] AS cv
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
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
        WHERE e.vec_id < 5
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
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF scale path: corpus inverted-listed under nlist=16 broadcast
    centroids; queries probe their 4 nearest cells, exact cosine re-rank
    inside the probed lists only (recall vs brute force asserted in
    tests/test_ext.py)."""
    from etl_to_iceberg_spark.ext.similarity import ivf_topk

    emb = _load_balanced(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=10, nlist=16, nprobe=4)


@register(
    "similarity_ann_lsh",
    # Full-pipeline oracle (upgraded from rows-only in r6): the hyperplane
    # sign pattern is an LCG bit over the flat (plane, dim) index and the
    # projection sums in DECIMAL — both exactly computable in ANSI SQL, so
    # DuckDB reproduces buckets, candidates, and the re-ranked top-k
    # bit-for-bit.
    sql="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    proj AS (
      SELECT b.vec_id, p.plane,
             SUM(CASE WHEN ((((p.plane * 64 + d.i - 1) * 1103515245 + 12345)
                             >> 16) & 1) = 1
                      THEN CAST(b.e[d.i] AS DECIMAL(28,10))
                      ELSE -CAST(b.e[d.i] AS DECIMAL(28,10)) END) AS s
      FROM base b
      CROSS JOIN (SELECT unnest(range(0, 6)) AS plane) p
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
      GROUP BY b.vec_id, p.plane
    ),
    bucket AS (
      SELECT vec_id,
             SUM(CASE WHEN s >= 0 THEN 1 << plane ELSE 0 END) AS bucket
      FROM proj GROUP BY vec_id
    ),
    cands AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
      FROM bucket qb JOIN bucket cb ON qb.bucket = cb.bucket
      WHERE qb.vec_id < 5
    ),
    scored AS (
      SELECT cands.query_id, cands.vec_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS score
      FROM cands
      JOIN embeddings q ON q.vec_id = cands.query_id
      JOIN embeddings c ON c.vec_id = cands.vec_id
    )
    SELECT query_id, vec_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets (deterministic planes) →
    in-bucket exact re-rank. Candidates/query ≈ corpus / 2^planes."""
    from etl_to_iceberg_spark.ext.similarity import lsh_topk

    emb = _load_balanced(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10, planes=6)


@register(
    "similarity_ann_lsh_multiprobe",
    # similarity_ann_lsh's oracle with the 1-bit-flip probe ring (masks
    # 0 and 1<<p) — the same multiprobe CTE the incremental tick's
    # oracle uses; probe buckets are distinct so no pair duplicates.
    sql="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    proj AS (
      SELECT b.vec_id, p.plane,
             SUM(CASE WHEN ((((p.plane * 64 + d.i - 1) * 1103515245 + 12345)
                             >> 16) & 1) = 1
                      THEN CAST(b.e[d.i] AS DECIMAL(28,10))
                      ELSE -CAST(b.e[d.i] AS DECIMAL(28,10)) END) AS s
      FROM base b
      CROSS JOIN (SELECT unnest(range(0, 6)) AS plane) p
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
      GROUP BY b.vec_id, p.plane
    ),
    bucket AS (
      SELECT vec_id,
             SUM(CASE WHEN s >= 0 THEN 1 << plane ELSE 0 END) AS bucket
      FROM proj GROUP BY vec_id
    ),
    cands AS (
      SELECT qb.vec_id AS query_id, cb.vec_id
      FROM bucket qb
      CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS m) probe
      JOIN bucket cb ON cb.bucket = xor(qb.bucket, probe.m)
      WHERE qb.vec_id < 5
    ),
    scored AS (
      SELECT cands.query_id, cands.vec_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS score
      FROM cands
      JOIN embeddings q ON q.vec_id = cands.query_id
      JOIN embeddings c ON c.vec_id = cands.vec_id
    )
    SELECT query_id, vec_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def similarity_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch multiprobe ANN: own bucket + every 1-bit-flip neighbor
    (probes = planes+1), exact cosine re-rank. The measured recall lever
    — SCALING.md "ANN recall@10": recall 0.936 → 1.0 on the near-dup
    corpus for ~6× the candidates, still ~10% of bruteforce — now a
    driver-checked batch op, matching the incremental tick's multiprobe
    (r7) on the batch path."""
    from etl_to_iceberg_spark.ext.similarity import lsh_topk

    emb = _load_balanced(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10, planes=6, probes=7)


# --- sampling / splitting / curation ---------------------------------------

_SQL_FP = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
_SQL_SPLIT = f"""
    CASE WHEN substring({_SQL_FP}, 1, 1) IN
              ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
         WHEN substring({_SQL_FP}, 1, 1) IN ('c','d') THEN 'valid'
         ELSE 'test' END
"""


@register(
    "split_train_valid_test",
    sql=f"""
    SELECT doc_id,
           substring({_SQL_FP}, 1, 1) AS bucket,
           {_SQL_SPLIT} AS split
    FROM documents
    """,
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash train/valid/test assignment (75/12.5/12.5): stable
    under reruns, parallelism changes, and appends — `rand()` splits are
    none of these. Pure column expressions; at 100 TB it's a scan."""
    from etl_to_iceberg_spark.ext.sampling import assign_split, hash_bucket

    docs = _load_balanced(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        hash_bucket("text", 1).alias("bucket"),
        assign_split("text").alias("split"),
    )


@register(
    "sample_stratified",
    sql=f"""
    SELECT doc_id, lang FROM documents
    WHERE substring({_SQL_FP}, 2, 1) IN ('0','1','2','3')
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% sample, uniform within every language stratum
    (hash digit independent of the split digit). Reproducible where
    `df.sample` is not."""
    from etl_to_iceberg_spark.ext.sampling import stratified_sample

    docs = _load_balanced(spark, sf_dir, "documents")
    return stratified_sample(docs).select("doc_id", "lang")


@register(
    "corpus_curate",
    sql=f"""
    WITH feat AS (
      SELECT doc_id, text,
             {_SQL_FP} AS fp,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['the','and','of','to','is','in','that','with'], x)))
                 AS c_en,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['el','la','de','que','los','una','por','con'], x))) AS c_es,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['le','la','les','des','est','dans','que','pour'], x))) AS c_fr,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) AS c_de,
             {_SQL_WORD_COUNT} AS wc,
             length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
             len(list_filter({_SQL_WORDS},
                 x -> list_contains(['the','and','of','to','is','in','that','with'], x)))
                 AS sw_hits
      FROM documents
    ),
    scored AS (
      SELECT doc_id, fp,
             CASE WHEN greatest(c_en, c_es, c_fr, c_de) < 1 THEN 'unknown'
                  WHEN c_en = greatest(c_en, c_es, c_fr, c_de) THEN 'en'
                  WHEN c_es = greatest(c_en, c_es, c_fr, c_de) THEN 'es'
                  WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) THEN 'fr'
                  ELSE 'de' END AS detected_lang,
             round(0.4 * (least(wc, 100) / 100.0)
                   + 0.3 * (1.0 - CASE WHEN nonspace > 0
                                       THEN CAST(nonspace - alnum AS DOUBLE) / nonspace
                                       ELSE 0.0 END)
                   + 0.3 * least(4.0 * CASE WHEN wc > 0
                                            THEN CAST(sw_hits AS DOUBLE) / wc
                                            ELSE 0.0 END, 1.0), 6) AS quality
      FROM feat
    )
    SELECT doc_id, detected_lang, quality,
           CASE WHEN substring(fp, 1, 1) IN
                     ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
                WHEN substring(fp, 1, 1) IN ('c','d') THEN 'valid'
                ELSE 'test' END AS split
    FROM scored
    WHERE detected_lang <> 'unknown' AND quality >= 0.5
    QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    """,
)
def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline a training corpus actually runs:
    language filter → quality floor → exact dedup (keep lowest id per
    content fingerprint) → split assignment. One composed DataFrame plan:
    the filters run in the scan stage, the dedup window is the only
    shuffle, and every stage is the already-proven operator."""
    from pyspark.sql import Window

    from etl_to_iceberg_spark.ext import text as X
    from etl_to_iceberg_spark.ext.sampling import assign_split

    docs = _load_balanced(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        X.fingerprint("text").alias("fp"),
        X.lang_id("text").alias("detected_lang"),
        X.quality_score("text").alias("quality"),
    ).where((F.col("detected_lang") != "unknown") & (F.col("quality") >= 0.5))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "doc_id",
            "detected_lang",
            "quality",
            assign_split("text").alias("split"),
        )
    )


# --- multimodal ------------------------------------------------------------


@register(
    "multimodal_features",
    sql="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           CAST(8 AS INT) AS feature_dim
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Pandas-UDF feature extraction over binary payloads
    (mapInPandas). The oracle checks the UDF's byte-level output; the
    deterministic fake embedding is unit-tested (real codecs are stubbed —
    see ext/multimodal.py).

    No _load_balanced here: extract_features applies ensure_parallelism
    itself, and stacking both repartitioned the payload through TWO
    back-to-back round-robin exchanges (r13 plan audit) — the guard
    decides from the scan's file list, so it cannot see that an earlier
    call already rebalanced the lineage."""
    from etl_to_iceberg_spark.ext.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id", "byte_len", F.size("feature").alias("feature_dim")
    )


@register(
    "multimodal_frame_sample",
    sql="""
    SELECT doc_id AS media_id,
           CAST(ts / 25 AS INT) AS frame_no,
           CAST(ts AS BIGINT) AS frame_ts_ms
    FROM documents, UNNEST(generate_series(0, n_chars - 1, 25)) AS t(ts)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan over video-like payloads: one row per sampled
    timestamp via sequence+posexplode (n_chars plays duration_ms)."""
    from etl_to_iceberg_spark.ext.multimodal import sample_frames

    docs = _load_balanced(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("n_chars").alias("duration_ms"),
    )
    return sample_frames(media, every_ms=25).select(
        "media_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"),
    )


@register(
    "text_pii_redact",
    sql="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9() .-]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text,
               '\\+?[0-9][0-9() .-]{7,}[0-9]')) AS n_phones
    FROM documents
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, phone-number shapes) — the redaction pass a
    training corpus runs before release. Pure regexp_replace column
    expressions (JVM codegen, no Python), with per-doc match counts for
    the audit trail."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9() .-]{7,}[0-9]"
    docs = _load_balanced(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(email), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone), 0)).alias("n_phones"),
    )


@register(
    "text_repetition_filter",
    sql="""
    WITH t AS (
      SELECT doc_id,
             str_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '. ')
                 AS sentences
      FROM documents
    )
    SELECT doc_id,
           len(sentences) AS n_sentences,
           round(1.0 - CAST(len(list_distinct(sentences)) AS DOUBLE)
                 / len(sentences), 6) AS dup_sentence_ratio
    FROM t
    WHERE len(sentences) > 0
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signal (gopher-style): fraction of duplicated sentences
    per document — boilerplate/spam detection via array_distinct, a pure
    per-row expression (split → distinct → ratio), zero shuffle."""
    docs = _load_balanced(spark, sf_dir, "documents")
    sentences = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")),
        r"\. ",
    )
    tagged = docs.select(
        "doc_id",
        F.size(sentences).alias("n_sentences"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(sentences)).cast("double")
            / F.size(sentences),
            6,
        ).alias("dup_sentence_ratio"),
    )
    return tagged.where(F.col("n_sentences") > 0)


@register(
    "dedup_connected_components",
    sql="""
    WITH RECURSIVE edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a
      JOIN documents b
        ON a.source = b.source
       AND abs(a.n_chars - b.n_chars) <= 2
       AND a.doc_id <> b.doc_id
    ),
    reach(id, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.root
      FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS doc_id, MIN(root) AS cluster_id
    FROM reach
    GROUP BY id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs → dedup CLUSTERS via iterative min-label
    connected components (ext/dedup.py::connected_components). The edge
    relation here is an oracle-expressible blocking proxy (same source,
    |n_chars| within 2) standing in for minhash/simhash candidate pairs —
    the component step is identical. The DuckDB oracle computes the same
    components with a recursive CTE (min reachable id).

    The range predicate is BANDED into the equi-join key: a plain
    same-source self-join compares every doc pair within a source
    (quadratic per group — ~100M comparisons at sf1) and filters after;
    banding n_chars into width-3 buckets (band width > max gap, so only
    same-or-adjacent bands can satisfy |Δ| ≤ 2) and exploding ONE side to
    its 3 candidate bands turns it into an equi-join on (source, band):
    each true pair is produced exactly once (a doc's 3 exploded bands are
    distinct), comparisons shrink to same-band pairs, and the original
    range filter stays as the exact check.

    Plain load_table, NOT _load_balanced (r17): the per-row work here is
    floor/explode/broadcast-probe — there is no CPU-heavy map stage for
    the guard to protect, and its round-robin exchange + 32-task
    scheduling measured 2-3× the single-task compute at sf0.1 (0.55s →
    1.3-2.0s for the edge build). On real multi-split inputs the guard
    is a no-op anyway, so removing it changes nothing at scale."""
    from etl_to_iceberg_spark.ext.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id").alias("src"),
        F.col("source").alias("src_source"),
        F.col("n_chars").alias("src_len"),
        F.floor(F.col("n_chars") / 3).alias("src_band"),
    )
    b = docs.select(
        F.col("doc_id").alias("dst"),
        F.col("source").alias("dst_source"),
        F.col("n_chars").alias("dst_len"),
        F.explode(
            F.array(
                F.floor(F.col("n_chars") / 3) - 1,
                F.floor(F.col("n_chars") / 3),
                F.floor(F.col("n_chars") / 3) + 1,
            )
        ).alias("dst_band"),
    )
    edges = (
        a.join(
            b,
            (F.col("src_source") == F.col("dst_source"))
            & (F.col("src_band") == F.col("dst_band")),
        )
        .where(
            (F.abs(F.col("src_len") - F.col("dst_len")) <= 2)
            & (F.col("src") < F.col("dst"))
        )
        .select("src", "dst")
    )
    return connected_components(edges, docs, id_col="doc_id")


@register(
    "split_leakage_safe",
    # The dedup_connected_components recursive-CTE oracle extended one
    # step: every doc inherits its CLUSTER's split, derived from the
    # representative (min-id) member's content fingerprint — `text`
    # inside _SQL_SPLIT resolves to the joined representative row.
    sql=f"""
    WITH RECURSIVE edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a
      JOIN documents b
        ON a.source = b.source
       AND abs(a.n_chars - b.n_chars) <= 2
       AND a.doc_id <> b.doc_id
    ),
    reach(id, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.root
      FROM reach JOIN edges e ON e.src = reach.id
    ),
    clusters AS (
      SELECT id AS doc_id, MIN(root) AS cluster_id
      FROM reach GROUP BY id
    )
    SELECT c.doc_id, c.cluster_id, {_SQL_SPLIT} AS split
    FROM clusters c JOIN documents rep ON rep.doc_id = c.cluster_id
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split: near-duplicate documents
    must never straddle a split boundary (the C4/GPT-3 contamination
    lesson — a test doc whose near-dup sits in train is a leaked
    answer), so the split is assigned per dedup CLUSTER, not per doc:
    connected components over the near-dup candidate edges, then every
    member inherits the split of the cluster's representative (min-id)
    document via the same content-hash bucketing as
    split_train_valid_test. Singleton docs degrade to exactly the
    per-doc content-hash split.

    Scale shape: the component step is the contraction-seeded CC
    (ext/dedup.py — fixpoint rounds 0 at sf0.1 and 10×); the
    representative fingerprint is ONE keyed join from the cluster id
    (which IS the representative's doc_id) back to the documents table
    — cluster-count rows against a pruned (doc_id, text) projection;
    no text ever shuffles (md5 is computed scan-side, the join carries
    the id and the one-char bucket)."""
    from etl_to_iceberg_spark.ext.sampling import assign_split

    clusters = dedup_connected_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    reps = docs.select(
        F.col("doc_id").alias("cluster_id"),
        assign_split("text").alias("split"),
    )
    return clusters.join(reps, on="cluster_id").select(
        "doc_id", "cluster_id", "split"
    )


@register(
    "corpus_pack_sequences",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, source, {_SQL_TOKENS_BPE} AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 512.0) AS BIGINT)
             AS seq_id,
           CAST((SUM(n_tokens) OVER w - n_tokens) % 512 AS BIGINT)
             AS seq_offset
    FROM toks
    WINDOW w AS (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk sequence packing for LM training: per source
    shard, docs in id order form one token stream cut every 512 tokens;
    each doc gets the sequence id + offset of its first token
    (ext/sampling.py::pack_sequences — one window, no UDF, no driver
    loop)."""
    from etl_to_iceberg_spark.ext.sampling import pack_sequences
    from etl_to_iceberg_spark.ext.text import token_count

    docs = _load_balanced(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    return pack_sequences(
        docs, tokens_col="n_tokens", group_col="source", budget=512
    )


@register(
    "multimodal_byte_segments",
    # DuckDB has no BLOB substring, so the oracle computes each segment's
    # offset/length arithmetically; Spark measures octet_length of the
    # REAL binary slice — equality proves the slicing is byte-exact.
    sql="""
    SELECT doc_id AS media_id,
           CAST(s AS INT) AS seg_no,
           CAST(s * 128 AS BIGINT) AS seg_offset,
           CAST(least(128, octet_length(encode(text)) - s * 128) AS INT)
               AS seg_len
    FROM documents,
         UNNEST(range(CAST(ceil(octet_length(encode(text)) / 128.0) AS INT)))
             AS t(s)
    """,
)
def multimodal_byte_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size byte segmentation of binary media — the chunked-upload /
    windowed-decode prep step (segment a blob BEFORE shipping it to a
    Pandas-UDF decoder so one 4 GB video never pins one task). Pure
    Catalyst: sequence+posexplode for segment numbers, SQL substring on
    the binary column for the actual slice; seg_len is measured from the
    sliced bytes, not inferred."""
    from etl_to_iceberg_spark.ext.multimodal import byte_segments

    docs = _load_balanced(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    return byte_segments(media, seg=128)


@register(
    "text_trim_duplicate_spans",
    sql="""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    p AS (
      SELECT doc_id, toks, unnest(range(len(toks) - 7)) AS pos
      FROM t WHERE len(toks) >= 8
    ),
    g AS (
      SELECT doc_id, pos,
             array_to_string(toks[pos + 1 : pos + 8], ' ') AS gram
      FROM p
    ),
    f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 64),
    gg AS (SELECT g.* FROM g JOIN f USING (gram)),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pos_a, b.pos AS pos_b
      FROM gg a JOIN gg b USING (gram) WHERE a.doc_id < b.doc_id
    ),
    i AS (
      SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag,
             pos_a - ROW_NUMBER() OVER (PARTITION BY id_a, id_b,
                                        pos_a - pos_b ORDER BY pos_a) AS grp
      FROM m
    ),
    spans AS (
      SELECT id_b AS doc_id, min(pos_b) AS b_start,
             max(pos_a) - min(pos_a) + 8 AS span_tokens
      FROM i GROUP BY id_a, id_b, diag, grp
      HAVING max(pos_a) - min(pos_a) + 8 >= 16
    ),
    ivs AS (
      SELECT doc_id,
             list(struct_pack(b_start := b_start,
                              span_tokens := span_tokens)) AS ivs
      FROM spans GROUP BY doc_id
    ),
    k AS (
      SELECT t.doc_id, t.toks,
             CASE WHEN i.ivs IS NULL THEN range(len(t.toks))
                  ELSE list_filter(range(len(t.toks)),
                       p -> len(list_filter(i.ivs,
                            iv -> p >= iv.b_start
                                  AND p < iv.b_start + iv.span_tokens)) = 0)
             END AS kept
      FROM t LEFT JOIN ivs i USING (doc_id)
    )
    SELECT doc_id,
           coalesce(array_to_string(list_transform(kept, p -> toks[p + 1]),
                                    ' '), '') AS text_clean,
           CAST(len(kept) AS INT) AS kept_tokens,
           CAST(len(toks) - len(kept) AS INT) AS removed_tokens
    FROM k
    """,
)
def text_trim_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup that TRIMS: duplicated passages (≥16 identical
    consecutive tokens shared with an earlier doc) are removed from the
    later doc; the earliest occurrence survives. One row per doc with
    the cleaned token stream and removal accounting — the
    Lee-et-al-style repetition removal whole-document dedup can't do."""
    from etl_to_iceberg_spark.ext.dedup import trim_duplicate_spans

    docs = _load_balanced(spark, sf_dir, "documents")
    return trim_duplicate_spans(docs, gram_n=8, min_span_tokens=16)
