"""Extension-operator tests: planted near-duplicates for the LSH paths,
recall for approximate similarity, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_to_iceberg_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with known near-duplicate pairs: (1,2) share ~90% of words,
    (3,4) are identical, 5/6/7 are unrelated."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm window sill and the birds sing in the garden trees"
    )
    near = base.replace("garden", "village").replace("warm", "cold")
    rows = [
        (1, base),
        (2, near),
        (3, "completely different content about spark shuffles and joins"),
        (4, "completely different content about spark shuffles and joins"),
        (5, "unrelated text mentioning databases tables and columns only"),
        (6, "weather report says rain tomorrow with strong northern winds"),
        (7, "recipe for bread flour water salt yeast and patience required"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(planted):
    from etl_to_iceberg_spark.ext.dedup import exact_dedup

    out = exact_dedup(planted)
    ids = {r.doc_id for r in out.collect()}
    assert 3 in ids and 4 not in ids  # identical pair deduped
    assert ids.issuperset({1, 2, 5, 6, 7})  # near-dups NOT removed by exact


def test_minhash_lsh_finds_planted_pairs(planted):
    from etl_to_iceberg_spark.ext.dedup import minhash_near_duplicates

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(planted, threshold=0.5).collect()
    }
    assert (3, 4) in pairs  # identical
    assert (1, 2) in pairs  # high-overlap
    for p in pairs:  # no false positives among unrelated docs
        assert p in {(1, 2), (3, 4)}


def test_minhash_from_bands_equals_fused_pipeline(spark, sf_dir):
    """The sidecar split (minhash_pairs_from_bands over materialized
    (doc_id, fp, band_hashes) rows — what the registered dedup_minhash_lsh
    query runs since r8) must stay output-identical to the fused
    minhash_near_duplicates pipeline, collapse edges and all."""
    from etl_to_iceberg_spark.ext.dedup import (
        fingerprint,
        minhash_near_duplicates,
        minhash_pairs_from_bands,
        minhash_signatures,
    )
    from etl_to_iceberg_spark.ext.incremental import band_hashes

    docs = load_table(spark, sf_dir, "documents").limit(300)
    side = minhash_signatures(
        docs, extra_cols=[fingerprint("text").alias("fp")]
    ).select("doc_id", "fp", band_hashes("sig", bands=16).alias("band_hashes"))
    split = {tuple(r) for r in
             minhash_pairs_from_bands(side, docs, threshold=0.6).collect()}
    fused = {tuple(r) for r in
             minhash_near_duplicates(docs, threshold=0.6).collect()}
    assert split == fused


def test_simhash_identical_and_near(planted):
    from etl_to_iceberg_spark.ext.dedup import simhash, simhash_near_duplicates

    sigs = {r.doc_id: r.simhash for r in simhash(planted).collect()}
    assert sigs[3] == sigs[4]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_duplicates(planted, max_hamming=3).collect()
    }
    assert pairs[(3, 4)] == 0
    assert (5, 6) not in pairs and (6, 7) not in pairs


def test_ngram_jaccard_pairs_bounded(planted):
    from etl_to_iceberg_spark.ext.dedup import ngram_jaccard_pairs

    grouped = planted.withColumn("g", F.lit("all"))
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            grouped, group_col="g", shingle_n=1, threshold=0.5
        ).collect()
    }
    assert pairs[(3, 4)] == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8


def test_lsh_bucket_folded_matches_unrolled(spark, sf_dir):
    """lsh_bucket_expr folds the plane loop with Horner's scheme; stored
    index buckets depend on it staying bit-identical to the per-plane
    reference (`_hyperplane_sign` unrolled in Python) forever."""
    from etl_to_iceberg_spark.ext.similarity import (
        _hyperplane_sign,
        _to_double,
        lsh_bucket_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    v = _to_double("embedding")
    for planes in (4, 6, 8):
        unrolled = sum(
            _hyperplane_sign(v, p, 64) * (1 << p) for p in range(planes)
        )
        df = emb.select(
            lsh_bucket_expr(v, planes=planes, dim=64).alias("n"),
            unrolled.alias("o"),
        )
        assert df.schema["n"].dataType == df.schema["o"].dataType
        assert df.where("n IS DISTINCT FROM o").count() == 0


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    from etl_to_iceberg_spark.ext.similarity import cosine_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5, planes=4)
    hits = exact.join(approx, on=["query_id", "vec_id"], how="left_semi").count()
    recall = hits / exact.count()
    # 4 planes over 64-dim random embeddings: modest but nonzero recall;
    # self-match (query in corpus) is always found, so recall >= 1/k.
    assert recall >= 0.2
    # every query must at least find itself at rank 1 with score 1.0
    self_hits = approx.where(
        (F.col("query_id") == F.col("vec_id")) & (F.col("rank") == 1)
    ).count()
    assert self_hits == 3


def test_cosine_topk_self_is_top1(spark, sf_dir):
    from etl_to_iceberg_spark.ext.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk(emb, q, k=3).orderBy("rank").collect()
    assert top[0].vec_id == 7 and top[0].score == 1.0


def test_multimodal_feature_determinism_and_stub(spark):
    from etl_to_iceberg_spark.ext.multimodal import (
        MediaCodecUnavailable,
        decode_image,
        extract_features,
        fake_features,
    )

    assert fake_features(b"abc") == fake_features(b"abc")
    assert fake_features(b"abc") != fake_features(b"abd")
    assert len(fake_features(b"abc", dim=8)) == 8
    with pytest.raises(MediaCodecUnavailable):
        decode_image(b"\x89PNG")

    df = spark.createDataFrame(
        [(1, bytearray(b"hello")), (2, bytearray(b""))],
        "media_id long, content binary",
    )
    out = {r.media_id: r for r in extract_features(df).collect()}
    assert out[1].byte_len == 5 and out[2].byte_len == 0
    assert out[1].feature == fake_features(b"hello")


def test_frame_sampling_counts(spark):
    from etl_to_iceberg_spark.ext.multimodal import sample_frames

    df = spark.createDataFrame([(1, 100), (2, 10)], "media_id long, duration_ms long")
    out = sample_frames(df, every_ms=25)
    counts = {r[0]: r[1] for r in out.groupBy("media_id").count().collect()}
    assert counts == {1: 4, 2: 1}  # 0,25,50,75 | 0


def test_lang_id_on_real_phrases(spark):
    from etl_to_iceberg_spark.ext.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and that is fine"),
            (2, "el perro de la casa que ladra por la noche"),
            (3, "le chat est dans les arbres pour la nuit"),
            (4, "der hund ist nicht mit der katze und das ist gut"),
            (5, "xyzzy plugh"),
        ],
        "id long, text string",
    )
    out = {r.id: r.lang for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "unknown"}


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    from etl_to_iceberg_spark.ext.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, nlist=8, nprobe=4)
    hits = exact.join(approx, on=["query_id", "vec_id"], how="left_semi").count()
    recall = hits / exact.count()
    # probing half the cells (4/8) must recover a solid share of true
    # neighbours; the self-match is always in the query's own best cell.
    assert recall >= 0.4
    self_hits = approx.where(
        (F.col("query_id") == F.col("vec_id")) & (F.col("rank") == 1)
    ).count()
    assert self_hits == 3


def test_ann_recall_monotone_in_candidates(spark, sf_dir):
    """The accuracy knobs must actually trade candidates for recall, not
    just produce nonzero recall (VERDICT r5 #6): fewer LSH planes =>
    coarser buckets => recall weakly higher; more IVF probes => recall
    weakly higher, and probing EVERY cell recovers the exact result. The
    fixture is picked so the inequalities are strict at the compared
    settings."""
    from etl_to_iceberg_spark.ext.similarity import cosine_topk, ivf_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    exact_n = exact.count()

    def recall(approx):
        return (
            exact.join(approx, on=["query_id", "vec_id"], how="left_semi").count()
            / exact_n
        )

    lsh = {p: recall(lsh_topk(emb, queries, k=5, planes=p)) for p in (2, 6)}
    assert lsh[2] > lsh[6], lsh  # strict on this fixture
    assert lsh[6] > 0.0

    ivf = {np_: recall(ivf_topk(emb, queries, k=5, nlist=8, nprobe=np_))
           for np_ in (1, 4, 8)}
    assert ivf[1] <= ivf[4] <= ivf[8], ivf  # monotone in probes
    assert ivf[1] < ivf[8], ivf  # strict across the full knob range
    assert ivf[8] == 1.0, ivf  # probing all 8 cells IS the exact search

    # batch multiprobe (r8): recall weakly monotone in probes at fixed
    # planes, and candidate sets nest (a probes=1 result row survives in
    # every wider ring — masks are a prefix chain), so the own-bucket
    # hits can only be re-ranked, never lost below rank k by adding
    # WORSE candidates... they can be displaced by BETTER ones, which is
    # exactly what higher recall means.
    mp = {pr: recall(lsh_topk(emb, queries, k=5, planes=6, probes=pr))
          for pr in (1, 7, 22)}
    assert mp[1] <= mp[7] <= mp[22], mp
    assert mp[1] < mp[22], mp  # strict across the full ring on this fixture

    with pytest.raises(ValueError, match="probes"):
        lsh_topk(emb, queries, k=5, planes=4, probes=12)  # max is 11


def test_connected_components_planted_graph(spark):
    from etl_to_iceberg_spark.ext.dedup import connected_components

    # components: {1,2,3,4} (path), {10,11} (pair), {20} (isolated)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "doc_id long"
    )
    out = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, nodes).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain_converges_log_rounds(spark):
    """A 300-node path has diameter ~300: one-hop min-label propagation
    would need ~299 rounds and silently return a half-propagated labeling
    at the default max_iterations=50. Pointer doubling must collapse the
    chain within O(log n) rounds — every node labels 0."""
    from etl_to_iceberg_spark.ext.dedup import connected_components

    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, nodes, max_iterations=50).collect()
    }
    assert set(out.values()) == {0}
    assert len(out) == n


def test_connected_components_cross_partition_bridges(spark):
    """Force the edge list across many partitions so components span
    partitions and the r11 BRIDGE fixpoint (not just the per-partition
    union-find contraction) carries the merge. AQE coalesces small edge
    relations to one partition in the composite queries, so without an
    explicit repartition this path would only ever run at scale. Chains
    interleave ids (i, i+500, ...) so hash partitioning scatters each
    component widely; expected label = min id of each chain."""
    from etl_to_iceberg_spark.ext.dedup import connected_components

    # 10 chains of 50 nodes each: chain c holds ids {c, c+10, c+20, ...}
    edges_rows = [
        (c + 10 * j, c + 10 * (j + 1)) for c in range(10) for j in range(49)
    ]
    edges = spark.createDataFrame(edges_rows, "src long, dst long").repartition(16)
    nodes = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    # driver_bridge_max=0 forces the DISTRIBUTED fixpoint (a bridge this
    # small would otherwise take the driver union-find shortcut)
    stats: dict = {}
    out = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            edges, nodes, stats=stats, driver_bridge_max=0
        ).collect()
    }
    assert out == {i: i % 10 for i in range(500)}
    # the contraction alone cannot finish a 16-partition interleaved
    # chain — the bridge fixpoint must actually run
    assert stats["rounds"] >= 1
    assert stats["bridge_strategy"] == "pointer-doubling"
    # and the default driver shortcut must produce the identical labels
    stats2: dict = {}
    out2 = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, nodes, stats=stats2).collect()
    }
    assert out2 == out
    assert stats2["bridge_strategy"] == "driver" and stats2["rounds"] == 0


def test_minhash_identical_flood_is_collapsed_not_quadratic(spark):
    """10k byte-identical docs — the crawl-boilerplate pathology. The
    exact-collapse guard must reduce the LSH join to ONE representative
    (no quadratic bucket), re-emitting (rep, member) edges: exactly n-1
    pairs, all anchored at the min id, instead of n·(n-1)/2."""
    from etl_to_iceberg_spark.ext.dedup import minhash_near_duplicates

    n = 10_000
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        "'identical boilerplate header shared by every page' AS text",
    )
    out = minhash_near_duplicates(docs, threshold=0.5)
    assert out.count() == n - 1
    assert out.where(F.col("id_a") != 0).count() == 0


def test_lsh_bucket_cap_skips_oversized_buckets(spark):
    """Distinct docs forced into one band bucket via identical signatures
    are dropped when the bucket exceeds the cap (countable via
    oversized_buckets)."""
    from etl_to_iceberg_spark.ext.dedup import (
        lsh_candidate_pairs,
        oversized_buckets,
    )

    # hand-built signatures: 50 ids share one signature (one hot bucket),
    # 2 ids share another (a small, legitimate bucket)
    hot = [(i, [1, 2, 3, 4]) for i in range(50)]
    small = [(100, [9, 9, 9, 9]), (101, [9, 9, 9, 9])]
    sigs = spark.createDataFrame(
        hot + small, "doc_id long, sig array<bigint>"
    )
    capped = lsh_candidate_pairs(sigs, bands=2, max_bucket_size=10)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert pairs == {(100, 101)}  # hot bucket skipped, small bucket kept
    banded_keys = ["band", "band_hash"]
    # the drop is observable: the hot bucket shows up in the stats frame
    from pyspark.sql import functions as SF

    rows_per_band = SF.size(SF.col("sig")) / 2
    banded = sigs.select(
        "doc_id",
        SF.posexplode(
            SF.transform(
                SF.sequence(SF.lit(0), SF.lit(1)),
                lambda b: SF.xxhash64(
                    SF.concat_ws(
                        ",",
                        SF.transform(
                            SF.slice(
                                SF.col("sig"),
                                (b * rows_per_band + 1).cast("int"),
                                rows_per_band.cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    assert oversized_buckets(banded, banded_keys, 10).count() == 2  # 2 bands


def test_ivf_kmeans_recall_vs_bruteforce(spark, sf_dir):
    from etl_to_iceberg_spark.ext.similarity import cosine_topk, ivf_kmeans_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_kmeans_topk(emb, queries, k=5, nlist=8, nprobe=4)
    hits = exact.join(approx, on=["query_id", "vec_id"], how="left_semi").count()
    recall = hits / exact.count()
    # probing half the trained cells: strong recall expected; the run is
    # seeded, so this is a deterministic bound, not a flaky one
    assert recall >= 0.5
    self_hits = approx.where(
        (F.col("query_id") == F.col("vec_id")) & (F.col("rank") == 1)
    ).count()
    assert self_hits == 3


def test_semantic_dedup_planted_twins_and_cluster_cap(spark):
    """semantic_dedup_pairs finds planted identical embeddings within a
    cluster (cos 1.0), never pairs ACROSS clusters, and drops clusters
    over max_cluster_size from pairing entirely."""
    from etl_to_iceberg_spark.ext.similarity import semantic_dedup_pairs

    # two well-separated clusters: axis-0 family (ids 0-3, with 0 and 1
    # identical) and axis-1 family (ids 10-12, all identical)
    def v(axis, eps, i):
        base = [0.0] * 8
        base[axis] = 1.0
        base[7] = eps * i
        return base

    rows = (
        [(0, v(0, 0.0, 0)), (1, v(0, 0.0, 0))]
        + [(i, v(0, 0.01, i)) for i in (2, 3)]
        + [(10 + i, v(1, 0.0, 0)) for i in range(3)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, v(0, 0.0, 0)), (1, v(1, 0.0, 0))], "cell int, __cent array<double>"
    )
    pairs = semantic_dedup_pairs(emb, cents, threshold=0.99).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got  # planted identical pair
    assert {(10, 11), (10, 12), (11, 12)} <= got  # in-cluster triple
    assert all(r.cos_sim >= 0.99 for r in pairs)
    assert not any(a < 10 <= b for a, b in got)  # never across clusters

    # cap: the 3-member axis-1 cluster is dropped wholesale at cap 2,
    # the axis-0 cluster (4 members) too; nothing survives at cap 2 but
    # the axis-1 triple does at cap 3
    assert semantic_dedup_pairs(
        emb, cents, threshold=0.99, max_cluster_size=2
    ).count() == 0
    capped3 = semantic_dedup_pairs(
        emb, cents, threshold=0.99, max_cluster_size=3
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped3} == {(10, 11), (10, 12), (11, 12)}


def test_chunk_documents_covers_and_overlaps_exactly(spark):
    """Chunking invariants: chunk 0 plus each later chunk minus its
    `overlap` leading tokens reconstructs the token stream exactly; every
    chunk except the last is full; short docs yield one chunk."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.text import chunk_documents

    texts = [
        (1, " ".join(f"tok{i}" for i in range(100))),
        (2, " ".join(f"w{i}" for i in range(32))),   # exactly one window
        (3, "short doc"),
        (4, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = (
        df.select(
            "doc_id",
            F.posexplode(chunk_documents("text", chunk_tokens=32, overlap=8)),
        )
        .select("doc_id", "col.*")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)

    for doc_id, text in texts:
        toks = text.split()
        chunks = by_doc[doc_id]
        # reconstruction
        rebuilt = chunks[0].chunk_text.split()
        for c in chunks[1:]:
            rebuilt.extend(c.chunk_text.split()[8:])
        assert rebuilt == toks, doc_id
        # all but the last chunk are full windows
        assert all(c.n_tokens == 32 for c in chunks[:-1])
        assert all(c.n_tokens == len(c.chunk_text.split()) for c in chunks if c.chunk_text)
        if len(toks) <= 32:
            assert len(chunks) == 1

    with _pytest.raises(ValueError):
        chunk_documents("text", chunk_tokens=16, overlap=16)


def test_exact_substring_spans_semantics(spark):
    """Span dedup invariants: a planted shared passage is found ONCE as a
    maximal span at the right offsets; short overlaps stay below
    min_span_tokens; hash and text join keys agree; no cross product."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.dedup import exact_substring_spans

    passage = " ".join(f"shared{i}" for i in range(20))  # 20-token passage
    short = " ".join(f"tiny{i}" for i in range(10))      # 10 < min_span 16
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + passage + " delta epsilon"),
            (2, "one two three four five " + passage + " six seven"),
            (3, "unrelated words entirely " + short + " here now"),
            (4, "other material with " + short + " also present"),
        ],
        "doc_id long, text string",
    )
    spans = exact_substring_spans(docs, gram_n=8, min_span_tokens=16).collect()
    assert len(spans) == 1  # maximal: one span, not a run of sub-spans
    s = spans[0]
    assert (s.id_a, s.id_b) == (1, 2)
    assert s.span_tokens == 20
    assert s.a_start == 3 and s.b_start == 5  # 0-based token offsets

    # text-key mode agrees with the hash-key default
    spans_txt = exact_substring_spans(
        docs, gram_n=8, min_span_tokens=16, use_hash=False
    ).collect()
    assert [tuple(r) for r in spans_txt] == [tuple(r) for r in spans]

    from etl_to_iceberg_spark.plans import explain_str

    plan = explain_str(exact_substring_spans(docs), "formatted")
    assert "CartesianProduct" not in plan


def test_exact_substring_hot_gram_cap_drops_boilerplate(spark):
    """A passage repeated across MANY docs (boilerplate) exceeds
    max_gram_freq and is dropped from anchoring — the quadratic-bucket
    guard; a rare shared passage in the same corpus is still found."""
    from etl_to_iceberg_spark.ext.dedup import exact_substring_spans

    boiler = " ".join(f"b{i}" for i in range(16))
    rare = " ".join(f"r{i}" for i in range(16))
    rows = [(i, f"doc number {i} says " + boiler) for i in range(50)]
    rows += [(100, "prefix words " + rare), (101, "other prefix " + rare)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    spans = exact_substring_spans(
        docs, gram_n=8, min_span_tokens=16, max_gram_freq=16
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in spans}
    assert pairs == {(100, 101)}  # boilerplate flood suppressed

    uncapped = exact_substring_spans(
        docs, gram_n=8, min_span_tokens=16, max_gram_freq=None
    )
    assert uncapped.where("id_a < 100").count() == 50 * 49 // 2


def test_byte_segments_reconstruct_content(spark):
    """Concatenating a doc's byte segments in order must reproduce the
    original UTF-8 payload exactly (segmentation loses nothing, overlaps
    nothing) — including multi-byte codepoints split across boundaries."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.multimodal import byte_segments

    texts = [(1, "héllo wörld " * 40), (2, "short"), (3, "")]
    df = spark.createDataFrame(texts, "media_id long, text string")
    seg = 32
    media = df.select("media_id", F.col("text").cast("binary").alias("content"))
    segs = byte_segments(media, seg=seg)
    parts = (
        segs.join(media, on="media_id")
        .select(
            "media_id", "seg_no",
            F.expr(f"substring(content, seg_no * {seg} + 1, {seg})").alias("b"),
        )
        .collect()
    )
    rebuilt: dict[int, bytes] = {}
    for r in sorted(parts, key=lambda r: (r.media_id, r.seg_no)):
        rebuilt[r.media_id] = rebuilt.get(r.media_id, b"") + bytes(r.b)
    for mid, text in texts:
        assert rebuilt.get(mid, b"") == text.encode("utf-8")


def test_byte_segments_empty_payload_emits_no_rows(spark):
    """A zero-byte payload yields ZERO segment rows — unguarded,
    sequence(0, ceil(0/seg)-1) = sequence(0, -1) is the DESCENDING
    [0, -1] and posexplode emitted two phantom segments (one claimed at
    offset 128 of a 0-byte blob). Non-empty payloads are unaffected."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.multimodal import byte_segments

    media = spark.createDataFrame(
        [(1, ""), (2, "x" * 200)], "media_id long, text string"
    ).select("media_id", F.col("text").cast("binary").alias("content"))
    rows = byte_segments(media, seg=128).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert 1 not in by_id
    assert [(r.seg_no, r.seg_offset, r.seg_len) for r in sorted(
        by_id[2], key=lambda r: r.seg_no
    )] == [(0, 0, 128), (1, 128, 72)]


def test_trim_duplicate_spans_removes_later_copy(spark):
    """The later doc loses exactly the shared passage; the earlier doc is
    untouched; a doc fully contained in an earlier one trims to empty;
    and the trimmed corpus is span-free (fixpoint)."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.dedup import (
        exact_substring_spans,
        trim_duplicate_spans,
    )

    passage = " ".join(f"shared{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + passage + " delta epsilon"),
            (2, "one two three four five " + passage + " six seven"),
            (3, passage),  # fully contained in doc 1's passage
            (4, "totally unrelated words about nothing in particular here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in trim_duplicate_spans(
            docs, gram_n=8, min_span_tokens=16
        ).collect()
    }
    assert out[1].removed_tokens == 0  # earliest occurrence survives
    assert out[1].text_clean.startswith("alpha beta gamma shared0")
    assert out[2].removed_tokens == 20
    assert out[2].text_clean == "one two three four five six seven"
    assert out[3].text_clean == "" and out[3].kept_tokens == 0
    assert out[4].removed_tokens == 0

    cleaned = spark.createDataFrame(
        [(k, v.text_clean) for k, v in out.items()], "doc_id long, text string"
    )
    assert exact_substring_spans(cleaned, gram_n=8, min_span_tokens=16).count() == 0


def test_trim_duplicate_spans_survives_tokenless_docs(spark):
    """A doc with NO word tokens (empty, punctuation-only, emoji-only)
    must trim to an empty clean text, not abort the job — unguarded,
    the kept-position list was sequence(0, -1) = [0, -1] and element_at
    indexed past the empty token array (INVALID_ARRAY_INDEX)."""
    from etl_to_iceberg_spark.ext.dedup import trim_duplicate_spans

    passage = " ".join(f"shared{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + passage),
            (2, "!!! ??? ..."),          # tokenless
            (3, ""),                     # empty
            (4, passage + " tail words"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in trim_duplicate_spans(docs, gram_n=8, min_span_tokens=16).collect()
    }
    assert len(out) == 4
    assert out[2].text_clean == "" and out[2].kept_tokens == 0
    assert out[2].removed_tokens == 0
    assert out[3].text_clean == "" and out[3].kept_tokens == 0
    assert out[4].removed_tokens == 20  # the real span still trims


@pytest.mark.parametrize("chunk_tokens,overlap", [(32, 8), (16, 0), (10, 9)])
def test_chunk_documents_params_reconstruct(spark, chunk_tokens, overlap):
    """Reconstruction invariant across parameter corners: any
    (chunk_tokens, overlap) with 0 <= overlap < chunk_tokens rebuilds
    the exact token stream, including zero overlap and maximal overlap
    (stride 1)."""
    import random

    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.text import chunk_documents

    rng = random.Random(chunk_tokens * 100 + overlap)
    texts = [
        (i, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(0, 70))))
        for i in range(12)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = (
        df.select(
            "doc_id",
            F.posexplode(
                chunk_documents("text", chunk_tokens=chunk_tokens, overlap=overlap)
            ),
        )
        .select("doc_id", "col.*")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in texts:
        toks = text.split()
        chunks = by_doc[doc_id]
        rebuilt = chunks[0].chunk_text.split()
        for c in chunks[1:]:
            rebuilt.extend(c.chunk_text.split()[overlap:])
        assert rebuilt == toks, (doc_id, chunk_tokens, overlap)


def test_chunk_documents_null_text_yields_one_empty_chunk(spark):
    """NULL text must chunk exactly like '' — one chunk, empty text,
    n_tokens 0. Unguarded, size(NULL)=NULL made greatest/least SKIP the
    null operand and the doc reported one chunk claiming n_tokens =
    chunk_tokens, corrupting downstream token accounting (packing,
    shard budgeting)."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.text import chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "three little tokens")],
        "doc_id long, text string",
    )
    rows = (
        df.select(
            "doc_id",
            F.posexplode(chunk_documents("text", chunk_tokens=32, overlap=8)),
        )
        .select("doc_id", "col.*")
        .collect()
    )
    by_doc = {r.doc_id: r for r in rows}
    assert len(rows) == 3  # one chunk per doc, no phantom extras
    for doc_id in (1, 2):  # NULL and '' are indistinguishable
        r = by_doc[doc_id]
        assert (r.chunk_id, r.chunk_text, r.n_tokens) == (0, "", 0), doc_id
    assert by_doc[3].n_tokens == 3


def test_byte_segments_handles_keyword_column_names(spark):
    """Column names are passed through typed APIs, not interpolated into
    a SQL string: a binary column named after a SQL keyword ('order')
    must segment fine."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.multimodal import byte_segments

    media = spark.createDataFrame(
        [(1, "x" * 200)], "media_id long, text string"
    ).select("media_id", F.col("text").cast("binary").alias("order"))
    rows = byte_segments(media, content_col="order", seg=128).collect()
    assert sorted((r.seg_no, r.seg_len) for r in rows) == [(0, 128), (1, 72)]


def test_ensure_sidecar_writes_once_per_sf(spark, sf_dir, tmp_path):
    """The oracle sidecars follow the stored-index convention: one write
    per (path, sf_dir) judged by the on-disk _sfkey marker; a different
    sf_dir, an externally-deleted path, or markerless foreign content
    triggers a rewrite (r8: a sibling process's exit cleanup emptied the
    shared /tmp path mid-suite and the old in-process memo skipped the
    rebuild, serving the lint's 1-row schema seed to the oracle)."""
    from etl_to_iceberg_spark.ext import queries as Q

    path = str(tmp_path / "sidecar")
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).withColumnRenamed("id", "doc_id")

    Q._ensure_sidecar(path, sf_dir, build)
    Q._ensure_sidecar(path, sf_dir, build)  # same sf: no rewrite
    assert len(calls) == 1
    Q._ensure_sidecar(path, sf_dir + "/..", build)  # different sf: rewrite
    assert len(calls) == 2

    # external deletion (a sibling process's exit cleanup removing the
    # shared /tmp path) must trigger a rebuild, not a blind skip
    import shutil

    shutil.rmtree(path)
    Q._ensure_sidecar(path, sf_dir + "/..", build)
    assert len(calls) == 3

    # markerless foreign content (e.g. the oracle lint's schema seed
    # written into an empty path) must be overwritten, not served
    shutil.rmtree(path)
    spark.range(1).withColumnRenamed("id", "doc_id").write.mode(
        "overwrite"
    ).parquet(path)
    Q._ensure_sidecar(path, sf_dir + "/..", build)
    assert len(calls) == 4


def _write_docs(spark, tmp_path, rows):
    """Materialize a planted documents table where load_table expects it."""
    spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_importance_resample_keeps_target_vocabulary(spark, tmp_path):
    """corpus_importance_resample keeps exactly the docs written in the
    target (en) vocabulary: with 5 en-vocab and 5 de-exclusive-vocab docs
    the median importance weight falls strictly between the groups, so the
    above-median keep rule selects the en-vocab half — including the
    de-labeled doc that happens to use target vocabulary (DSIR scores
    CONTENT, not the label)."""
    from etl_to_iceberg_spark.ext.corpus_queries import (
        corpus_importance_resample,
    )

    en_texts = [
        "alpha",
        "alpha beta",
        "alpha beta alpha",
        "beta beta alpha alpha",
        "alpha beta beta",  # planted: de-labeled but target-vocabulary
    ]
    de_texts = [
        "gamma",
        "gamma delta",
        "gamma delta gamma",
        "delta delta gamma gamma",
        "gamma delta delta",
    ]
    rows = [(t, "en") for t in en_texts[:4]] + [(en_texts[4], "de")]
    rows += [(t, "de") for t in de_texts]
    sf = _write_docs(spark, tmp_path, rows)

    kept = corpus_importance_resample(spark, sf).collect()
    kept_ids = {r.doc_id for r in kept}
    assert kept_ids == {0, 1, 2, 3, 4}, kept_ids  # all target-vocab docs
    assert all(r.weight > 0 for r in kept)  # target vocab scores positive


def test_tfidf_topk_ranks_discriminative_terms(spark, tmp_path):
    """text_tfidf_topk puts rare (discriminative) terms above corpus-wide
    ones: a term in every doc has idf ln(N/N)=0; tokenless docs emit no
    rows at all."""
    import math

    from etl_to_iceberg_spark.ext.corpus_queries import text_tfidf_topk

    sf = _write_docs(
        spark,
        tmp_path,
        [
            ("common common rare1", "en"),
            ("common rare2 rare2", "en"),
            ("common", "en"),
            ("???", "en"),  # no [a-z0-9]+ tokens -> absent from output
        ],
    )
    out = text_tfidf_topk(spark, sf).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {0, 1, 2}
    # N counts ALL documents (the tokenless doc is still a document), so
    # idf(rare)=ln(4/1) and idf(common)=ln(4/3) — rare still outranks
    ln4, ln43 = math.log(4.0), math.log(4.0 / 3.0)
    assert [r.token for r in by_doc[0]] == ["rare1", "common"]
    assert by_doc[0][0].tfidf == round(ln4, 6)
    assert by_doc[0][1].tfidf == round(2 * ln43, 6)
    # doc 1: rare2 tf=2 -> 2*ln4
    assert [r.token for r in by_doc[1]] == ["rare2", "common"]
    assert by_doc[1][0].tfidf == round(2 * ln4, 6)
    # doc 2: its only term still surfaces
    assert [(r.token, r.rk) for r in by_doc[2]] == [("common", 1)]
    # per-doc cap: never more than 3 rows
    assert max(len(v) for v in by_doc.values()) <= 3


def test_knn_graph_ranks_within_cluster_only(spark):
    """knn_graph ranks neighbors by cosine within the vector's own
    cluster, never across clusters; a singleton cluster emits no rows;
    an over-cap cluster is dropped from the graph entirely."""
    from etl_to_iceberg_spark.ext.similarity import knn_graph

    def v(axis, tilt=0.0):
        base = [0.0] * 4
        base[axis] = 1.0
        base[3] = tilt
        return base

    # cluster 0: ids 0,1,2 — 1 is tilted closer to 0 than 2 is
    # cluster 1: id 10 alone
    # cluster 2: ids 20..23 — over the cap of 3
    rows = (
        [(0, v(0)), (1, v(0, 0.1)), (2, v(0, 0.4))]
        + [(10, v(1))]
        + [(20 + i, v(2, 0.01 * i)) for i in range(4)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, v(0)), (1, v(1)), (2, v(2))], "cell int, __cent array<double>"
    )
    got = {
        (r.vec_id, r.rk): r.nbr_id
        for r in knn_graph(emb, cents, k=2, max_cluster_size=3).collect()
    }
    # cluster 0 only: 3 vectors, each with its 2 in-cluster neighbors
    assert set(v_id for v_id, _ in got) == {0, 1, 2}
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2  # 1 is closer to 0
    assert got[(1, 1)] == 0  # cos(0.1-tilt, flat) ≈ .995 > cos(.1,.4) ≈ .961
    assert got[(2, 1)] == 1  # for the far tilt the mid vector is nearest


def test_pq_adc_recall_vs_bruteforce(spark, sf_dir):
    """IVF-PQ with trained codebooks on the (unit-norm) fixture, both
    modes vs exact cosine top-5: the refine tail must recover most of
    what pure-ADC ranking loses to quantization error (the fixture is
    near-isotropic — the hardest regime, SCALING.md "ANN recall").
    Seeded training + deterministic tie-breaks make the bounds stable,
    not flaky. Measured: pure ADC 0.33, rerank=64 0.73."""
    from etl_to_iceberg_spark.ext.similarity import (
        _to_double,
        cosine_topk,
        ivf_kmeans_centroids,
        pq_adc_topk,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5)
    cents = ivf_kmeans_centroids(emb, nlist=8, train_fraction=0.5)
    cbs = pq_train_codebooks(emb, m=8, dsub=8, ksub=16, train_rows=256)
    c = emb.select("vec_id", _to_double("embedding").alias("__v"))
    q = queries.select("query_id", _to_double("embedding").alias("__v"))
    n_exact = exact.count()

    pure = pq_adc_topk(c, q, cents, cbs, k=5, nprobe=4, m=8, dsub=8)
    pure_recall = (
        exact.join(pure, on=["query_id", "vec_id"], how="left_semi").count()
        / n_exact
    )
    refined = pq_adc_topk(
        c, q, cents, cbs, k=5, nprobe=4, m=8, dsub=8, rerank=64
    )
    ref_recall = (
        exact.join(refined, on=["query_id", "vec_id"], how="left_semi").count()
        / n_exact
    )
    assert pure_recall >= 0.2, pure_recall
    assert ref_recall >= 0.5, ref_recall
    assert ref_recall >= pure_recall  # the refine stage can only help
