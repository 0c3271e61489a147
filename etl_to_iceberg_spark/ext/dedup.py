"""Deduplication operators for training-data pipelines.

Five strategies, each the idiomatic Spark shape for its scale profile:

- **Exact** (`exact_dedup`): fingerprint → window keep-first. One shuffle
  on the hash; at 100 TB the shuffle carries (hash, doc_id), not the text.
- **MinHash + LSH** (`minhash_signatures`, `lsh_candidate_pairs`,
  `minhash_near_duplicates`): shingle → k minhashes (xxhash64 with seed
  salts — JVM-side, no Python) → band buckets → candidate pairs from
  equi-joins on (band, hash) → exact Jaccard verification on candidates
  only. Pairwise cost collapses from O(n²) to O(colliding pairs).
- **SimHash** (`simhash`, `simhash_near_duplicates`): 32-bit sign-sum
  sketch; near-dups = pairs within Hamming distance d, candidates via
  byte-band equi-join (pigeonhole: d<4 ⇒ one of 4 bytes equal).
- **N-gram Jaccard** (`ngram_jaccard_pairs`): exact set similarity on
  bounded candidate sets (e.g. within a partition key) — the verifier the
  LSH paths share.
- **Embedding cosine** (`embedding_near_duplicates` in ext/similarity.py):
  semantic near-dup over the embeddings table.

All hash-based sketches use Spark's xxhash64 — stable across runs,
executors, and Spark versions, so signatures are reproducible cluster-wide.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window, functions as F

from etl_to_iceberg_spark.caching import tracked_cache
from etl_to_iceberg_spark.ext.text import _let, fingerprint, normalize_text, words
from etl_to_iceberg_spark.scratch import scratch_dir


# --- exact -----------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (lowest id) per identical normalized text."""
    from etl_to_iceberg_spark.plans import ensure_parallelism

    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        ensure_parallelism(df)
        .withColumn("__fp", fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__fp", "fingerprint")
    )


# --- shingles --------------------------------------------------------------


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    The token array is LET-BOUND (ext/text._let) so tokenization runs
    once per row. The unbound form referenced the
    ``regexp_extract_all`` tokenizer subtree from INSIDE the sliding-
    window ``transform`` lambda — and higher-order functions are
    CodegenFallback (interpreted, no common-subexpression elimination),
    so every shingle POSITION re-tokenized the text: |tokens|+3
    tokenizations per row instead of one. Measured r18 (guide §1.2
    per-task work): the minhash sketch fold over the sf0.1 tick batch
    dropped ~8s → ~1.3s of executor CPU, bit-identical signatures
    (same expressions, only bound to a lambda slot)."""
    c = F.col(col) if isinstance(col, str) else col
    if n == 1:
        return F.array_distinct(words(normalize_text(c)))

    def body(toks: Column) -> Column:
        # sliding window join of n consecutive tokens
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        sh = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        )
        return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
            F.array(F.concat_ws(" ", toks))
        )

    from etl_to_iceberg_spark.ext.text import _let

    return _let(words(normalize_text(c)), body)


# --- minhash + LSH ---------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
    extra_cols: list[Column] | None = None,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) via min over seeded xxhash64.

    SHUFFLE-FREE SINGLE PASS: shingles are materialized once per row, then
    ONE ``F.aggregate`` traversal folds them into the k running minimums
    (``zip_with(acc, [xxhash64(seed_i, s)]*k, least)``) — each shingle is
    tokenized once and hashed k times, all inside whole-stage codegen.
    The sketch stage is a pure scan: no explode, no shuffle, no per-id
    hash map. (Measured at sf0.1: ~7× faster than explode→groupBy with
    partial min-aggs, which is itself fine on shuffle volume but pays
    regex re-tokenization pressure and aggregation hash maps.)

    ``extra_cols`` rides additional expressions over ``df``'s columns
    through the same scan (e.g. the exact-dedup fingerprint) so callers
    needing sketch + fingerprint don't scan and tokenize twice."""
    from etl_to_iceberg_spark.plans import ensure_parallelism

    df = ensure_parallelism(df)  # k×|shingles| hashing must not run on 1 core
    # one parsed expression, not k F.lit/cast py4j round trips — same
    # constant array<long>, bit-identical fold
    init = F.expr(f"array_repeat({(1 << 63) - 1}L, {num_hashes})")

    def fold(acc, s):
        # One string hash per shingle, then k seeded re-hashes of the
        # resulting 8-byte long — xxhash64 cost is input-width-bound, so
        # hashing the long k times is far cheaper than re-hashing the
        # (variable-width) shingle text k times. Same independence: each
        # seed selects a distinct permutation of the base hash. The
        # accumulator is updated with an INDEXED transform (the position
        # is the seed) instead of zip_with over a materialized k-hash
        # array — measured ~40% faster sketch stage (no per-shingle array
        # allocation), bit-identical signatures. The base hash is
        # LET-BOUND (r18): referenced from inside the per-position
        # lambda it would otherwise be re-evaluated k times per shingle
        # — interpreted HOF evaluation has no CSE — which silently
        # reinstated the k string hashes this fold exists to avoid.
        return _let(
            F.xxhash64(s),
            lambda h: F.transform(
                acc, lambda a, i: F.least(a, F.xxhash64(i, h))
            ),
        )

    extra = list(extra_cols or [])
    base = df.select(
        F.col(id_col), *extra, word_shingles(text_col, shingle_n).alias("__sh")
    )
    keep = [c for c in base.columns if c not in (id_col, "__sh")]
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.aggregate("__sh", init, fold).alias("sig"),
    )


def _cap_buckets(
    banded: DataFrame, keys: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop rows in buckets larger than ``max_bucket_size``.

    The window count partitions on the SAME keys as the candidate
    self-join, so the shuffle is reused — the cap costs a sort within
    already-materialized partitions, not an extra exchange. Oversized
    buckets are a corpus pathology (thousands of byte-identical headers /
    boilerplate): joining one is quadratic, and its members are better
    handled by the exact-dedup collapse that the composed pipelines run
    first. Use :func:`oversized_buckets` to count what a cap would drop."""
    if max_bucket_size is None:
        return banded
    w = Window.partitionBy(*keys)
    return (
        banded.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
        .where(F.col("__bucket_n") <= max_bucket_size)
        .drop("__bucket_n")
    )


def oversized_buckets(
    banded: DataFrame, keys: list[str], max_bucket_size: int
) -> DataFrame:
    """(bucket keys, n) for buckets a cap of ``max_bucket_size`` would skip
    — the lazy 'log what was dropped' surface for the capped LSH paths."""
    return (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket_size)
    )


def _explode_bands(
    sigs: DataFrame, *, id_col: str = "doc_id", bands: int = 8
) -> DataFrame:
    """(id, band, band_hash) — one row per band per signature; each band
    hash covers a contiguous ``num_hashes/bands`` slice of the signature.
    Exposed (module-private) so :func:`oversized_buckets` accounting can
    run on exactly the buckets :func:`lsh_candidate_pairs` would join."""
    rows_per_band = F.size(F.col("sig")) / bands
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("sig"),
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


def lsh_candidate_pairs(
    sigs: DataFrame,
    *,
    id_col: str = "doc_id",
    bands: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate pairs = ids sharing ≥1 (band, band_hash) bucket.

    Scale: the self-join is an equi-join on (band, hash) — hash-partitioned,
    no cross product; distinct() bounds duplicate candidates from multiple
    colliding bands. ``max_bucket_size`` bounds the worst case: a bucket of
    n members yields n²/2 pairs, so one boilerplate-heavy bucket can
    dominate the whole job — rows in buckets above the cap are skipped
    (count them with :func:`oversized_buckets` over
    :func:`_explode_bands` output)."""
    banded = _explode_bands(sigs, id_col=id_col, bands=bands)
    banded = _cap_buckets(banded, ["band", "band_hash"], max_bucket_size)
    left = banded.select(
        F.col(id_col).alias("id_a"), "band", "band_hash"
    )
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        left.join(right, on=["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only; returns pairs ≥ threshold.

    Before any shingle set is built, ``df`` is restricted to the ids the
    candidate pairs actually touch (a left-semi join Spark turns into a
    broadcast — i.e. a scan-side filter — whenever the candidate id set
    fits, which it does by construction after LSH pruning). Only candidate
    docs pay the shingle-build CPU and only their sets enter the verify
    shuffles; the rest of the corpus never leaves its scan."""
    from etl_to_iceberg_spark.plans import ensure_parallelism

    # The pair set is referenced four times below (both touched-id unions
    # + both verify joins); uncached, Spark re-executes the entire LSH
    # candidate DAG for each reference. Candidates are id pairs — KBs per
    # million docs — so caching them is bounded and measured ~17% off the
    # full minhash pipeline at sf0.1 (LRU-evictable if memory is tight).
    # tracked_cache, not cache: the result is returned LAZILY, so release
    # belongs to the caller — a long-running service calls
    # caching.release_operator_caches() between queries.
    pairs = tracked_cache(pairs)
    touched = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    df = df.join(touched, on=id_col, how="left_semi")
    df = ensure_parallelism(df)  # shingle building is the dominant map cost
    # Both verify-join sides consume the shingle sets; uncached, the
    # whole touched-docs subtree — semi-join against the candidate ids,
    # parallelism repartition of the TEXT, and the shingle tokenization
    # itself — executes twice, once per side (r17 plan audit: two
    # identical LeftSemi+RoundRobin+Project(shingles) subtrees under the
    # verify join). The cache bounds to candidate-touched docs only —
    # the same id set the semi-join already restricts to, KB–MB per
    # million docs after LSH pruning — and halves the dominant verify
    # map cost (guide §2.4: share one computation instead of re-running
    # the subtree; same tracked_cache release discipline as `pairs`).
    sets_df = tracked_cache(
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(text_col, shingle_n).alias("__set"),
        )
    )
    a = sets_df.select(F.col("__id").alias("id_a"), F.col("__set").alias("set_a"))
    b = sets_df.select(F.col("__id").alias("id_b"), F.col("__set").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_bucket_size: int | None = 256,
    collapse_identical: bool = True,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: exact-collapse → signatures →
    banded candidates (bucket-capped) → exact-Jaccard verification.

    Band tuning: b bands of r=num_hashes/b rows put the S-curve midpoint at
    (1/b)^(1/r); the default 16×2 targets ≈0.25, i.e. near-certain candidate
    capture for true Jaccard ≥0.5 — false candidates are cheap because the
    exact verifier prunes them, missed candidates are unrecoverable.

    Scale guards (both default-on): identical docs collapse to one
    representative before the banded join (a crawl corpus with 10k copies
    of a boilerplate page contributes ONE row to the LSH join, and the
    (rep, member) Jaccard-1.0 edges are re-emitted so the pair set's
    transitive closure is unchanged); residual hot buckets — distinct
    texts that still collide — are capped at ``max_bucket_size`` members
    (skipped rows countable via :func:`oversized_buckets`). Document text
    never enters a shuffle anywhere in this pipeline: fingerprint and
    signature are computed in ONE scan (one tokenization), the collapse
    windows over (id, fp, sig) rows — ~272 fixed bytes each — and the
    verifier joins shingle SETS by id for candidate-touched docs only."""
    if collapse_identical:
        sigs_fp = minhash_signatures(
            df, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_n=shingle_n,
            extra_cols=[fingerprint(text_col).alias("__fp")],
        )
        w_fp = Window.partitionBy("__fp")
        tagged = sigs_fp.withColumn("__rep", F.min(id_col).over(w_fp))
        sigs = tagged.where(F.col(id_col) == F.col("__rep")).select(id_col, "sig")
        exact_edges = tagged.where(F.col(id_col) != F.col("__rep")).select(
            F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")
        )
    else:
        sigs = minhash_signatures(
            df, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_n=shingle_n,
        )
        exact_edges = None
    cands = lsh_candidate_pairs(
        sigs, id_col=id_col, bands=bands, max_bucket_size=max_bucket_size
    )
    near = jaccard_verify(
        cands, df, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, threshold=threshold,
    )
    if exact_edges is None:
        return near
    return near.unionByName(
        exact_edges.select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
    )


def minhash_pairs_from_bands(
    side: DataFrame,
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """:func:`minhash_near_duplicates`'s relational half over PRECOMPUTED
    ``(doc_id, fp, band_hashes)`` rows — the sidecar pattern
    (:func:`simhash_pairs`): the one-scan sketch (fingerprint + band
    hashes) is materialized once, and everything after it — identical-fp
    collapse, capped band equi-join, exact-Jaccard verify — runs from
    the stored rows, so a SQL oracle can re-derive it from the same
    parquet. Output is identical to the fused pipeline: the collapse
    window keys and band hashes are the same expressions, merely
    materialized."""
    w_fp = Window.partitionBy("fp")
    tagged = side.withColumn("__rep", F.min(id_col).over(w_fp))
    exact_edges = tagged.where(F.col(id_col) != F.col("__rep")).select(
        F.col("__rep").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.lit(1.0).alias("jaccard"),
    )
    banded = tagged.where(F.col(id_col) == F.col("__rep")).select(
        F.col(id_col),
        F.posexplode("band_hashes").alias("band", "band_hash"),
    )
    banded = _cap_buckets(banded, ["band", "band_hash"], max_bucket_size)
    left = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    cands = (
        left.join(right, on=["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    near = jaccard_verify(
        cands, df, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, threshold=threshold,
    )
    return near.unionByName(exact_edges)


# --- simhash ---------------------------------------------------------------


def simhash(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash long): sign-sum sketch over word-token hashes.

    bit_i(doc) = 1 iff Σ_tokens (bit_i(xxhash64(token)) ? +1 : -1) > 0,
    equivalently 2·|{tokens with bit_i set}| > |tokens|.

    SHUFFLE-FREE: token hashes are materialized once per row (one
    ``transform`` — tokenization runs once), then each bit's set-count is
    a ``size(filter(...))`` over the hashed long array; the signature
    packs ``count*2 > n`` per bit. No explode, no groupBy — the sketch
    stage is a scan inside whole-stage codegen. (32 cheap long-op passes
    over the materialized array beat one fold that allocates a 32-int
    array per token — measured ~40% faster at sf0.1.)"""
    from etl_to_iceberg_spark.plans import ensure_parallelism

    df = ensure_parallelism(df)

    def bit_set(i: int):
        # one-arg lambda: a second parameter would receive the element
        # index, not the bit constant
        return lambda h: h.bitwiseAND(F.lit(1 << i)) != 0

    hashed = df.select(
        F.col(id_col),
        F.transform(words(normalize_text(text_col)), lambda t: F.xxhash64(t)).alias(
            "__h"
        ),
    )
    counted = hashed.select(
        F.col(id_col),
        F.size("__h").alias("__n"),
        *[F.size(F.filter("__h", bit_set(i))).alias(f"__c{i}") for i in range(bits)],
    )
    sig = None
    for i in range(bits):
        bit = F.when(
            F.col(f"__c{i}") * 2 > F.col("__n"), F.lit(1 << i)
        ).otherwise(F.lit(0))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return counted.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming of their 32-bit simhash.

    Candidates via the pigeonhole band trick: distance < 4 ⇒ at least one
    of the 4 bytes is identical, so candidates come from 4 equi-joins on
    (byte_index, byte_value) — never a cross join.

    Scale guards: docs with IDENTICAL signatures (byte-identical or
    near-identical text — the hot-bucket pathology) collapse to one
    representative per signature before the join; the (rep, member)
    hamming-0 edges are re-emitted, so the pair set's transitive closure
    matches the uncollapsed pipeline. Residual buckets — distinct
    signatures sharing a byte — are capped at ``max_bucket_size``
    (skipped rows countable via :func:`oversized_buckets`)."""
    all_sigs = simhash(df, id_col=id_col, text_col=text_col, bits=32)
    return simhash_pairs(
        all_sigs,
        id_col=id_col,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


def simhash_pairs(
    all_sigs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """The relational half of :func:`simhash_near_duplicates`, over
    PRECOMPUTED ``(id, simhash)`` signatures. Split out so the sketch
    can be materialized once (e.g. to a parquet sidecar a SQL oracle
    reads — the ``dedup_simhash`` registry query does exactly that) and
    the collapse/banding/hamming logic checked independently of the
    xxhash64 sketch, which has no SQL mirror."""
    # Identical-signature collapse as ONE partial-aggregating groupBy
    # (map-side combine: the exchange carries a row per distinct
    # signature per input partition) instead of the previous
    # full-relation min-window + shared cache. The cached window was
    # r17's hottest unresolved inefficiency: the final union's action
    # launches its consumers (the banded join tree and the rep→member
    # edge branch) as CONCURRENT jobs, and Spark's block-level
    # getOrElseUpdate does not block the losers of that race — the scan
    # + full-row shuffle + window materialized ~2× per action (r17
    # profile; the eager-populate fix measured net worse, Negative
    # results #1). The aggregate needs no cache at all: the
    # representative relation (one row per distinct signature) IS the
    # aggregate's output, every reference to it below compiles to the
    # SAME exchange subtree, and exchange reuse is plan-level — AQE
    # materializes a reused shuffle exactly once, with no racing
    # consumers by construction. At scale this also strictly shrinks
    # the shuffle: the window moved every (id, simhash) row; the
    # aggregate moves one partial row per distinct signature per map
    # task.
    rep_map = all_sigs.groupBy("simhash").agg(
        F.min(id_col).alias("__rep"), F.count(F.lit(1)).alias("__n")
    )
    sigs = rep_map.select(F.col("__rep").alias(id_col), "simhash")
    # rep→member edges: re-join the (file-backed, cheap) signature scan
    # against only the DUPLICATED signature groups. No broadcast hint —
    # the dup-group count is corpus-shaped (boilerplate floods), so AQE
    # decides at runtime from the aggregate's real size.
    exact_edges = (
        all_sigs.join(
            rep_map.where(F.col("__n") > 1).select("simhash", "__rep"),
            on="simhash",
        )
        .where(F.col(id_col) != F.col("__rep"))
        .select(
            F.col("__rep").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 8 * i).bitwiseAND(F.lit(0xFF))
                    for i in range(4)
                ]
            )
        ).alias("byte_idx", "byte_val"),
    )
    banded = _cap_buckets(banded, ["byte_idx", "byte_val"], max_bucket_size)
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"),
        "byte_idx", "byte_val",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"),
        "byte_idx", "byte_val",
    )
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b")).bitwiseAND(F.lit((1 << 32) - 1))
    )
    near = (
        left.join(right, on=["byte_idx", "byte_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        # hamming filter BEFORE the multi-band dedup: the distinct's
        # shuffle then carries only pairs that can appear in the output,
        # not every band collision about to be discarded
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return near.unionByName(exact_edges)


# --- bounded exact jaccard (candidate set from a partition key) ------------


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    shingle_n: int = 1,
    threshold: float = 0.6,
    probe_filter: Column | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs bounded by ``group_col``
    (pairs only form within a group — at scale this is the
    partition-then-compare pattern; unbounded pairwise is O(n²) and is what
    the LSH paths exist to avoid)."""
    from etl_to_iceberg_spark.plans import ensure_parallelism

    df = ensure_parallelism(df)
    sets_df = df.select(
        F.col(id_col).alias("__id"),
        *( [F.col(group_col)] if group_col else [] ),
        word_shingles(text_col, shingle_n).alias("__set"),
    )
    a = sets_df.select(
        F.col("__id").alias("id_a"),
        *( [F.col(group_col)] if group_col else [] ),
        F.col("__set").alias("set_a"),
    )
    if probe_filter is not None:
        a = a.where(probe_filter)
    b = sets_df.select(
        F.col("__id").alias("id_b"),
        *( [F.col(group_col)] if group_col else [] ),
        F.col("__set").alias("set_b"),
    )
    on = [group_col] if group_col else None
    joined = a.join(b, on=on) if on else a.crossJoin(b)
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# --- exact-substring span dedup --------------------------------------------


def exact_substring_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 8,
    min_span_tokens: int | None = None,
    max_gram_freq: int | None = 64,
    use_hash: bool = True,
) -> DataFrame:
    """Maximal duplicated token SPANS shared across document pairs — the
    span-level operator the set-similarity family can't express: two
    documents with low overall Jaccard can still share a long verbatim
    passage (a quoted license block, a syndicated paragraph) that a
    training pipeline wants to find and trim.

    Returns (id_a, id_b, a_start, b_start, span_tokens): for each doc
    pair, every maximal run of ≥ ``min_span_tokens`` (default 2·gram_n)
    identical consecutive word tokens, with its 0-based token offsets in
    both docs.

    Shape (all Catalyst, one pass per stage):
    1. Position-stamped ``gram_n``-grams per doc (sequence/transform over
       the token array — narrow).
    2. Hot-gram cap: grams appearing in > ``max_gram_freq`` positions
       corpus-wide are dropped (a boilerplate gram in f positions joins
       f²/2 anchor pairs; same pathology — and same remedy — as LSH
       bucket caps). The count window partitions on the join key, so the
       cap rides the join's own exchange.
    3. Anchor pairs: self equi-join on the gram key — hash-partitioned,
       no cross product.
    4. Maximal spans: within (id_a, id_b), anchors on one DIAGONAL
       (pos_a − pos_b constant) with consecutive pos_a form one run —
       classic gaps-and-islands: group on pos_a − row_number(), then
       min/max per island. Span length = pos_a range + gram_n.

    ``use_hash=True`` joins on xxhash64(gram) so the exchange carries
    8 bytes per anchor instead of the gram text (the 100 TB posture; a
    64-bit collision between distinct grams is ~n²/2⁶⁵ and could only
    add a spurious anchor). The registered oracle joins on gram TEXT in
    DuckDB; tests assert both key modes agree on the fixture.
    """
    from etl_to_iceberg_spark.plans import ensure_parallelism

    if min_span_tokens is None:
        min_span_tokens = 2 * gram_n
    toks = words(normalize_text(F.col(text_col)))
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"), toks.alias("__t")
    )
    grams = base.where(F.size("__t") >= gram_n).select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - gram_n),
                lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i + 1, gram_n)),
            )
        ).alias("pos", "gram"),
    )
    key = F.xxhash64("gram").alias("__k") if use_hash else F.col("gram").alias("__k")
    g = grams.select("__id", "pos", key)
    if max_gram_freq is not None:
        w = Window.partitionBy("__k")
        g = (
            g.withColumn("__f", F.count(F.lit(1)).over(w))
            .where(F.col("__f") <= max_gram_freq)
            .drop("__f")
        )
    a = g.select(F.col("__id").alias("id_a"), F.col("pos").alias("pos_a"), "__k")
    b = g.select(F.col("__id").alias("id_b"), F.col("pos").alias("pos_b"), "__k")
    anchors = a.join(b, on="__k").where(F.col("id_a") < F.col("id_b"))
    wi = Window.partitionBy(
        "id_a", "id_b", F.col("pos_a") - F.col("pos_b")
    ).orderBy("pos_a")
    islands = anchors.withColumn(
        "__grp", F.col("pos_a") - F.row_number().over(wi)
    )
    return (
        islands.groupBy(
            "id_a", "id_b", (F.col("pos_a") - F.col("pos_b")).alias("__diag"), "__grp"
        )
        .agg(
            F.min("pos_a").cast("int").alias("a_start"),
            F.min("pos_b").cast("int").alias("b_start"),
            (F.max("pos_a") - F.min("pos_a") + gram_n).cast("int").alias(
                "span_tokens"
            ),
        )
        .where(F.col("span_tokens") >= min_span_tokens)
        .select("id_a", "id_b", "a_start", "b_start", "span_tokens")
    )


def trim_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 8,
    min_span_tokens: int | None = None,
    max_gram_freq: int | None = 64,
) -> DataFrame:
    """Span-level dedup that actually TRIMS: for every duplicated span
    found by :func:`exact_substring_spans`, remove the covered tokens
    from the LATER doc of the pair (id_a < id_b keeps the earliest
    occurrence). Returns one row per input doc: (id, text_clean,
    kept_tokens, removed_tokens) — ``text_clean`` is the doc's
    NORMALIZED token stream with covered positions dropped (span dedup
    operates in token space; reconstruction is token-joined, not the
    raw original text).

    Coverage is positional — a token at position p is removed iff ANY
    span interval covers p — so overlapping spans need no interval
    merging and the semantics mirror 1:1 into SQL. The per-doc interval
    list is span-count-bounded (collect_list after the span pipeline's
    frequency cap), then token filtering is a pure Catalyst
    filter/transform over the token array: one scan of the corpus after
    the span join."""
    spans = exact_substring_spans(
        df,
        id_col=id_col,
        text_col=text_col,
        gram_n=gram_n,
        min_span_tokens=min_span_tokens,
        max_gram_freq=max_gram_freq,
    )
    per_doc = spans.groupBy(F.col("id_b").alias(id_col)).agg(
        F.collect_list(F.struct("b_start", "span_tokens")).alias("__ivs")
    )
    toks = words(normalize_text(F.col(text_col)))
    covered = lambda p: F.exists(  # noqa: E731
        F.col("__ivs"),
        lambda iv: (p >= iv["b_start"]) & (p < iv["b_start"] + iv["span_tokens"]),
    )
    # No broadcast hint: per_doc has one row per doc WITH any duplicated
    # span — corpus-sized in the worst case (pairwise-syndicated corpora),
    # far beyond the 8 GB broadcast ceiling. AQE broadcasts it when it is
    # actually small; otherwise this is a plain doc_id equi-join.
    base = df.join(per_doc, on=id_col, how="left").select(
        F.col(id_col),
        toks.alias("__t"),
        F.coalesce(
            "__ivs", F.array().cast("array<struct<b_start:int,span_tokens:int>>")
        ).alias("__ivs"),
    )
    # Guard the empty-token case: sequence(0, -1) is the DESCENDING array
    # [0, -1], so an un-guarded position list would index into the empty
    # token array and abort the job on any punctuation-only/empty doc.
    positions = F.when(
        F.size("__t") > 0, F.sequence(F.lit(0), F.size("__t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(positions, lambda p: ~covered(p))
    return base.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.transform(kept, lambda p: F.element_at("__t", p + 1))
        ).alias("text_clean"),
        F.size(kept).cast("int").alias("kept_tokens"),
        (F.size("__t") - F.size(kept)).cast("int").alias("removed_tokens"),
    )


# --- connected components (dedup clusters) ---------------------------------

# Bridge graphs at or below this edge count are merged with a driver-side
# union-find instead of distributed pointer doubling (see the strategy
# comment in connected_components). 256k edges of two longs ≈ 4 MB.
_DRIVER_BRIDGE_MAX = 1 << 18


def _reliable_checkpoint(spark):
    """Returns ``df -> durable materialization of df`` — a parquet
    write to the session's checkpoint scratch dir plus an
    explicit-schema read back.

    This replaces ``df.checkpoint(eager=True)`` (r11): the RDD
    checkpoint primitive RECOMPUTES the lineage a second time for its
    write pass and detours through the RDD translation path (no
    AQE/WSCG for the materialization) — measured 4.5s vs 1.0s for the
    identical contraction aggregate at sf0.1, ~4× per fixpoint
    materialization. The parquet roundtrip gives the same three
    properties the fixpoint needs: durable files a lost executor
    recovers from (point the scratch root at shared storage on a
    cluster — same deployment note as the old checkpoint dir), a
    truncated lineage (the read-back is a fresh scan with real size
    stats), and executor-failure isolation that ``localCheckpoint``'s
    memory-pinned blocks cannot offer. The read passes the writer's
    schema explicitly so an EMPTY relation (the common bridge-graph
    case) reads back as empty instead of failing schema inference on a
    part-less directory.

    Disk hygiene: everything lives under one scratch_dir, reclaimed by
    the session's scratch cleanup at exit; per-call subdirs are label-
    table-sized (two longs per node) times the handful of fixpoint
    rounds."""
    import uuid

    base = scratch_dir(prefix="spark-cc-checkpoint-")

    def ckpt(df: DataFrame) -> DataFrame:
        path = os.path.join(base, uuid.uuid4().hex)
        df.write.parquet(path)
        return spark.read.schema(df.schema).parquet(path)

    return ckpt


def _local_contraction(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Per-partition union-find over the RAW edge list → ``(node, root)``
    pairs, where root = the min id of the node's WITHIN-PARTITION
    component.

    Arrow-batched ``mapInPandas`` with state accumulated across the
    partition's batch iterator — a union-find needs whole-partition scope,
    which mapInPandas provides (one generator invocation per partition).
    Direction, duplicates and self-loops are all no-ops to a union-find,
    so this consumes the edge relation AS-IS: no symmetrize, no
    ``distinct()``, no shuffle at all beyond whatever partitioning the
    edges already carry (any partitioning is correct — the contraction is
    purely a seed, the bridge fixpoint merges across partitions).

    Union-by-min keeps the invariant "a root is the minimum id of its
    tree" (both candidate roots are their trees' minima; the union keeps
    the smaller), so the final root IS the local component min — no
    second pass. Path compression in ``find`` bounds the chain walks.

    Memory: one dict entry per distinct endpoint in the partition. Edges
    are degree-capped ≤ k·n upstream (mutual-kNN / banded candidates), so
    at 100 TB the edge partition count is sized so a partition's
    endpoints fit the executor heap (~2M endpoints ≈ 300 MB of dict);
    `spark.sql.files.maxPartitionBytes` / an upstream repartition governs
    that, not this operator."""
    node_t = dict(edges.dtypes)[src_col]

    def contract(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for s, d in zip(pdf["__s"].tolist(), pdf["__d"].tolist()):
                parent.setdefault(s, s)
                parent.setdefault(d, d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    if rd < rs:
                        rs, rd = rd, rs
                    parent[rd] = rs
        if not parent:
            return
        members = list(parent)
        roots = [find(v) for v in members]
        for i in range(0, len(members), 1 << 16):
            yield pd.DataFrame(
                {"node": members[i : i + (1 << 16)], "root": roots[i : i + (1 << 16)]}
            )

    return edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).mapInPandas(contract, schema=f"node {node_t}, root {node_t}")


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 50,
    stats: dict | None = None,
    driver_bridge_max: int = _DRIVER_BRIDGE_MAX,
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    ``(id, cluster_id)`` where cluster_id = the smallest id reachable
    through the (undirected) edge set.

    This is the step that turns pairwise near-dup CANDIDATES (minhash /
    simhash / cosine pairs) into dedup CLUSTERS — near-duplication is
    transitive in practice (A≈B, B≈C ⇒ keep one of {A,B,C}), so keeping
    "one doc per matched pair" under-deletes; one doc per component is
    the production semantics.

    Scale shape (two phases since r11 — the fixpoint round count, not the
    data volume, was the measured wall even at sf0.01):

    **Phase 1 — local contraction.** A per-partition union-find over the
    raw edge list (``_local_contraction``) labels every edge-incident
    node with its WITHIN-PARTITION component minimum, in one distributed
    pass with zero shuffles. ``M(n)`` = min of n's local roots across
    partitions (one groupBy of the (node, root) pairs). Since each local
    root is reachable from n, contracting by M is a quotient that
    preserves components.

    **Phase 2 — bridge fixpoint.** The only connectivity the contraction
    can miss crosses partitions through a SHARED node — a node whose
    partitions disagree on its root. Each such node's root-set becomes a
    star of bridge edges (min-root ↔ other roots); the global min id of
    any multi-partition component is itself a local root (local minima of
    subsets that contain the global min), so min-label propagation +
    POINTER DOUBLING over this bridge graph — typically orders of
    magnitude smaller than the edge relation, often empty — converges to
    the true component minima in O(log bridge-diameter) rounds. Where the
    pre-r11 shape ran ~14 blocking rounds over the full incident-node
    set (16s of round overhead even at sf0.01), the bridge fixpoint runs
    0–4 rounds over the contracted graph.

    Each round is RELIABLY materialized via a parquet write + explicit-
    schema read-back (``_reliable_checkpoint`` — on a real cluster the
    scratch dir must live on shared storage, see that helper's
    docstring) so (a) the plan doesn't grow exponentially and (b) a lost
    executor mid-fixpoint recomputes from durable storage instead of
    killing the whole job. ``df.checkpoint(eager)`` was measured to
    compute the lineage TWICE through the RDD path (4.5s vs 1.0s at
    sf0.1), and ``localCheckpoint`` would pin blocks in executor
    memory, not survivable on a real cluster. The
    round's OLD label rides the checkpointed frame as ``__old``, so
    termination detection is a trivial scan of the checkpoint. The
    driver-side loop is inherent to iterative fixpoints (same as
    GraphX/Pregel); everything inside the loop is distributed. (The
    large-star/small-star rounds of Kiveris et al. are the same
    contraction idea with edge-set rewriting; seeding with a partition-
    local union-find gets the same collapse in a single pass and keeps
    the distributed rounds for genuinely cross-partition chains only.)
    """
    ckpt = _reliable_checkpoint(edges.sparkSession)
    all_nodes = nodes.select(F.col(id_col).alias("node"))

    # Phase 1: local contraction. groupBy(node) both takes the min root
    # (the seed label M) and collects the root-set that generates bridge
    # edges. Checkpointed once — both consumers below read it, and it
    # truncates the upstream candidate-pair plan (minhash/kNN pipelines)
    # the way the pre-r11 edge checkpoint did.
    seeded = ckpt(
        _local_contraction(edges, src_col, dst_col)
        .groupBy("node")
        .agg(
            F.min("root").alias("label"),
            F.collect_set("root").alias("__roots"),
        )
    )
    m_map = seeded.select("node", "label")

    # Phase 2: bridge graph over local roots. A node seen by >1 partition
    # with differing roots proves those roots are one component.
    bridge = (
        seeded.where(F.size("__roots") > 1)
        .select(F.col("label").alias("e_src"), F.explode("__roots").alias("e_dst"))
        .where(F.col("e_src") != F.col("e_dst"))
    )
    sym = bridge.union(
        bridge.select(F.col("e_dst").alias("e_src"), F.col("e_src").alias("e_dst"))
    ).distinct()

    # Size probe AND driver payload in ONE job (r17): collect through
    # limit(max+1) off the seeded checkpoint. ≤ max rows back = the
    # exact bridge, already on the driver; max+1 back = "too big", take
    # the distributed path (the truncated row set is discarded, so its
    # nondeterminism never matters). This replaces the previous
    # ckpt-write + count + collect trio — two jobs and their driver
    # gaps per CC call — and only the distributed path pays for a
    # durable sym materialization (which only IT re-reads).
    #
    # - 0 edges: every component was partition-local; the contraction is
    #   final. No fixpoint at all.
    # - ≤ _DRIVER_BRIDGE_MAX edges: union-find the bridge ON THE DRIVER.
    #   Pointer-doubling rounds cost a fixed ~1s of jobs each (two joins
    #   + a durable materialization + a termination scan) regardless of
    #   how tiny the relation is — measured as the entire remaining wall
    #   of dedup_connected_components once the contraction landed. A
    #   sub-megabyte collect replaces all of it with zero distributed
    #   rounds; the threshold (256k edges ≈ 4 MB of longs) keeps the
    #   driver safely inside any real heap.
    # - bigger: the distributed min-label + pointer-doubling fixpoint,
    #   O(log bridge-diameter) rounds over the contracted relation.
    rounds = 0
    probe = sym.limit(driver_bridge_max + 1).collect()
    n_bridge = len(probe)
    driver_labels: dict | None = None
    if n_bridge == 0:
        max_iterations = 0
    elif n_bridge <= driver_bridge_max:
        max_iterations = 0
        parent: dict = {}

        def _find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in probe:
            s, d = row["e_src"], row["e_dst"]
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = _find(s), _find(d)
            if rs != rd:
                if rd < rs:
                    rs, rd = rd, rs
                parent[rd] = rs
        driver_labels = {n: _find(n) for n in parent}
    else:
        # distributed fixpoint: durably materialize sym once — every
        # round joins against it — and take the exact size for stats.
        sym = ckpt(sym)
        n_bridge = sym.count()

    labels = ckpt(
        sym.select(F.col("e_src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    ) if (n_bridge and driver_labels is None) else None
    if driver_labels is not None:
        node_t = dict(sym.dtypes)["e_src"]
        labels = edges.sparkSession.createDataFrame(
            list(driver_labels.items()), f"node {node_t}, label {node_t}"
        )
    elif labels is None:
        labels = sym.select(
            F.col("e_src").alias("node"), F.col("e_src").alias("label")
        )  # empty bridge: an empty (node, label) relation
    for _ in range(max_iterations):
        rounds += 1
        nbr_min = (
            sym.join(labels, sym.e_dst == labels.node)
            .groupBy("e_src")
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = labels.join(
            nbr_min, labels.node == nbr_min.e_src, "left_outer"
        ).select(
            "node",
            F.col("label").alias("__old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # Pointer doubling: jump each node to its label's label. Chains
        # halve per round — O(log diameter) total rounds. ONE hop per
        # round: multi-hop in-round compression was measured twice and
        # lost both ways (see SCALING.md negative results) — nesting the
        # raw plan blows up Catalyst size estimation, and hopping over an
        # intermediate checkpoint trades one round for three extra
        # stages' scheduling overhead per round.
        hop = propagated.select(
            F.col("node").alias("h_node"), F.col("label").alias("h_label")
        )
        new_labels = ckpt(
            propagated.join(
                hop, propagated.label == hop.h_node, "left_outer"
            ).select(
                "node",
                "__old",
                F.least(
                    F.col("label"), F.coalesce(F.col("h_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # __old rides the checkpointed frame: termination is a scan of
        # durable data, not a join of two label tables.
        changed = (
            new_labels.where(F.col("label") != F.col("__old")).limit(1).count()
        )
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["bridge_edges"] = n_bridge
        stats["bridge_strategy"] = (
            "none" if n_bridge == 0
            else "driver" if driver_labels is not None
            else "pointer-doubling"
        )

    # Compose: n → M(n) (local-contraction seed) → bridge label of M(n).
    # Nodes whose component never crossed a partition miss the bridge
    # table (coalesce to the seed); isolated nodes miss both (singleton).
    root_labels = labels.select(
        F.col("node").alias("__r"), F.col("label").alias("__rl")
    )
    return (
        all_nodes.join(m_map, "node", "left_outer")
        .join(root_labels, F.col("label") == F.col("__r"), "left_outer")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("__rl", "label", "node").alias("cluster_id"),
        )
    )
