"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- **Brute-force cosine top-k** (`cosine_topk`): exact baseline. The score
  is a pure column expression (zip_with + aggregate in DOUBLE — JVM-side,
  codegen'd, no Python). Queries are broadcast; the corpus is never
  shuffled — the plan is scan × tiny-broadcast → per-partition top-k merge.
- **Random-hyperplane LSH** (`rp_lsh_buckets`, `lsh_topk`): sign-bit
  bucketing over D fixed hyperplanes; candidates share a bucket, then
  exact re-rank. Hyperplane components are DETERMINISTIC (derived from
  xxhash64(plane, dim) mapped to ±1) so signatures are reproducible across
  runs/clusters without shipping a random matrix.

At 100 TB / billions of vectors the LSH path is the scale path (candidates
per query ≈ corpus/2^planes), with IVF (k-means cells) the natural next
step — same top-k re-rank skeleton.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential accumulation (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a total zero-norm convention: any
    zero-norm input scores -1.0 instead of raising DIVIDE_BY_ZERO under
    ANSI mode (found by the r11 model sweep's planted zero centroid —
    one degenerate embedding must not abort a 1000-executor job).
    -1.0 is DuckDB ``list_cosine_similarity``'s convention for the same
    case, so engine/oracle agreement stays total even on degenerate
    vectors — and it means they rank LAST in every top-k, which is the
    behavior a dedup/ANN pipeline wants from a zero embedding."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom).otherwise(F.lit(-1.0))


def cosine_with_norms(a: Column, b: Column, an: Column, bn: Column) -> Column:
    """:func:`cosine` with the two L2 norms PRECOMPUTED as columns.

    Bit-identical to ``cosine(a, b)`` when ``an``/``bn`` are
    :func:`l2_norm` of the same vectors: the norm is the same
    ``sqrt(aggregate(...))`` double either way, and the remaining
    arithmetic (multiply, compare, divide) is unchanged — only WHERE the
    norm is evaluated moves. The point (guide §2.3 "shuffle fewer
    bytes" / §1.2 "per-task work"): every join that scores PAIRS of
    vectors was re-folding both norms per pair — up to 4 extra
    array-aggregate passes per pair with the CASE branches — when each
    vector's norm is a per-ROW quantity. Computing it once in the
    projection before the join leaves exactly one array traversal (the
    dot product) per pair."""
    denom = an * bn
    return F.when(denom != 0.0, dot(a, b) / denom).otherwise(F.lit(-1.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns (query_id, vec_id, score, rank). Scale: broadcast(queries) ×
    corpus scan; ranking via per-query window over only the scored rows.
    Scores rounded to 6dp for cross-engine determinism; ties broken by id.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__cv")
    ).withColumn("__cvn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _to_double(vec_col).alias("__qv")
    ).withColumn("__qvn", l2_norm(F.col("__qv")))
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(
            cosine_with_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qvn"), F.col("__cvn")
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


# --- deterministic random-hyperplane LSH -----------------------------------


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """sign(Σ_d ±1 · v_d) with the ±1 pattern from bit 16 of an LCG over
    the flat index plane·dim+d — a fixed pseudo-random hyperplane that is
    EXACTLY expressible in ANSI SQL (integer ·/+/>>/&), so the whole LSH
    pipeline carries a DuckDB oracle (xxhash64 would be Spark-only; an
    LCG's low bit would just be the index parity, hence bit 16).

    The projection accumulates in DECIMAL(28,10): exact, order-independent
    addition makes the sign — and therefore the bucket — bit-identical
    across engines (a double fold could flip a near-zero sign between
    summation orders)."""
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.when(
            F.shiftright(
                (F.lit(plane * dim).cast("long") + d) * F.lit(1103515245)
                + F.lit(12345),
                16,
            ).bitwiseAND(F.lit(1))
            == 1,
            F.lit(1),
        ).otherwise(F.lit(-1)),
    )
    proj = F.aggregate(
        F.zip_with(
            vec, signs, lambda x, s: (x.cast("decimal(28,10)") * s)
        ),
        F.lit(0).cast("decimal(28,10)"),
        lambda acc, x: (acc + x).cast("decimal(28,10)"),
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket_expr(vec: Column, *, planes: int, dim: int) -> Column:
    """Concatenated sign bits of `planes` deterministic LCG hyperplanes —
    THE bucket function. Both the batch ANN path (rp_lsh_buckets) and
    the incremental index (ext/incremental.ann_index_rows) call this one
    expression: stored index buckets and query-side buckets must stay
    bit-identical forever, or candidate lookups silently go empty.

    Two structural choices vs the obvious per-plane Python unroll, both
    pinned bit-identical to the `_hyperplane_sign` reference over every
    fixture embedding (tests/test_ext.py):

    - The ±1 patterns are precomputed in Python and shipped as ONE
      literal array (exact: the LCG stays ≤2^41, inside both Python int
      and Java long). The unrolled form only evaluated fast because
      Catalyst constant-folded the per-plane `transform(sequence)` sign
      arrays; folding the plane index into a lambda variable without
      this loses that and pays planes×dim LCG evals per ROW (measured
      0.04s → 0.91s on the corpus stage).
    - The plane loop folds with Horner's scheme (``acc*2 + sign_p``,
      planes high→low ≡ Σ sign_p·2^p in the same int arithmetic), so
      the Catalyst tree is ~`planes`× smaller: plan build drops ~0.4s →
      ~0.2s per call site and per-row eval is ~25% faster than the
      unrolled fold (one codegen'd aggregate vs `planes` interpreted
      ones)."""
    flat: list[int] = []
    for p in range(planes):
        for d in range(dim):
            bit = (((p * dim + d) * 1103515245 + 12345) >> 16) & 1
            flat.append(1 if bit == 1 else -1)
    # one SQL-parsed literal, not F.lit(list): lit() round-trips py4j per
    # element (~0.3s of driver time per call site at planes=6·dim=64)
    signs = F.expr(f"array({','.join(str(s) for s in flat)})")

    def bucket_of(v: Column) -> Column:
        def sign(p: Column) -> Column:
            # identical decimal(28,10) projection arithmetic to the
            # reference; only the sign source moved from expression to
            # literal.
            proj = F.aggregate(
                F.zip_with(
                    v,
                    F.slice(signs, p * F.lit(dim) + 1, dim),
                    lambda x, s: (x.cast("decimal(28,10)") * s),
                ),
                F.lit(0).cast("decimal(28,10)"),
                lambda acc, x: (acc + x).cast("decimal(28,10)"),
            )
            return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))

        return F.aggregate(
            F.sequence(F.lit(planes - 1), F.lit(0), F.lit(-1)),
            F.lit(0),
            lambda acc, p: acc * F.lit(2) + sign(p),
        )

    # The input vector is LET-BOUND: callers pass the _to_double cast
    # transform, which the per-plane fold would otherwise re-evaluate
    # once per PLANE per row (interpreted HOFs have no CSE — the same
    # r18 finding as dedup.word_shingles). A NULL vector still folds to
    # bucket 0 through the when/otherwise chain exactly as before.
    from etl_to_iceberg_spark.ext.text import _let

    bucket = _let(vec, bucket_of)
    # coalesce for NULLABILITY, not value: the when/otherwise chain already
    # yields 0 for a null vec (as the unrolled reference did), but Catalyst
    # marks the aggregate HOF nullable — and a nullable join key gets an
    # isnotnull() filter pushed below ensure_parallelism's repartition,
    # re-evaluating this whole expression per row in the single-task scan
    # stage (measured 0.9s at sf0.1). Non-nullable folds that filter away.
    return F.coalesce(bucket, F.lit(0))


def rp_lsh_buckets(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, bucket int): concatenated sign bits of `planes` hyperplanes.

    ensure_parallelism first (r11): the bucket expression is planes×dim
    decimal work per row, and a single-file input serializes all of it
    onto one task — measured 0.74s → 0.21s at sf0.1. (No-op on real
    multi-split inputs, per the helper's contract. The codegen explode →
    8-decimal-sum rewrite was measured AND REJECTED here: 0.58s — the
    n×dim exploded exchange costs more than interpreted-fold evaluation
    saves at dim=64; the r9 explode wins came from regex/entropy ops
    whose per-element work dwarfs a multiply.)"""
    from etl_to_iceberg_spark.plans import ensure_parallelism

    v = _to_double(vec_col)
    return ensure_parallelism(df).select(
        F.col(id_col), lsh_bucket_expr(v, planes=planes, dim=dim).alias("bucket")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    planes: int = 8,
    dim: int = 64,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, then exact cosine
    re-rank. Trades recall for a 2^planes candidate reduction.

    ``probes`` widens recall without re-bucketing (multiprobe, Lv et al.
    VLDB'07 — same lever as ext/incremental.incremental_ann_tick):
    1 = the query's own bucket; up to planes+1 adds every 1-bit-flip
    neighbor; beyond that adds 2-bit flips (≤ 1+planes+C(planes,2)).
    Candidates/query ≈ probes · corpus / 2^planes."""
    max_probes = 1 + planes + planes * (planes - 1) // 2
    if not 1 <= probes <= max_probes:
        raise ValueError(f"probes must be in 1..{max_probes}, got {probes}")
    # Probe masks: own bucket, then 1-bit flips, then 2-bit flips — all
    # distinct, so each corpus row matches AT MOST ONE probe bucket per
    # query and the equi-join stays duplicate-free.
    masks = [0] + [1 << p for p in range(planes)] + [
        (1 << a) | (1 << b) for a in range(planes) for b in range(a + 1, planes)
    ]
    cb = rp_lsh_buckets(corpus, id_col=id_col, vec_col=vec_col, planes=planes, dim=dim)
    qb = rp_lsh_buckets(
        queries.withColumnRenamed(query_id_col, "__qid"),
        id_col="__qid", vec_col=vec_col, planes=planes, dim=dim,
    ).select(
        "__qid",
        F.explode(
            F.array(
                *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks[:probes]]
            )
        ).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__cv")
    ).withColumn("__cvn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _to_double(vec_col).alias("__qv")
    ).withColumn("__qvn", l2_norm(F.col("__qv")))
    # No distinct: each vector carries exactly ONE bucket (a single
    # 2^planes hash, not multi-band LSH) and probe keys are distinct, so
    # the bucket equi-join yields at most one row per (corpus, query)
    # pair — a distinct here would add a full shuffle of the candidate
    # set for nothing.
    cands = cb.join(qb, on="bucket").select(
        F.col(id_col).alias("vec_id"), F.col("__qid").alias("query_id")
    )
    scored = (
        cands.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(
                cosine_with_norms(
                    F.col("__qv"), F.col("__cv"), F.col("__qvn"), F.col("__cvn")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_cluster_size: int | None = 4096,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest coarse
    cluster, then compare pairs ONLY within a cluster — the quantizer
    turns the corpus-wide O(n²) cosine comparison into per-cluster
    blocks, the same blocking role LSH bands play for text.

    Returns (id_a, id_b, cell, cos_sim) with id_a < id_b and cos_sim ≥
    ``threshold``; the keep-lowest-id convention means id_b is the prune
    candidate. Scale shape: assignment is scan × broadcast(quantizer)
    (ivf_assign — the corpus never shuffles to find its cluster); the
    within-cluster self-join shuffles on cell, and ``max_cluster_size``
    drops degenerate clusters from pairing (a cluster that big means the
    quantizer under-fits — re-train with higher nlist; audit the drops
    with a count-over-cell before raising the cap), bounding the
    quadratic term exactly like the LSH/simhash bucket caps. At 100 TB,
    nlist grows with the corpus so E[cluster] stays ~constant, and the
    fitted quantizer is a stored table (ivf_kmeans_centroids), not a
    per-query recompute."""
    assigned = ivf_assign(
        corpus.select(F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__v")),
        centroids,
        id_col="vec_id",
        n_best=1,
    )
    if max_cluster_size is not None:
        w = Window.partitionBy("cell")
        assigned = (
            assigned.withColumn("__n", F.count(F.lit(1)).over(w))
            .where(F.col("__n") <= max_cluster_size)
            .drop("__n")
        )
    # same double-consumption shape as knn_graph — see the note there
    from etl_to_iceberg_spark.caching import tracked_cache

    assigned = tracked_cache(assigned)
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__vn").alias("__van"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__vn").alias("__vbn"),
        "cell",
    )
    return (
        a.join(b, on="cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", "cell",
            F.round(
                cosine_with_norms(
                    F.col("__va"), F.col("__vb"), F.col("__van"), F.col("__vbn")
                ),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def knn_graph(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    max_cluster_size: int | None = 4096,
) -> DataFrame:
    """Approximate k-nearest-neighbor graph over the corpus itself: every
    vector's top-``k`` most-cosine-similar OTHER vectors, searched only
    within its stored-quantizer cluster — the corpus-self-join dual of
    query-set ANN (ivf_probe_topk) and the substrate semantic clustering
    and SemDeDup-style canonical selection build on.

    Returns (vec_id, rk, nbr_id, cell, cos_sim), rk 1-based, ranked by
    (rounded cos desc, nbr_id) so the graph is deterministic. DIRECTED:
    both (a→b) and (b→a) rows exist when each ranks the other. A vector
    alone in its cluster (or in a cluster over ``max_cluster_size`` —
    same guard and same quantizer-underfit reading as
    semantic_dedup_pairs) emits no rows.

    Scale shape: assignment is scan × broadcast(quantizer); the
    within-cluster self-join shuffles on cell with the cap bounding the
    quadratic term; the per-vector top-k is a row_number window whose
    groups are cluster-bounded — rank-limited map-side AND post-shuffle
    (WindowGroupLimit), so no task holds more than a cluster's pairs."""
    assigned = ivf_assign(
        corpus.select(
            F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__v")
        ),
        centroids,
        id_col="vec_id",
        n_best=1,
    )
    if max_cluster_size is not None:
        cw = Window.partitionBy("cell")
        assigned = (
            assigned.withColumn("__n", F.count(F.lit(1)).over(cw))
            .where(F.col("__n") <= max_cluster_size)
            .drop("__n")
        )
    # Both self-join sides consume the capped assignment; without a
    # cache the whole assignment pipeline (scan × broadcast fan-out +
    # hash-agg + cap window) executes TWICE — measured 6.8s → 3.0s at
    # sf0.1 with the cache (r11). tracked_cache so a long-running
    # service reclaims it (caching.release_operator_caches); the cached
    # relation is (id, vec, cell), MEMORY_AND_DISK and LRU-evictable at
    # corpus scale.
    from etl_to_iceberg_spark.caching import tracked_cache

    assigned = tracked_cache(assigned)
    a = assigned.select(
        "vec_id",
        F.col("__v").alias("__va"),
        F.col("__vn").alias("__van"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("__v").alias("__vb"),
        F.col("__vn").alias("__vbn"),
        "cell",
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nbr_id")
    )
    return (
        a.join(b, on="cell")
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select(
            "vec_id",
            "nbr_id",
            "cell",
            F.round(
                cosine_with_norms(
                    F.col("__va"), F.col("__vb"), F.col("__van"), F.col("__vbn")
                ),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("vec_id", "rk", "nbr_id", "cell", "cos_sim")
    )


def semantic_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    threshold: float = 0.3,
    max_cluster_size: int | None = 4096,
    stats: dict | None = None,
) -> DataFrame:
    """Semantic dedup clusters: :func:`knn_graph` → MUTUAL-kNN edges at
    or above ``threshold`` (an edge survives only if each endpoint ranks
    the other in its top-``k`` — the standard symmetrization that stops
    one hub vector chaining unrelated neighborhoods) → min-label
    connected components. Returns one row per corpus vector:
    ``(vec_id, cluster_id, cluster_size, is_canonical)`` with
    cluster_id = lowest reachable id and canonical = that lowest member
    (SemDeDup's keep decision; ``WHERE NOT is_canonical`` is the delete
    list). Vectors with no surviving edge are their own singleton.

    Scale shape: every stage is individually audited — assignment is
    scan × broadcast(quantizer), pairing is cell-bounded with the same
    ``max_cluster_size`` guard as :func:`semantic_dedup_pairs`, the
    top-k is WindowGroupLimit-bounded, the mutual filter is ONE
    fixed-width aggregation (below), and the component fixpoint
    (ext/dedup.connected_components) iterates only over edge-incident
    vectors in O(log diameter) reliably-checkpointed rounds. The
    cluster_size window partitions by cluster_id, whose group sizes the
    mutual-kNN degree bound (≤k edges per node) keeps from skewing."""
    from etl_to_iceberg_spark.ext.dedup import connected_components

    g = knn_graph(
        corpus,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        max_cluster_size=max_cluster_size,
    )
    # Mutual-kNN detection as a GROUP-BY on the unordered pair, not a
    # self-join of the directed graph with itself: each directed row
    # appears exactly once in g (row_number top-k), so a pair is mutual
    # iff its group has both directions (count = 2). cos_sim is computed
    # from the same per-term products in index order for either
    # direction, then rounded — bit-identical across the two rows — so
    # thresholding max() preserves the fwd-row semantics exactly. One
    # shuffle of ≤k·n fixed-width rows replaces a two-sided join, and —
    # as important at 10× — keeps the logical plan SHALLOW: the joined
    # form nested the knn self-join (itself a join over a windowed join)
    # on both sides, and Catalyst's size-only stats estimation multiplies
    # nested-join size guesses into BigIntegers big enough to OOM the
    # driver (the SCALING.md watchpoint-9 failure, reproduced at sf1).
    mutual = (
        g.select(
            F.least("vec_id", "nbr_id").alias("src"),
            F.greatest("vec_id", "nbr_id").alias("dst"),
            "cos_sim",
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("__n"), F.max("cos_sim").alias("__c"))
        .where((F.col("__n") == 2) & (F.col("__c") >= threshold))
        .select("src", "dst")
    )
    # No edge checkpoint since r11: connected_components' local-
    # contraction phase consumes the edge relation exactly ONCE (a single
    # mapInPandas pass — no symmetrize union, no incident-node seed), and
    # its own first checkpoint (the contracted (node, root) aggregate)
    # truncates the kNN plan for everything downstream. The pre-r11 edge
    # checkpoint existed because three consumers each re-executed the
    # whole kNN pipeline (measured +40% at sf0.1); with one consumer it
    # was a pure extra materialization.
    labels = connected_components(
        mutual,
        corpus.select(F.col(id_col).alias("vec_id")),
        id_col="vec_id",
        stats=stats,
    )
    w = Window.partitionBy("cluster_id")
    return labels.select(
        "vec_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("vec_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def quantizer_refresh_report(
    corpus: DataFrame,
    old_centroids: DataFrame,
    new_centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The refresh audit behind ``similarity_quantizer_refresh``: per
    NEW cell — its nearest old cell (rounded cosine, old-cell tiebreak),
    the cosine to it, and corpus occupancy under the new quantizer.
    Both centroid frames carry (cell, __cent). Matching is an
    nlist×nlist broadcast cross (metadata-sized); occupancy is one
    scan × broadcast assignment + a tiny two-phase agg — nothing
    corpus-sized shuffles."""
    old = old_centroids.select(
        F.col("cell").alias("old_cell"), F.col("__cent").alias("ov")
    )
    new = new_centroids.select("cell", F.col("__cent").alias("nv"))
    mw = Window.partitionBy("cell").orderBy(
        F.col("drift").desc(), F.col("old_cell")
    )
    matched = (
        new.crossJoin(F.broadcast(old))
        .select(
            "cell",
            "old_cell",
            F.round(cosine(F.col("nv"), F.col("ov")), 6).alias("drift"),
        )
        .withColumn("__rn", F.row_number().over(mw))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    occupancy = (
        ivf_assign(
            corpus.select(
                F.col(id_col).alias("vec_id"),
                _to_double(vec_col).alias("__v"),
            ),
            new.select("cell", F.col("nv").alias("__cent")),
            id_col="vec_id",
            n_best=1,
            with_vector=False,
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        # both sides are nlist rows, but post-window/post-agg stats are
        # unknown to the planner — without the hint this 16x16 join
        # planned as a SortMergeJoin
        matched.join(F.broadcast(occupancy), on="cell", how="left")
        .select(
            "cell",
            "old_cell",
            F.col("drift").alias("cos_to_old"),
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_assigned"),
        )
        .orderBy("cell")
    )


# --- IVF (inverted-file) ANN ------------------------------------------------

# nlist at or above which ivf_assign switches from exact flat assignment
# to approximate two-level (super-cell) routing. Static SQL oracles that
# value-check IVF ops hardcode FLAT assignment, so any oracle-checked
# fixture must keep nlist BELOW this threshold (asserted where the
# fixtures are defined, e.g. ext/corpus_queries._IVFK_PARAMS) — above
# it, engine/oracle parity requires an assignment-sidecar oracle (the
# similarity_ann_ivf_two_level pattern) instead of re-derived flat SQL.
TWO_LEVEL_MIN_NLIST = 64

# Version token for the APPROXIMATE routing algorithm (ivf_assign's
# two-level branch + _super_quantizer). Assignment-sidecar oracles
# (ext/corpus_queries._IVF2L_PARAMS) fold this into their params key, so
# the engine-written (side, id, cell) sidecar RELOCATES — and therefore
# rebuilds under the new algorithm — whenever routing semantics change,
# exactly like a data-param change would. Without it, a routing change
# would leave a stale sidecar in place and both engines would silently
# agree on outdated assignments (the assignment-sidecar pattern's one
# blind spot; see ADVICE r12). Bump this when anything that can alter
# the (id, cell) output for FIXED params changes: _super_quantizer's
# Lloyd seeding/iters/tie-breaks, the childless-super filter, the
# probe-widening formula, super_probes' default, or the routing
# score/order itself. Pure refactors that keep assignments bit-identical
# don't need a bump (the live-vs-sidecar routing-equality pin catches an
# unbumped behavioral change loudly).
ROUTING_VERSION = 1


def _super_quantizer(
    centroids: DataFrame, *, nsuper: int | None = None, iters: int = 8
):
    """Driver-side Lloyd over the quantizer's OWN rows → ``(cell →
    super)`` map + ``nsuper`` super-centroids, for two-level coarse
    assignment. The quantizer is metadata-sized by contract (nlist ≤ a
    few thousand at any corpus size), so the collect is bounded and the
    numpy k-means over nlist × dim is microseconds. Deterministic: rows
    sorted by cell, init = first nsuper cells, fixed iteration count,
    argmax ties → lowest super index."""
    import math

    import numpy as np

    rows = sorted(centroids.collect(), key=lambda r: r["cell"])
    if nsuper is None:
        nsuper = max(2, math.isqrt(len(rows) - 1) + 1)  # ⌈√nlist⌉
    cents = np.asarray([r["__cent"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(cents, axis=1)
    norms[norms == 0.0] = 1.0
    unit = cents / norms[:, None]  # cluster on the unit sphere: the
    # assignment below ranks COSINE, so the super-cells must too
    sup = unit[:nsuper].copy()
    for _ in range(iters):
        assign = (unit @ sup.T).argmax(axis=1)
        for j in range(nsuper):
            pts = unit[assign == j]
            if len(pts):
                sup[j] = pts.mean(axis=0)
    assign = (unit @ sup.T).argmax(axis=1)
    cellmap = [(rows[i]["cell"], int(assign[i])) for i in range(len(rows))]
    # Drop childless supers (an emptied Lloyd cluster keeps its init
    # centroid, which is a real centroid direction and can outrank
    # nonempty supers in routing): they can never contribute candidate
    # cells, so keeping them both wastes probe slots and — if every
    # probed super were childless — would leave a vector with zero
    # scored rows, silently dropping it from the assignment. Filtering
    # here guarantees every routed super has ≥1 child cell.
    live = {j for _, j in cellmap}
    supers = [(j, [float(v) for v in sup[j]]) for j in range(nsuper) if j in live]
    return cellmap, supers


def _best_cells(
    scored: DataFrame,
    id_col: str,
    vec_col: str,
    n_best: int,
    with_vector: bool = True,
    norm_col: str | None = None,
) -> DataFrame:
    """Per-id top-``n_best`` cells from (id, vec, cell, __cs) rows.

    n_best=1 — the corpus-side assignment, i.e. the dominant volume —
    avoids the row_number window entirely: all of an id's scored rows
    are TASK-LOCAL (they fan out of one scan row via a broadcast join),
    so a hash-aggregate collapses n·nlist rows to n map-side and the
    shuffle carries one skinny row per vector instead of the full
    fan-out (each row of which dragged the raw vector through the
    exchange).

    The argmax is a plain ``max`` over ONE packed long — (rounded-cs
    scaled to an integer) · 2³² + (2³²−1−cell) — monotone in the exact
    window order (rounded cosine desc, cell asc; quantizer cells are
    small non-negative ints by construction). Packing from the ALREADY
    6dp-rounded ``__cs`` keeps the scale-to-integer exact (the product
    is within ulps of an integer, so round-to-nearest recovers it).
    This shape matters: a struct-valued/struct-ordered ``max_by``
    degrades to SortAggregate (struct agg buffers aren't UnsafeRow-
    mutable — measured 1.4× slower than the window it replaced), while
    a fixed-width long buffer keeps whole-stage-codegen HashAggregate
    with map-side combine. With ``with_vector`` the vector rides the
    GROUPING key (variable-length grouping keys are fine; buffers
    aren't), crossing the exchange once per vector; routing-only
    consumers pass ``with_vector=False`` and the exchange carries two
    fixed-width columns per vector, full stop — skinnier than even the
    column-pruned window shape (nlist skinny rows/vector) it replaces."""
    if not with_vector:
        scored = scored.drop(vec_col)
        if norm_col is not None:
            scored = scored.drop(norm_col)
            norm_col = None
    if n_best == 1:
        m32 = F.lit((1 << 32) - 1).cast("long")
        pack = (
            F.round(F.col("__cs") * 1e6, 0).cast("long") * F.lit(1 << 32).cast("long")
            + (m32 - F.col("cell").cast("long"))
        )
        cell_t = dict(scored.dtypes)["cell"]
        # The precomputed vector norm is a pure function of the vector,
        # so riding it as an extra grouping key (8 fixed bytes) changes
        # no group — it just survives to the consumers' pair scoring.
        keys = [id_col] + (
            [vec_col] + ([norm_col] if norm_col else []) if with_vector else []
        )
        return (
            scored.select(*keys, pack.alias("__pk"))
            .groupBy(*keys)
            .agg(F.max("__pk").alias("__pk"))
            .select(
                *keys,
                (m32 - F.col("__pk").bitwiseAND(m32)).cast(cell_t).alias("cell"),
            )
        )
    w = Window.partitionBy(id_col).orderBy(F.col("__cs").desc(), F.col("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_best)
        .drop("__rn", "__cs")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str = "__v",
    n_best: int = 1,
    two_level_min_nlist: int = TWO_LEVEL_MIN_NLIST,
    super_probes: int = 4,
    with_vector: bool = True,
    nlist: int | None = None,
) -> DataFrame:
    """Assign each vector to its ``n_best`` nearest centroids by cosine.

    The centroid set is broadcast (a coarse quantizer is metadata-sized:
    nlist ≤ a few thousand even at billions of vectors), so assignment is
    scan × broadcast + a per-id top-n — the corpus never shuffles.

    **Two-level assignment** (r11, the SCALING.md n×nlist fix): flat
    assignment scores every vector against every centroid — n·nlist·dim
    scalar work, the one term that grew 100× at a 10× scale-up (nlist
    grows with the corpus to keep E[cell] constant, so the product is
    superlinear). When nlist ≥ ``two_level_min_nlist``, the quantizer is
    itself quantized (``_super_quantizer``: ⌈√nlist⌉ super-cells,
    driver-side numpy over the metadata-sized centroid set), each vector
    routes to its ``super_probes`` best super-cells, and only those
    supers' children are scored: n·√nlist·(1 + super_probes)·dim work —
    the standard IMI/two-level-IVF posture (Babenko & Lempitsky 2012).
    Routing is a task-local ``collect_list`` + ``sort_array`` slice
    (partial-agg collapses map-side; the raw vector crosses the exchange
    once per vector, not once per super-cell). Below the threshold the
    flat path is bit-identical to pre-r11 behavior, so small fixtures
    (nlist=16 at all checked SFs) are unaffected; above it, assignment
    is approximate in the usual multiprobe sense. super_probes=4 was
    chosen by A/B against flat assignment on the tools/ann_recall.py
    grid: at nlist=64 it reproduces flat recall EXACTLY on the near-dup
    regime the engine targets (1.000 at nprobe=8 and 16; probes=2 gave
    0.916) and lands within ~0.05 of flat on the no-structure isotropic
    regime where every sublinear index is documented-pessimal. Cost is
    (1 + super_probes)·√nlist ≈ 5√nlist scalar work per vector — the
    crossover vs flat nlist sits at nlist ≈ 25, hence the 64 threshold
    with margin."""
    # ``nlist`` lets callers that KNOW their quantizer's size (it is in
    # every sidecar's params dict) skip the limit().count() probe — one
    # whole extra Spark job per assignment call, pure scheduling
    # overhead on the query path (guide §1.2: remove work before tuning
    # it). Callers without the number keep the probe.
    nlist_probe = (
        nlist
        if nlist is not None
        else centroids.limit(two_level_min_nlist).count()
    )
    if nlist_probe < two_level_min_nlist:
        vecs = vectors.withColumn("__vn", l2_norm(F.col(vec_col)))
        cents = centroids.withColumn("__cn", l2_norm(F.col("__cent")))
        scored = vecs.join(F.broadcast(cents)).select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__vn"),
            F.col("cell"),
            F.round(
                cosine_with_norms(
                    F.col(vec_col),
                    F.col("__cent"),
                    F.col("__vn"),
                    F.col("__cn"),
                ),
                6,
            ).alias("__cs"),
        )
        return _best_cells(
            scored, id_col, vec_col, n_best, with_vector, norm_col="__vn"
        )

    import math

    spark = vectors.sparkSession
    cell_t = dict(centroids.dtypes)["cell"]
    cellmap, supers = _super_quantizer(centroids)
    nlist, nsuper = len(cellmap), len(supers)
    # A multiprobe caller (n_best = nprobe on the query side) needs the
    # probed supers to hold comfortably more than n_best child cells —
    # widen the super fan-out with one super of slack, never past all.
    super_probes = min(
        nsuper, max(super_probes, math.ceil(n_best * nsuper / nlist) + 1)
    )
    sup_df = spark.createDataFrame(
        supers, "__super int, __scent array<double>"
    ).withColumn("__sn", l2_norm(F.col("__scent")))
    map_df = spark.createDataFrame(cellmap, f"cell {cell_t}, __super int")
    # Route: per-vector top-super_probes super-cells. collect_list over
    # the task-local fan-out + sort_array((-score, super)) is the same
    # (score desc, super asc) order the window would give, with ties
    # impossible (super ids are distinct) — but it partial-aggregates
    # map-side, so the exchange carries n rows, not n·nsuper. The
    # vector's norm is folded ONCE per vector and rides the aggregate
    # (like the vector itself) so neither routing nor child scoring
    # re-folds it per scored pair.
    routed = (
        vectors.withColumn("__vn", l2_norm(F.col(vec_col)))
        .join(F.broadcast(sup_df))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__vn"),
            F.col("__super"),
            F.round(
                cosine_with_norms(
                    F.col(vec_col), F.col("__scent"), F.col("__vn"), F.col("__sn")
                ),
                6,
            ).alias("__ss"),
        )
        .groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.first("__vn").alias("__vn"),
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("__ss")).alias("s"),
                            F.col("__super").alias("u"),
                        )
                    )
                ),
                1,
                super_probes,
            ).alias("__top"),
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__vn"),
            F.explode(F.col("__top").getField("u")).alias("__super"),
        )
    )
    children = F.broadcast(
        centroids.withColumn("__cn", l2_norm(F.col("__cent"))).join(
            F.broadcast(map_df), on="cell"
        )
    )
    scored = routed.join(children, on="__super").select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__vn"),
        F.col("cell"),
        F.round(
            cosine_with_norms(
                F.col(vec_col), F.col("__cent"), F.col("__vn"), F.col("__cn")
            ),
            6,
        ).alias("__cs"),
    )
    return _best_cells(
        scored, id_col, vec_col, n_best, with_vector, norm_col="__vn"
    )


def ivf_probe_topk(
    c: DataFrame,
    q: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 4,
    nlist: int | None = None,
) -> DataFrame:
    """Shared IVF routing + re-rank over normalized inputs: ``c`` =
    (vec_id, __v), ``q`` = (query_id, __v), ``centroids`` = (cell,
    __cent) — used by :func:`ivf_topk` (first-ids quantizer),
    :func:`ivf_kmeans_topk` (trained quantizer), and the
    ``similarity_ivf_kmeans`` registry query (quantizer read back from
    its oracle sidecar). ``nlist``, when the caller knows it, skips the
    two per-assignment size-probe jobs (see :func:`ivf_assign`)."""
    corpus_cells = ivf_assign(
        c, centroids, id_col="vec_id", n_best=1, nlist=nlist
    ).select(
        "vec_id", F.col("__v").alias("__cv"), F.col("__vn").alias("__cvn"), "cell"
    )
    query_cells = ivf_assign(
        q, centroids, id_col="query_id", n_best=nprobe, nlist=nlist
    ).select(
        "query_id", F.col("__v").alias("__qv"), F.col("__vn").alias("__qvn"), "cell"
    )
    # No candidate-pair dedup: the corpus side is flat-assigned n_best=1
    # and a query's probed cells are distinct (one row per cell from
    # ivf_assign's row_number), so a (query_id, vec_id) pair can match
    # on at most one cell — pairs are unique by construction. The old
    # dropDuplicates here bought nothing and cost a candidate-sized
    # exchange, the dominant intermediate at scale (SCALING.md
    # watchpoint 11; A/B: 105,596 pairs / 0 duplicates through even the
    # two-level routing branch, −8% wall at 10×).
    scored = corpus_cells.join(query_cells, on="cell").select(
        "query_id", "vec_id",
        F.round(
            cosine_with_norms(
                F.col("__qv"), F.col("__cv"), F.col("__qvn"), F.col("__cvn")
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN: corpus vectors are inverted-listed under their nearest
    centroid; each query probes its ``nprobe`` nearest cells and exact
    re-ranks only those lists — candidates/query ≈ corpus · nprobe/nlist.

    The coarse quantizer here is the first ``nlist`` corpus vectors by id —
    deterministic and cheap, adequate for cell routing (recall is governed
    by nprobe); a production build trains it with MLlib KMeans on a sample
    and persists it, same plan shape otherwise.

    Seeding is ``orderBy(id).limit(nlist)`` — Spark compiles this to
    TakeOrderedAndProject (per-partition top-nlist, then a merge of nlist
    rows per partition), so the corpus is never funneled through a single
    task. Only AFTER the limit — when the frame is nlist rows, i.e.
    metadata-sized — does a global row_number assign cell ids."""
    c = corpus.select(F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _to_double(vec_col).alias("__v")
    )
    seed = c.orderBy("vec_id").limit(nlist)
    centroids = (
        seed.withColumn("__rn", F.row_number().over(Window.orderBy("vec_id")))
        .select(F.col("__rn").alias("cell"), F.col("__v").alias("__cent"))
    )
    return ivf_probe_topk(c, q, centroids, k=k, nprobe=nprobe, nlist=nlist)


def embedding_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    probe_filter: Column | None = None,
) -> DataFrame:
    """Semantic near-dup pairs: cosine ≥ threshold. ``probe_filter``
    bounds the left side (at scale: LSH buckets bound BOTH sides; this
    exact form is the verifier/baseline)."""
    a = df.select(F.col(id_col).alias("id_a"), _to_double(vec_col).alias("va"))
    if probe_filter is not None:
        a = a.where(probe_filter)
    a = a.withColumn("__van", l2_norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"), _to_double(vec_col).alias("vb")
    ).withColumn("__vbn", l2_norm(F.col("vb")))
    return (
        F.broadcast(a)
        .crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                cosine_with_norms(
                    F.col("va"), F.col("vb"), F.col("__van"), F.col("__vbn")
                ),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_fraction: float | None = None,
    seed: int = 13,
) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: distributed MLlib KMeans
    (Lloyd's over the cluster, seeded → reproducible) replaces
    ``ivf_topk``'s first-nlist-ids seeding. Same routing/re-rank plan
    shape; better-balanced cells, so candidate counts per query are more
    uniform and the hottest inverted list shrinks.

    Scale: pass ``train_fraction`` to train on a deterministic hash-sample
    of the corpus instead of all of it — at scale ALWAYS set it (size it
    so fraction·|corpus| ≈ 100k rows; a coarse quantizer gains nothing
    from more), bounding training cost regardless of corpus size. The
    default ``None`` trains on the full corpus, which is only sane for
    corpora that are already sample-sized. The fitted centroids are
    metadata-sized (nlist × dim) and re-enter the plan as a broadcast
    frame, exactly like ``ivf_topk``'s. Assignment/probe/re-rank stages
    are shared with :func:`ivf_assign`/:func:`ivf_topk`.

    Note this function is EAGER: ``KMeans.fit`` runs distributed training
    jobs when it's called, unlike the lazily-planned operators elsewhere —
    inherent to iterative training (there is no lazy Lloyd's plan)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _to_double(vec_col).alias("__v")
    )
    centroids = ivf_kmeans_centroids(
        corpus, id_col=id_col, vec_col=vec_col,
        nlist=nlist, train_fraction=train_fraction, seed=seed,
    )
    return ivf_probe_topk(c, q, centroids, k=k, nprobe=nprobe, nlist=nlist)


def ivf_kmeans_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    train_fraction: float | None = None,
    seed: int = 13,
) -> DataFrame:
    """(cell, __cent) quantizer rows from seeded MLlib KMeans — the
    training half of :func:`ivf_kmeans_topk`, split out so the fitted
    centroids can be persisted (e.g. the ``similarity_ivf_kmeans``
    oracle sidecar, or a production quantizer table) and the probe half
    re-run from the stored rows. EAGER: fitting runs on call."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__v"))
    train = c
    if train_fraction is not None and train_fraction < 1.0:
        # deterministic hash sample — NOT rand(): reproducible across runs
        bucket = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(1_000_000))
        train = c.where(bucket < int(train_fraction * 1_000_000))
    km = KMeans(k=nlist, seed=seed, featuresCol="__feat", predictionCol="__cell")
    model = km.fit(train.select(array_to_vector("__v").alias("__feat")))
    return corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cell int, __cent array<double>",
    )


# --- product quantization (IVF-PQ) ------------------------------------------

_DEC = "decimal(20,9)"


def _dec_sum(terms: Column) -> Column:
    """Exact, ORDER-INDEPENDENT sum of an array of DECIMAL(20,9) terms —
    the house discipline (text_unigram_logprob, text_entropy_filter)
    that lets Spark folds and DuckDB ``list_sum`` agree to the last bit
    regardless of iteration order."""
    return F.aggregate(
        terms,
        F.lit(0).cast(_DEC),
        lambda acc, t: (acc + t).cast(_DEC),
    )


def pq_subvectors(
    df: DataFrame, id_col: str, *, m: int, dsub: int, vec_col: str = "__v"
) -> DataFrame:
    """(id, m, sv): the M length-``dsub`` subvector slices of each
    vector, one row per (vector, subspace)."""
    slices = F.array(
        *[F.slice(vec_col, mi * dsub + 1, dsub) for mi in range(m)]
    )
    return df.select(
        F.col(id_col), F.posexplode(slices).alias("m", "sv")
    )


def pq_train_codebooks(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    dsub: int = 16,
    ksub: int = 16,
    train_rows: int = 256,
    iters: int = 12,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(m, code, cent) product-quantizer codebooks: per subspace, a
    ``ksub``-centroid Lloyd's run over a BOUNDED deterministic
    hash-sample collected to the driver (the FAISS posture — PQ training
    is sample-sized by definition; ``train_rows`` caps the collect no
    matter the corpus size, and hash-order sampling makes it
    reproducible without ``rand()``). Initialization is the first
    ``ksub`` sample rows in hash order; an emptied cluster keeps its
    previous centroid. EAGER: trains on call — persist the result (the
    ``similarity_ann_ivf_pq`` sidecar) and reuse, exactly like the IVF
    coarse quantizer.

    ``centroids`` switches to RESIDUAL training (IVFADC, Jégou et al.
    2011 §III): each sample row is replaced by x − its assigned coarse
    centroid before the per-subspace Lloyd's run, so the codebooks spend
    their 2^bits entries on the within-cell displacement — much lower
    variance than raw vectors — at identical storage. Assignment of the
    bounded sample happens driver-side with the exact ivf_assign
    ordering (rounded-6dp cosine desc, cell asc)."""
    import numpy as np

    rows = (
        corpus.select(
            F.col(id_col).alias("__id"), _to_double(vec_col).alias("__v")
        )
        .withColumn("__h", F.xxhash64("__id"))
        .orderBy("__h", "__id")
        .limit(train_rows)
        .collect()
    )
    x = np.asarray([r["__v"] for r in rows], dtype=np.float64)
    if centroids is not None and x.shape[0]:
        crows = sorted(centroids.collect(), key=lambda r: r["cell"])
        cmat = np.asarray([r["__cent"] for r in crows], dtype=np.float64)
        cn = np.linalg.norm(cmat, axis=1)
        cn[cn == 0.0] = 1.0
        xn = np.linalg.norm(x, axis=1)
        xn[xn == 0.0] = 1.0
        cos = np.round((x / xn[:, None]) @ (cmat / cn[:, None]).T, 6)
        best = cos.argmax(axis=1)  # ties -> lowest index = lowest cell
        x = x - cmat[best]
    if x.shape[0] < ksub:
        raise ValueError(f"PQ training needs >= {ksub} rows, got {x.shape[0]}")
    if x.shape[1] != m * dsub:
        raise ValueError(f"dim {x.shape[1]} != m*dsub = {m * dsub}")
    out = []
    for mi in range(m):
        sub = x[:, mi * dsub : (mi + 1) * dsub]
        cents = sub[:ksub].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest code
            for j in range(ksub):
                pts = sub[assign == j]
                if len(pts):
                    cents[j] = pts.mean(axis=0)
        out.extend(
            (mi, j, [float(v) for v in cents[j]]) for j in range(ksub)
        )
    return corpus.sparkSession.createDataFrame(
        out, "m int, code int, cent array<double>"
    )


def pq_codes(
    vectors: DataFrame,
    codebooks: DataFrame,
    *,
    id_col: str = "vec_id",
    m: int = 4,
    dsub: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(id, m, code): each vector's nearest codebook entry per subspace
    by squared L2 — THE compressed index. Fixed-width output (m small
    ints per vector, vs m*dsub doubles of raw vector): this relation is
    what a 100 TB ANN serving layer stores and shuffles instead of
    embeddings. Distances are summed as exact DECIMAL(20,9) terms so the
    argmin (ordered by distance, then code) is engine-independent —
    scan x broadcast(codebooks) + a (vector, subspace)-partitioned
    top-1 window; group size is exactly ``ksub``.

    ``centroids`` switches to RESIDUAL codes: the encoded vector is
    x − its assigned coarse centroid (one more scan × broadcast + an
    element-wise zip_with — no extra shuffle), matching codebooks
    trained with the same ``centroids``."""
    if centroids is not None:
        vectors = (
            ivf_assign(vectors, centroids, id_col=id_col, vec_col="__v")
            .join(F.broadcast(centroids), on="cell")
            .select(
                F.col(id_col),
                F.zip_with("__v", "__cent", lambda a, b: a - b).alias("__v"),
            )
        )
    sub = pq_subvectors(vectors, id_col, m=m, dsub=dsub)
    d2 = _dec_sum(
        F.zip_with(
            F.col("sv"), F.col("cent"), lambda a, b: ((a - b) * (a - b)).cast(_DEC)
        )
    )
    w = Window.partitionBy(id_col, "m").orderBy(
        F.col("__d2").asc(), F.col("code")
    )
    return (
        sub.join(F.broadcast(codebooks), on="m")
        .select(F.col(id_col), "m", "code", d2.alias("__d2"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 1)
        .select(id_col, "m", "code")
    )


def pq_adc_topk(
    c: DataFrame,
    q: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 4,
    m: int = 4,
    dsub: int = 16,
    rerank: int | None = None,
    residual: bool = False,
    nlist: int | None = None,
) -> DataFrame:
    """IVF-PQ search with asymmetric distance computation (Jegou et al.
    2011): route queries to ``nprobe`` coarse cells, score candidates
    from their PQ CODES via a per-query lookup table, top-k per query.
    Inner product decomposes exactly across subspaces, so the ADC score
    is dot(query, reconstructed-vector) — parts quantized to
    DECIMAL(20,9) and summed exactly, making the ranking (score desc,
    vec_id) engine-independent.

    ``rerank=R`` adds the FAISS refine stage: the ADC pass keeps a
    top-R shortlist per query, raw vectors are fetched for ONLY those
    R rows (a broadcast-able shortlist joining back into the corpus),
    and the final top-k is exact cosine. This is how production IVF-PQ
    answers queries — quantization error decides the shortlist, never
    the final order; measured on the near-isotropic fixture it lifts
    recall@5 from 0.33 (pure ADC, m=8) to 0.73 with R=64.

    Scale shape: candidates are scored WITHOUT touching raw vectors —
    the joins carry (query_id, vec_id, m, code) fixed-width rows against
    a broadcast LUT of nq x m x ksub parts; raw embeddings appear only
    in the two scan-side assignment stages (cell routing + code
    derivation), each scan x broadcast + a bounded-group window, and —
    with ``rerank`` — in the nq*R-row refine fetch.

    ``residual=True`` is the IVFADC form: codes encode x − its coarse
    centroid (pass codebooks trained with the same ``centroids``), and
    the ADC score adds the exact per-(query, cell) centroid inner
    product — dot(q, cent_cell + r̂) = dot(q, cent_cell) + Σ_m LUT —
    computed once over the metadata-sized queries × centroids cross
    (DECIMAL term-sums, so the ranking stays engine-independent). Same
    candidate volume, strictly better reconstruction: the codebooks
    spend their entries on within-cell displacements."""
    if residual:
        # ONE corpus assignment feeds both consumers — residual-code
        # derivation AND cell routing. Before r12 pq_codes(centroids=…)
        # ran its own ivf_assign while corpus_cells ran another: the
        # dominant corpus-wide term (n·√nlist routing work at two-level
        # nlist) executed twice, the same differently-shaped
        # double-consumption r11 fixed in kNN/SemDeDup — exchange reuse
        # does not cover the two branches, a tracked cache does.
        from etl_to_iceberg_spark.caching import tracked_cache

        assigned = tracked_cache(
            ivf_assign(c, centroids, id_col="vec_id", n_best=1, nlist=nlist)
        )
        res_vec = assigned.join(F.broadcast(centroids), on="cell").select(
            "vec_id",
            F.zip_with("__v", "__cent", lambda a, b: a - b).alias("__v"),
        )
        codes = pq_codes(res_vec, codebooks, id_col="vec_id", m=m, dsub=dsub)
        corpus_cells = assigned.select("vec_id", "cell")
    else:
        codes = pq_codes(c, codebooks, id_col="vec_id", m=m, dsub=dsub)
        corpus_cells = ivf_assign(
            c, centroids, id_col="vec_id", n_best=1, with_vector=False,
            nlist=nlist,
        )
    qsub = pq_subvectors(q, "query_id", m=m, dsub=dsub)
    part = _dec_sum(
        F.zip_with(F.col("sv"), F.col("cent"), lambda a, b: (a * b).cast(_DEC))
    )
    lut = qsub.join(F.broadcast(codebooks), on="m").select(
        "query_id", "m", "code", part.alias("__part")
    )
    query_cells = ivf_assign(
        q, centroids, id_col="query_id", n_best=nprobe, with_vector=False,
        nlist=nlist,
    )
    # No candidate-pair dedup (SCALING.md watchpoint 11): the corpus is
    # assigned n_best=1 in BOTH branches above (the two-level branch's
    # router picks one leaf cell per vector) and the query's probed
    # cells are distinct, so (query_id, vec_id) pairs are unique by
    # construction — measured through the two-level branch by
    # tools/dedup_ab.py (105,596 pairs, 0 duplicates, −8% wall at 10×).
    cand = corpus_cells.join(query_cells, on="cell").select(
        "query_id", "vec_id", "cell"
    )
    psum = F.sum("__part")
    if residual:
        # exact per-(query, cell) centroid term over a metadata-sized
        # broadcast cross: nq × nlist rows, never corpus-scaled
        cterm = _dec_sum(
            F.zip_with(
                F.col("__v"), F.col("__cent"), lambda a, b: (a * b).cast(_DEC)
            )
        )
        qcent = q.join(F.broadcast(centroids)).select(
            "query_id", "cell", cterm.alias("__cterm")
        )
        scored = (
            cand.join(codes, on="vec_id")
            .join(F.broadcast(lut), on=["query_id", "m", "code"])
            .groupBy("query_id", "vec_id", "cell")
            .agg(psum.alias("__psum"))
            .join(F.broadcast(qcent), on=["query_id", "cell"])
            .select(
                "query_id",
                "vec_id",
                F.round(
                    (F.col("__cterm") + F.col("__psum")).cast("double"), 6
                ).alias("score"),
            )
        )
    else:
        scored = (
            cand.join(codes, on="vec_id")
            .join(F.broadcast(lut), on=["query_id", "m", "code"])
            .groupBy("query_id", "vec_id")
            .agg(F.round(psum.cast("double"), 6).alias("score"))
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "score", "rank")
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= rerank)
        .select("query_id", "vec_id")
    )
    refined = (
        shortlist.join(c.withColumn("__cvn", l2_norm(F.col("__v"))), on="vec_id")
        .join(
            F.broadcast(
                q.select("query_id", F.col("__v").alias("__qv")).withColumn(
                    "__qvn", l2_norm(F.col("__qv"))
                )
            ),
            on="query_id",
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_with_norms(
                    F.col("__qv"), F.col("__v"), F.col("__qvn"), F.col("__cvn")
                ),
                6,
            ).alias("score"),
        )
    )
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def embedding_outlier_report(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: float = 0.1,
) -> DataFrame:
    """(id, cell, cos_sim, cell_mean, is_outlier): assignment cosine to
    the nearest centroid vs the cell's mean — the engine half of
    ``corpus_embedding_outlier_prune`` (see its docstring for the scale
    and exactness story), split out so model-sweep tests can drive it
    with synthetic vectors and quantizers."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("__v")
    ).withColumn("__vn", l2_norm(F.col("__v")))
    scored = c.join(
        F.broadcast(centroids.withColumn("__cn", l2_norm(F.col("__cent"))))
    ).select(
        "vec_id",
        "cell",
        F.round(
            cosine_with_norms(
                F.col("__v"), F.col("__cent"), F.col("__vn"), F.col("__cn")
            ),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("cell")
    )
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 1)
        .select("vec_id", "cell", "cos_sim")
    )
    stats = assigned.groupBy("cell").agg(
        F.round(
            F.sum(F.col("cos_sim").cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("cell_mean"),
    )
    return (
        assigned.join(F.broadcast(stats), on="cell")
        .select(
            "vec_id",
            "cell",
            "cos_sim",
            "cell_mean",
            (F.col("cos_sim") < F.col("cell_mean") - margin).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )
