"""Incremental dedup (ext/incremental.py): tick semantics, index growth,
idempotence, and the no-corpus-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.incremental import (
    band_hashes,
    exact_index_rows,
    incremental_exact_tick,
    incremental_minhash_tick,
    minhash_index_rows,
    sig_est_jaccard,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LOREM = (
    "the quick brown fox jumps over the lazy dog while seventy two "
    "pelicans debate the merits of distributed joins at sunset near "
    "the harbor wall and nobody takes minutes of the meeting"
)
OTHER = (
    "completely unrelated prose about compilers register allocation "
    "graph coloring spill heuristics and the eternal sadness of "
    "phi nodes in loop headers during strength reduction passes"
)


# --- exact -----------------------------------------------------------------


def test_exact_tick_labels_index_batch_and_novel(spark):
    index = exact_index_rows(
        _docs(spark, [(1, LOREM), (2, OTHER), (3, LOREM)])
    )
    batch = _docs(
        spark,
        [
            (10, LOREM),        # dup of index doc 1 (lowest holder)
            (11, "brand new"),  # novel
            (12, "brand new"),  # within-batch dup of 11
            (13, OTHER.upper()),  # normalization: dup of index doc 2
        ],
    )
    got = {
        r.doc_id: (r.dup_of, r.is_new)
        for r in incremental_exact_tick(index, batch).collect()
    }
    assert got == {
        10: (1, False),
        11: (None, True),
        12: (11, False),
        13: (2, False),
    }


def test_exact_tick_index_match_beats_batch_prior(spark):
    # Doc 20 matches BOTH index doc 5 and earlier batch doc 19 — the
    # index (older) representative wins.
    index = exact_index_rows(_docs(spark, [(5, LOREM)]))
    batch = _docs(spark, [(19, LOREM), (20, LOREM)])
    got = {
        r.doc_id: r.dup_of
        for r in incremental_exact_tick(index, batch).collect()
    }
    assert got == {19: 5, 20: 5}


def test_exact_tick_is_idempotent_through_the_table(spark, tmp_path):
    """Re-ticking the same batch after persisting survivors marks every
    doc a duplicate — the persisted index absorbs the batch exactly once."""
    from etl_to_iceberg_spark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("dedup.fp")
    t.append(exact_index_rows(_docs(spark, [(1, LOREM)])))

    batch = _docs(spark, [(10, LOREM), (11, OTHER), (12, OTHER)])
    first = incremental_exact_tick(t.read(), batch)
    t.append(first.where("is_new").select("doc_id", "fingerprint"))
    assert t.read().count() == 2  # doc 11 joined doc 1

    second = incremental_exact_tick(t.read(), batch).collect()
    assert all(not r.is_new for r in second)
    got = {r.doc_id: (r.dup_of, r.already_ingested) for r in second}
    # Doc 11's own row is in the index now: a REPLAY, not a self-dup.
    assert got == {10: (1, False), 11: (None, True), 12: (11, False)}


def test_exact_tick_plan_never_shuffles_the_index(spark):
    """The index side must ride its scan: semi-filtered by a broadcast of
    the batch fingerprint set, min-aggregated only on the hits, broadcast
    back. No sort-merge join, no cartesian product anywhere."""
    index = exact_index_rows(_docs(spark, [(i, f"doc {i}") for i in range(50)]))
    batch = _docs(spark, [(100, "doc 1"), (101, "novel")])
    from etl_to_iceberg_spark.plans import explain_str

    plan = explain_str(incremental_exact_tick(index, batch), "formatted")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # semi + final left join


# --- minhash ---------------------------------------------------------------


def _perturb(text: str) -> str:
    # Change a couple of words: high (not perfect) shingle overlap.
    toks = text.split()
    toks[5] = "emerald"
    toks[-1] = "gavel"
    return " ".join(toks)


def test_minhash_tick_catches_cross_tick_near_dup(spark):
    index = minhash_index_rows(
        _docs(spark, [(1, LOREM), (2, OTHER)]), num_hashes=32, bands=8
    )
    batch = _docs(
        spark,
        [
            (10, _perturb(LOREM)),  # near-dup of index doc 1
            (11, "totally novel text about gardening with hydraulic presses"),
        ],
    )
    rows = {
        r.doc_id: r
        for r in incremental_minhash_tick(index, batch, threshold=0.4).collect()
    }
    assert rows[10].dup_of == 1 and not rows[10].is_new
    assert rows[10].est_jaccard >= 0.4
    assert rows[11].dup_of is None and rows[11].is_new


def test_minhash_tick_within_batch_and_exact_dup_estimates(spark):
    # Identical text → signature agreement 1.0; earlier batch doc is the
    # representative.
    index = minhash_index_rows(_docs(spark, [(1, OTHER)]))
    batch = _docs(spark, [(10, LOREM), (11, LOREM)])
    rows = {
        r.doc_id: r
        for r in incremental_minhash_tick(index, batch, threshold=0.5).collect()
    }
    assert rows[10].is_new
    assert rows[11].dup_of == 10 and rows[11].est_jaccard == 1.0


def test_minhash_tick_index_match_preferred_over_batch(spark):
    index = minhash_index_rows(_docs(spark, [(1, LOREM)]))
    batch = _docs(spark, [(10, LOREM), (11, LOREM)])
    rows = {
        r.doc_id: r.dup_of
        for r in incremental_minhash_tick(index, batch, threshold=0.5).collect()
    }
    assert rows == {10: 1, 11: 1}


def test_minhash_index_rows_match_batch_banding(spark):
    """Index band hashes (array form) must be bit-identical to the
    exploded banding ext/dedup.py's LSH uses — otherwise cross-tick
    buckets silently never collide."""
    from etl_to_iceberg_spark.ext.dedup import _explode_bands, minhash_signatures

    df = _docs(spark, [(1, LOREM), (2, OTHER)])
    via_index = {
        (r.doc_id, b, h)
        for r in minhash_index_rows(df).collect()
        for b, h in enumerate(r.band_hashes)
    }
    via_lsh = {
        (r.doc_id, r.band, r.band_hash)
        for r in _explode_bands(minhash_signatures(df)).collect()
    }
    assert via_index == via_lsh


def test_minhash_tick_is_idempotent_through_the_table(spark, tmp_path):
    from etl_to_iceberg_spark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("dedup.mh")
    t.append(minhash_index_rows(_docs(spark, [(1, LOREM)])))

    batch = _docs(spark, [(10, OTHER), (11, _perturb(LOREM))])
    first = incremental_minhash_tick(t.read(), batch, threshold=0.4)
    survivors = first.where("is_new").select("doc_id")
    t.append(
        minhash_index_rows(batch).join(survivors, "doc_id", "left_semi")
    )
    assert t.read().count() == 2  # only doc 10 was novel

    second = incremental_minhash_tick(t.read(), batch, threshold=0.4).collect()
    assert all(not r.is_new for r in second)


def test_minhash_tick_plan_no_sort_merge_join(spark):
    index = minhash_index_rows(
        _docs(spark, [(i, f"padding text number {i} with shared words") for i in range(30)])
    )
    batch = _docs(spark, [(100, LOREM), (101, OTHER)])
    from etl_to_iceberg_spark.plans import explain_str

    plan = explain_str(
        incremental_minhash_tick(index, batch, threshold=0.5), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sig_est_jaccard_bounds(spark):
    df = spark.range(1).select(
        sig_est_jaccard(
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
            F.array(F.lit(1), F.lit(2), F.lit(9), F.lit(9)),
        ).alias("e")
    )
    assert df.collect()[0].e == pytest.approx(0.5)


def test_sql_string_twins_handle_awkward_column_names(spark):
    """The SQL-string overloads of band_hashes / sig_est_jaccard quote
    the interpolated identifier and prefix their lambda variables
    (ADVICE r17): a column that is not a plain SQL identifier (hyphen)
    or that collides with a lambda variable name (`b`, `x`, `e`) must
    resolve exactly like the Column-typed overloads."""
    from etl_to_iceberg_spark.ext.incremental import band_hashes, sig_est_jaccard

    arr = F.array(*[F.lit(i) for i in range(16)])
    arr2 = F.array(*[F.lit(i if i % 2 else 99) for i in range(16)])
    df = spark.range(1).select(
        arr.alias("my-sig"), arr.alias("b"), arr2.alias("x"), arr2.alias("e")
    )
    got = df.select(
        band_hashes("my-sig", bands=8).alias("h1"),
        band_hashes("b", bands=8).alias("h2"),
        sig_est_jaccard("b", "x").alias("e1"),
        sig_est_jaccard("my-sig", "e").alias("e2"),
    ).collect()[0]
    ref = df.select(
        band_hashes(F.col("my-sig"), bands=8).alias("h1"),
        sig_est_jaccard(F.col("b"), F.col("x")).alias("e1"),
    ).collect()[0]
    assert got.h1 == ref.h1 and got.h2 == ref.h1
    assert got.e1 == ref.e1 and got.e2 == ref.e1


def test_randomized_ticks_equal_batch_exact_dedup(spark, tmp_path):
    """Randomized sweep: ingesting a corpus as a sequence of id-ordered
    incremental exact ticks must reproduce batch-mode exact_dedup exactly
    — same representative set, and every duplicate labeled with the
    GLOBAL first holder of its text (the index carries min-per-
    fingerprint, within-batch the earliest prior wins, so the composition
    is associative across any batch cut)."""
    import random

    from etl_to_iceberg_spark.ext.dedup import exact_dedup
    from etl_to_iceberg_spark.tables import Catalog

    rng = random.Random(20260814)
    pool = [
        " ".join(rng.choice("alpha beta gamma delta epsilon zeta eta theta "
                            "iota kappa".split()) for _ in range(12))
        for _ in range(8)
    ]
    for prog in range(4):
        n = rng.randint(15, 40)
        docs = [(i, rng.choice(pool)) for i in range(n)]
        # Python model: first holder per normalized text.
        first: dict[str, int] = {}
        expect: dict[int, int | None] = {}
        for i, txt in docs:
            expect[i] = first.get(txt)
            first.setdefault(txt, i)

        cat = Catalog(spark, str(tmp_path / f"wh{prog}"))
        t = cat.table("dedup.fp")
        t.append(spark.createDataFrame([], "doc_id long, fingerprint string"))
        got: dict[int, int | None] = {}
        pos = 0
        while pos < n:
            cut = rng.randint(pos + 1, n)
            batch = _docs(spark, docs[pos:cut])
            labeled = incremental_exact_tick(t.read(), batch).collect()
            got.update({r.doc_id: r.dup_of for r in labeled})
            t.append(
                spark.createDataFrame(
                    [(r.doc_id, r.fingerprint) for r in labeled if r.is_new],
                    "doc_id long, fingerprint string",
                )
            )
            pos = cut
        assert got == expect, f"program {prog} diverged from the model"
        # Representative set == batch-mode exact_dedup over the union.
        reps = {r.doc_id for r in exact_dedup(_docs(spark, docs)).collect()}
        assert {i for i, d in got.items() if d is None} == reps


def test_randomized_ticks_minhash_exact_dup_recall(spark, tmp_path):
    """Randomized sweep for the minhash tick: texts drawn from a pool of
    mutually word-disjoint documents. Exact re-occurrences MUST be caught
    (identical signature → identical band hashes → guaranteed bucket
    collision, est 1.0) and first occurrences must never be flagged
    (disjoint shingle sets → signature agreement ≈ 0 ≪ threshold)."""
    import random

    from etl_to_iceberg_spark.tables import Catalog

    rng = random.Random(99)
    # 6 docs over disjoint 12-word vocabularies.
    pool = [
        " ".join(f"w{p}_{k}" for k in range(12)) for p in range(6)
    ]
    n = 30
    docs = [(i, rng.choice(pool)) for i in range(n)]
    seen: set[str] = set()
    first_new = {i for i, txt in docs if txt not in seen and not seen.add(txt)}

    cat = Catalog(spark, str(tmp_path / "whm"))
    t = cat.table("dedup.mh")
    t.append(
        spark.createDataFrame(
            [], "doc_id long, sig array<bigint>, band_hashes array<bigint>"
        )
    )
    got_new: set[int] = set()
    pos = 0
    while pos < n:
        cut = rng.randint(pos + 1, n)
        batch = _docs(spark, docs[pos:cut])
        labeled = incremental_minhash_tick(
            t.read(), batch, threshold=0.5
        ).collect()
        got_new.update(r.doc_id for r in labeled if r.is_new)
        for r in labeled:
            if not r.is_new:
                assert r.est_jaccard == 1.0  # only exact dups exist here
        t.append(
            minhash_index_rows(batch).join(
                spark.createDataFrame(
                    [(r.doc_id,) for r in labeled if r.is_new], "doc_id long"
                ),
                "doc_id",
                "left_semi",
            )
        )
        pos = cut
    assert got_new == first_new


def test_registered_queries_run_and_agree_with_semantics(spark, sf_dir):
    """The registry entries return one row per batch doc; every non-new
    row's dup_of precedes it (index docs or earlier batch docs)."""
    from etl_to_iceberg_spark.ext.incremental_queries import (
        dedup_incremental_exact,
        dedup_incremental_minhash,
    )

    for fn in (dedup_incremental_exact, dedup_incremental_minhash):
        rows = fn(spark, sf_dir).collect()
        assert len(rows) == 100  # 20% of the 500-doc fixture
        for r in rows:
            if not r.is_new:
                # dup_of is an index doc (any id ≢ 4 mod 5) or an
                # EARLIER batch doc (the split is mod-5, so index ids
                # are not numerically ordered before batch ids).
                assert r.dup_of is not None
                if r.dup_of % 5 == 4:
                    assert r.dup_of < r.doc_id
            else:
                assert r.dup_of is None


# --- ANN (embedding) -------------------------------------------------------


def _vecs(spark, rows, dim=8):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_ann_tick_search_then_insert(spark, tmp_path):
    """A batch vector identical to an index vector ranks it #1 with
    score 1.0; after the insert half, a LATER tick can retrieve the
    first batch's vectors — the index genuinely accretes."""
    import numpy as np

    from etl_to_iceberg_spark.ext.incremental import (
        ann_index_rows,
        incremental_ann_tick,
    )
    from etl_to_iceberg_spark.tables import Catalog

    rng = np.random.RandomState(7)
    base = [(i, rng.randn(8)) for i in range(40)]
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("ann.idx")
    t.append(ann_index_rows(_vecs(spark, base), planes=4, dim=8))

    probe = _vecs(spark, [(100, base[3][1]), (101, rng.randn(8))])
    res = {
        r.query_id: r
        for r in incremental_ann_tick(
            t.read(), probe, k=3, planes=4, dim=8
        ).collect()
        if r.rank == 1
    }
    assert res[100].vec_id == 3 and res[100].score == 1.0
    t.append(ann_index_rows(probe, planes=4, dim=8))

    # a later probe of vector 100's value finds BOTH 3 and 100 now
    probe2 = _vecs(spark, [(200, base[3][1])])
    hits = {
        r.vec_id
        for r in incremental_ann_tick(
            t.read(), probe2, k=3, planes=4, dim=8
        ).collect()
        if r.score == 1.0
    }
    assert {3, 100} <= hits
    assert t.read().count() == 42


def test_exact_tick_null_text_is_replay_safe(spark):
    """md5(NULL) is NULL and NULL never equi-joins: unguarded, a
    null-text doc re-labeled is_new on EVERY tick and the index
    double-absorbed it on replay. The fingerprint coalesces NULL to ''
    (no content == no content), so the second delivery of the same
    null-text doc reports already_ingested and appends nothing."""
    batch = _docs(spark, [(1, None), (2, LOREM)])
    tick1 = incremental_exact_tick(
        exact_index_rows(_docs(spark, [])), batch
    ).collect()
    assert {r.doc_id: r.is_new for r in tick1} == {1: True, 2: True}
    assert all(r.fingerprint is not None for r in tick1)

    # index absorbed the batch; the SAME batch is redelivered
    index = exact_index_rows(batch)
    tick2 = {r.doc_id: r for r in incremental_exact_tick(index, batch).collect()}
    assert tick2[1].already_ingested and not tick2[1].is_new
    assert tick2[2].already_ingested and not tick2[2].is_new


def test_minhash_tick_null_text_is_replay_safe(spark):
    """Same invariant for the sketch path: a NULL shingle array folds to
    a NULL signature whose band hashes never match, so replays
    re-absorbed null-text docs. Coalesced to '', the constant empty
    signature self-matches and the replay reports already_ingested."""
    batch = _docs(spark, [(1, None), (2, LOREM)])
    index = minhash_index_rows(batch)  # insert half already committed
    got = {
        r.doc_id: r
        for r in incremental_minhash_tick(index, batch, threshold=0.5).collect()
    }
    assert got[1].already_ingested and not got[1].is_new
    assert got[2].already_ingested and not got[2].is_new


def test_minhash_tick_caches_are_exposed_for_cleanup(spark):
    """A long-lived caller passes `caches` and releases after
    materializing (caching.release_frame) — without it every tick leaks
    two frames into the block store. caches[0] is the eagerly
    localCheckpoint'ed batch sketch (its blocks belong to the
    checkpointed RDD, invisible to DataFrame.storageLevel and to plain
    unpersist); caches[1] is the cached candidate set. release_frame
    must drop BOTH deterministically — the block-store no-growth
    property the streaming churn sweep asserts across drains."""
    from etl_to_iceberg_spark.caching import release_frame

    index = minhash_index_rows(_docs(spark, [(1, LOREM)]))
    batch = _docs(spark, [(2, OTHER)])
    handles: list = []
    incremental_minhash_tick(index, batch, caches=handles).collect()
    assert len(handles) == 2
    # the checkpointed sketch: plan truncated to an RDD scan, blocks live
    sketch_plan = handles[0]._jdf.queryExecution().analyzed()
    assert sketch_plan.getClass().getSimpleName() == "LogicalRDD"
    sketch_rdd = sketch_plan.rdd()
    lvl = sketch_rdd.getStorageLevel()
    assert lvl.useMemory() or lvl.useDisk()
    # the candidate set: a plain cache
    assert handles[1].storageLevel.useMemory or handles[1].storageLevel.useDisk
    for df in handles:
        release_frame(df)
    lvl = sketch_rdd.getStorageLevel()
    assert not (lvl.useMemory() or lvl.useDisk())
    assert not (
        handles[1].storageLevel.useMemory or handles[1].storageLevel.useDisk
    )


def test_minhash_tick_replay_with_lower_id_twin(spark):
    """Redelivered batch containing an already-ingested doc PLUS a new
    lower-id identical doc: the lower-id doc becomes the signature rep
    and its index match IS the replayed twin's own row. The twin must
    report already_ingested (its row is in the index) and dup_of the
    rep (the earlier-in-batch holder), never dup_of itself."""
    index = minhash_index_rows(_docs(spark, [(5, LOREM), (6, OTHER)]))
    batch = _docs(spark, [(3, LOREM), (5, LOREM)])
    got = {
        r.doc_id: r
        for r in incremental_minhash_tick(index, batch, threshold=0.5).collect()
    }
    assert got[3].dup_of == 5 and not got[3].is_new
    assert not got[3].already_ingested
    assert got[5].already_ingested
    assert not got[5].is_new
    assert got[5].dup_of == 3  # earlier-in-batch holder, not itself
    assert got[5].dup_of != 5


def test_ann_tick_replay_excludes_own_row_and_append_is_idempotent(
    spark, tmp_path
):
    """Redelivered ANN batch whose insert half already committed: the
    query's own index row must not occupy a top-k slot at cosine 1.0,
    and re-running the registered caller pattern (anti-join before
    append) must not double-store the batch."""
    import numpy as np

    from etl_to_iceberg_spark.ext.incremental import (
        ann_index_rows,
        incremental_ann_tick,
    )
    from etl_to_iceberg_spark.tables import Catalog

    rng = np.random.RandomState(11)
    base = [(i, rng.randn(8)) for i in range(30)]
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("ann.idx")
    t.append(ann_index_rows(_vecs(spark, base), planes=4, dim=8))

    batch = _vecs(spark, [(100, base[7][1])])
    t.append(ann_index_rows(batch, planes=4, dim=8))  # insert half done
    n_before = t.read().count()

    # replayed search half: own row excluded, true neighbor 7 at rank 1
    res = incremental_ann_tick(t.read(), batch, k=3, planes=4, dim=8).collect()
    assert all(r.vec_id != 100 for r in res)
    top = [r for r in res if r.rank == 1]
    assert top and top[0].vec_id == 7 and top[0].score == 1.0

    # replayed insert half (the registered caller's anti-join pattern)
    t.append(
        ann_index_rows(batch, planes=4, dim=8).join(
            t.read().select("vec_id"), on="vec_id", how="left_anti"
        )
    )
    assert t.read().count() == n_before  # no double-store


def test_ann_tick_plan_index_never_shuffles(spark):
    import numpy as np

    from etl_to_iceberg_spark.ext.incremental import (
        ann_index_rows,
        incremental_ann_tick,
    )
    from etl_to_iceberg_spark.plans import explain_str

    rng = np.random.RandomState(1)
    index = ann_index_rows(
        _vecs(spark, [(i, rng.randn(8)) for i in range(30)]), planes=4, dim=8
    )
    batch = _vecs(spark, [(100, rng.randn(8))])
    plan = explain_str(
        incremental_ann_tick(index, batch, k=3, planes=4, dim=8), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_concurrent_exact_ticks_serialize_and_stay_consistent(spark, tmp_path):
    """Two ingest workers tick disjoint batches against the SAME index
    concurrently with retry-on-conflict. Appends serialize via the
    optimistic commit; if both workers sketch the same novel content
    before either lands, the index may hold two entries for one
    fingerprint — the documented union semantics — and every later tick
    must still resolve to the deterministic (min-id) representative."""
    import threading

    from etl_to_iceberg_spark.tables import Catalog
    from etl_to_iceberg_spark.tables.format import CommitConflictError

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("dedup.fp_conc")
    t.append(exact_index_rows(_docs(spark, [(1, LOREM)])))

    batches = {
        "A": [(10, OTHER), (11, LOREM)],
        "B": [(20, OTHER), (21, "a third distinct document")],
    }
    errors: list[str] = []

    def worker(name):
        handle = cat.table("dedup.fp_conc")
        batch = _docs(spark, batches[name])
        for _ in range(20):
            labeled = incremental_exact_tick(handle.read(), batch)
            rows = labeled.where("is_new").select("doc_id", "fingerprint")
            try:
                handle.append(rows)
                return
            except CommitConflictError:
                continue  # re-tick against the refreshed index
        errors.append(f"worker {name} exhausted retries")

    threads = [threading.Thread(target=worker, args=(n,)) for n in batches]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    idx = cat.table("dedup.fp_conc").read().collect()
    by_fp: dict[str, list[int]] = {}
    for r in idx:
        by_fp.setdefault(r.fingerprint, []).append(r.doc_id)
    # LOREM was pre-seeded, so 11 was a dup and never appended; OTHER may
    # hold one or two entries depending on interleaving; the third doc is
    # unique to B.
    assert by_fp[
        exact_index_rows(_docs(spark, [(1, LOREM)])).collect()[0].fingerprint
    ] == [1]
    other_fp = exact_index_rows(_docs(spark, [(0, OTHER)])).collect()[0].fingerprint
    assert set(by_fp[other_fp]) <= {10, 20} and by_fp[other_fp]

    # deterministic representative for a later tick, whatever landed
    later = incremental_exact_tick(
        cat.table("dedup.fp_conc").read(), _docs(spark, [(30, OTHER)])
    ).collect()[0]
    assert later.dup_of == min(by_fp[other_fp]) and not later.is_new


def test_minhash_tick_flood_batch_is_collapsed(spark):
    """10k byte-identical docs arriving in ONE tick: the within-batch
    join must see one representative (not a 10k² bucket), every twin
    labels to the earliest member at est 1.0, the rep is the single
    is_new row, and the planted near-dup pair is still caught."""
    boiler = "terms of service apply to all users of this site " * 6
    rows = [(i, boiler) for i in range(10_000)]
    rows.append((20_000, _perturb(LOREM)))
    batch = _docs(spark, rows)
    index = minhash_index_rows(_docs(spark, [(1, LOREM)]))

    out = incremental_minhash_tick(index, batch, threshold=0.4)
    labeled = {r.doc_id: r for r in out.collect()}
    assert len(labeled) == 10_001
    assert labeled[0].is_new  # flood representative
    twins = [r for i, r in labeled.items() if 0 < i < 10_000]
    assert all(r.dup_of == 0 and r.est_jaccard == 1.0 for r in twins)
    assert sum(r.is_new for r in labeled.values()) <= 2  # rep + maybe near-dup
    # the near-dup of the indexed doc is still caught across the flood
    assert labeled[20_000].dup_of == 1 and not labeled[20_000].is_new


def test_ann_tick_multiprobe_recall_monotone_in_probes(spark):
    """Recall@k vs brute force is non-decreasing in `probes`: candidate
    sets are supersets (mask list is a prefix chain), and every true
    top-k member present among candidates outranks every non-member, so
    widening the probe ring can only add true neighbors to the result.
    Also pins: probes=1 is the exact-bucket-only behavior, and full
    multiprobe yields no duplicate (query, vec) pairs (the probe keys
    are distinct buckets)."""
    import numpy as np

    from etl_to_iceberg_spark.ext.incremental import (
        ann_index_rows,
        incremental_ann_tick,
    )
    from etl_to_iceberg_spark.ext.similarity import cosine_topk

    rng = np.random.RandomState(42)
    base = _vecs(spark, [(i, rng.randn(8)) for i in range(80)])
    batch = _vecs(spark, [(100 + i, rng.randn(8)) for i in range(10)])
    index = ann_index_rows(base, planes=4, dim=8)

    true = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(
            base, batch.withColumnRenamed("vec_id", "query_id"), k=5
        ).collect()
    }
    recalls = []
    for probes in (1, 3, 5):
        got = incremental_ann_tick(
            index, batch, k=5, planes=4, dim=8, probes=probes
        ).collect()
        pairs = [(r.query_id, r.vec_id) for r in got]
        assert len(pairs) == len(set(pairs))  # no candidate duplicates
        recalls.append(len(true & set(pairs)) / len(true))
    assert recalls == sorted(recalls)
    # At planes=4/80 vectors an exact-bucket miss is common; the full
    # probe ring must measurably beat single-bucket on this seed. (The
    # Hamming≤1 ring covers 5 of 16 buckets, so recall well short of 1.0
    # is expected — the knob trades one broadcast row per probe for
    # candidate coverage; everything here is seeded + LCG-deterministic.)
    assert recalls[-1] > recalls[0]
    assert recalls[-1] >= 0.45
