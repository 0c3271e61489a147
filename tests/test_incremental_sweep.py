"""Churn-resilience sweep for the incremental dedup ticks (VERDICT r6 #6).

The tick family's replay tests are example-based (planted duplicates);
this sweep drives SEEDED RANDOM tick programs — batches mixing novel
docs, duplicates of ingested or in-batch content, exact replays,
same-id-new-content rows, and NULL/empty text — against a pure-Python
index model, asserting per-tick LABELS and the INDEX CONTENTS both
match after every tick.

Model validity rests on the binary-content scheme: pool contents use
disjoint token vocabularies, so two docs are either byte-identical
(exact-fp equal; minhash est 1.0 — identical signatures) or unrelated
(fp differs; est ~0 ≪ threshold — 16+ of 32 seeded-xxhash64 positions
agreeing across disjoint shingle sets is impossible in practice). Every
dup decision is therefore content-equality, which Python can replicate
without reimplementing the sketches. NULL and '' are one content key:
both ticks coalesce NULL to '' by contract.

Index maintenance follows the registered callers' contract
(ext/incremental_queries.py, streaming/ingest.py): append exactly the
``is_new`` rows after each tick.
"""

from __future__ import annotations

import random

from etl_to_iceberg_spark.caching import release_frame

import pytest

from etl_to_iceberg_spark.ext.incremental import (
    incremental_exact_tick,
    incremental_minhash_tick,
    minhash_index_rows,
)

# content key -1 is the NULL/'' class; keys >= 0 are distinct documents
_NULLISH = -1


def _content(key: int, nullish_null: bool) -> str | None:
    if key == _NULLISH:
        return None if nullish_null else ""
    return (
        f"alpha{key} beta{key} gamma{key} delta{key} epsilon{key} "
        f"zeta{key} eta{key} theta{key} iota{key} kappa{key}"
    )


def _gen_program(rng: random.Random, *, n_ticks: int, max_batch: int):
    """A tick program: list of batches of (doc_id, content_key, is_null).

    Draws each batch doc from the churn moves: novel content / dup of a
    random prior content / exact replay of an ingested (id, content) /
    same-id-new-content / nullish text. Ids are unique within a batch
    (the ticks' documented contract)."""
    next_id = 0
    next_key = 0
    ingested: list[tuple[int, int]] = []  # (doc_id, content_key) "index"
    seen_keys: list[int] = []
    program = []
    for _ in range(n_ticks):
        batch: list[tuple[int, int, bool]] = []
        used_ids: set[int] = set()
        for _ in range(rng.randint(1, max_batch)):
            move = rng.random()
            if move < 0.30 or not seen_keys:  # novel content, new id
                key = next_key
                next_key += 1
                doc = (next_id, key, False)
                next_id += 1
            elif move < 0.55:  # duplicate content, new id
                doc = (next_id, rng.choice(seen_keys), False)
                next_id += 1
            elif move < 0.70 and ingested:  # exact replay
                rid, rkey = rng.choice(ingested)
                if rid in used_ids:
                    continue
                doc = (rid, rkey, False)
            elif move < 0.80 and ingested:  # same id, NEW content
                rid, _ = rng.choice(ingested)
                if rid in used_ids:
                    continue
                key = next_key
                next_key += 1
                doc = (rid, key, False)
            else:  # nullish text (NULL or '', both content class -1)
                doc = (next_id, _NULLISH, rng.random() < 0.5)
                next_id += 1
            if doc[0] in used_ids:
                continue
            used_ids.add(doc[0])
            batch.append(doc)
            if doc[1] not in seen_keys:
                seen_keys.append(doc[1])
        program.append(batch)
        # maintain the model index here only to aim replay moves; the
        # authoritative per-tick model runs in the assertions
        for doc_id, key, _ in batch:
            labels = _model_exact_tick(ingested, [(doc_id, key)])
            if labels[doc_id][1]:  # is_new
                ingested.append((doc_id, key))
    return program


def _model_exact_tick(index: list[tuple[int, int]], batch: list[tuple[int, int]]):
    """Python replica of incremental_exact_tick's labels:
    doc_id -> (dup_of, is_new, already_ingested)."""
    out = {}
    for doc_id, key in batch:
        holders = [i for i, k in index if k == key]
        other = min((i for i in holders if i != doc_id), default=None)
        prior = min(
            (i for i, k in batch if k == key and i < doc_id), default=None
        )
        dup_of = other if other is not None else prior
        replay = (doc_id, key) in index
        out[doc_id] = (dup_of, dup_of is None and not replay, replay)
    return out


def _model_minhash_tick(index: list[tuple[int, int]], batch: list[tuple[int, int]]):
    """Python replica of incremental_minhash_tick's labels under the
    binary-content scheme: doc_id -> (dup_of, is_new, already_ingested).

    Index match preferred over in-batch rep (index docs are older);
    identical-content batch docs collapse to their earliest member (the
    rep); a twin whose inherited index match is ITSELF falls back to the
    rep; replays are docs whose own (id, content) row sits in the index."""
    out = {}
    reps = {}  # content key -> rep id
    for doc_id, key in sorted(batch):
        reps.setdefault(key, doc_id)
    for doc_id, key in batch:
        holders = [i for i, k in index if k == key]
        rep = reps[key]
        replay = (doc_id, key) in index
        if doc_id == rep:
            match = min((i for i in holders if i != doc_id), default=None)
            out[doc_id] = (match, match is None and not replay, replay)
        else:
            inherited = min((i for i in holders if i != rep), default=None)
            if inherited == doc_id:
                inherited = None
            out[doc_id] = (inherited if inherited is not None else rep, False, replay)
    return out


def _batch_df(spark, batch):
    return spark.createDataFrame(
        [(i, _content(k, isnull)) for i, k, isnull in batch],
        "doc_id long, text string",
    )


@pytest.mark.parametrize("chunk", range(10))
def test_exact_tick_random_churn_matches_model(spark, chunk):
    """100 random programs (10 per chunk), up to 4 ticks x 8 docs each:
    labels AND index contents must match the model after every tick."""
    for prog_i in range(10):
        rng = random.Random(1000 * chunk + prog_i)
        program = _gen_program(rng, n_ticks=4, max_batch=8)
        index: list[tuple[int, int]] = []  # model: (id, key)
        spark_index: list[tuple[int, str]] = []  # real: (id, fingerprint)
        fp_of_key: dict[int, str] = {}
        for batch in program:
            if not batch:
                continue
            idx_df = spark.createDataFrame(
                spark_index or [], "doc_id long, fingerprint string"
            )
            rows = incremental_exact_tick(idx_df, _batch_df(spark, batch)).collect()
            pairs = [(i, k) for i, k, _ in batch]
            want = _model_exact_tick(index, pairs)
            got = {
                r.doc_id: (r.dup_of, r.is_new, r.already_ingested) for r in rows
            }
            assert got == want, f"chunk={chunk} prog={prog_i}"
            # fingerprint equality structure == content equality
            for r in rows:
                key = dict(pairs)[r.doc_id]
                assert fp_of_key.setdefault(key, r.fingerprint) == r.fingerprint
            # caller contract: append exactly the is_new rows
            for r in rows:
                if r.is_new:
                    spark_index.append((r.doc_id, r.fingerprint))
                    index.append((r.doc_id, dict(pairs)[r.doc_id]))
            assert len(spark_index) == len(index)


@pytest.mark.parametrize("chunk", range(5))
def test_minhash_tick_random_churn_matches_model(spark, chunk):
    """25 random programs (5 per chunk), 2 ticks x 6 docs: minhash labels
    (incl. est 1.0-vs-NULL) and index doc_ids must match the model."""
    for prog_i in range(5):
        rng = random.Random(7000 + 100 * chunk + prog_i)
        program = _gen_program(rng, n_ticks=2, max_batch=6)
        index: list[tuple[int, int]] = []
        spark_index_rows: list = []  # real (doc_id, sig, band_hashes) rows
        for batch in program:
            if not batch:
                continue
            idx_df = spark.createDataFrame(
                spark_index_rows or [],
                "doc_id long, sig array<bigint>, band_hashes array<bigint>",
            )
            bdf = _batch_df(spark, batch)
            caches: list = []
            labeled = incremental_minhash_tick(
                idx_df, bdf, threshold=0.5, caches=caches
            )
            rows = labeled.collect()
            pairs = [(i, k) for i, k, _ in batch]
            want = _model_minhash_tick(index, pairs)
            got = {
                r.doc_id: (r.dup_of, r.is_new, r.already_ingested) for r in rows
            }
            assert got == want, f"chunk={chunk} prog={prog_i}"
            # est is 1.0 exactly when a dup/match exists, else NULL
            for r in rows:
                assert (r.est_jaccard == 1.0) == (r.dup_of is not None), r
            new_ids = {r.doc_id for r in rows if r.is_new}
            sketch = {
                r.doc_id: r
                for r in minhash_index_rows(bdf).collect()
                if r.doc_id in new_ids
            }
            for doc_id in sorted(new_ids):
                r = sketch[doc_id]
                spark_index_rows.append((r.doc_id, r.sig, r.band_hashes))
                index.append((doc_id, dict(pairs)[doc_id]))
            for c in caches:
                release_frame(c)
            assert len(spark_index_rows) == len(index)


@pytest.mark.parametrize("seed", [21, 4750])
def test_stream_incremental_dedup_random_churn_matches_model(
    spark, tmp_path, seed
):
    """The streaming wrapper under the same churn programs: one file per
    drain (= one micro-batch = one tick), labels MERGE-keyed by doc_id so
    a re-delivered doc's row is overwritten with its latest tick label.
    After every drain the labels table must equal the model's latest
    label per doc and the index must hold exactly the model's rows —
    end-to-end across the file source, checkpointing, tick, and MERGE."""
    from etl_to_iceberg_spark.streaming.ingest import stream_incremental_dedup
    from etl_to_iceberg_spark.tables import Catalog

    rng = random.Random(seed)
    program = _gen_program(rng, n_ticks=3, max_batch=6)
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    cat = Catalog(spark, str(tmp_path / "wh"))
    schema = _batch_df(spark, [(0, 0, False)]).schema

    index_model: list[tuple[int, int]] = []
    latest: dict[int, tuple] = {}
    for batch in program:
        if not batch:
            continue
        _batch_df(spark, batch).coalesce(1).write.mode("append").parquet(src)
        stream_incremental_dedup(
            spark, src, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
            catalog=cat, index_identifier="d.idx",
            labels_identifier="d.labels",
        )
        pairs = [(i, k) for i, k, _ in batch]
        want = _model_exact_tick(index_model, pairs)
        for i, k in pairs:
            if want[i][1]:  # is_new
                index_model.append((i, k))
            latest[i] = want[i]
        got = {
            r.doc_id: (r.dup_of, r.is_new, r.already_ingested)
            for r in cat.table("d.labels").read().collect()
        }
        assert got == latest, f"seed={seed}"
        idx_ids = sorted(r.doc_id for r in cat.table("d.idx").read().collect())
        assert idx_ids == sorted(i for i, _ in index_model)


@pytest.mark.parametrize("seed", [33, 6021])
def test_stream_incremental_minhash_random_churn_matches_model(
    spark, tmp_path, seed
):
    """The minhash streaming wrapper under the churn programs: labels
    table = model's latest minhash label per doc; index doc_ids = model
    rows; per-batch tick caches released (block-store footprint bounded
    across drains)."""
    from etl_to_iceberg_spark.streaming.ingest import (
        stream_incremental_minhash_dedup,
    )
    from etl_to_iceberg_spark.tables import Catalog

    rng = random.Random(seed)
    program = _gen_program(rng, n_ticks=3, max_batch=5)
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    cat = Catalog(spark, str(tmp_path / "wh"))
    schema = _batch_df(spark, [(0, 0, False)]).schema
    # cache-discipline baseline: other tests in the shared session may
    # hold their own caches, so assert NO GROWTH, not an absolute count
    jsc = spark.sparkContext._jsc.sc()
    cached_before = jsc.getPersistentRDDs().size()

    index_model: list[tuple[int, int]] = []
    latest: dict[int, tuple] = {}
    for batch in program:
        if not batch:
            continue
        _batch_df(spark, batch).coalesce(1).write.mode("append").parquet(src)
        stream_incremental_minhash_dedup(
            spark, src, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
            catalog=cat, index_identifier="m.idx",
            labels_identifier="m.labels",
        )
        pairs = [(i, k) for i, k, _ in batch]
        want = _model_minhash_tick(index_model, pairs)
        for i, k in pairs:
            if want[i][1]:  # is_new
                index_model.append((i, k))
            latest[i] = want[i]
        got = {
            r.doc_id: (r.dup_of, r.is_new, r.already_ingested)
            for r in cat.table("m.labels").read().collect()
        }
        assert got == latest, f"seed={seed}"
        # est contract: 1.0 exactly when a dup/match exists, else NULL
        for r in cat.table("m.labels").read().collect():
            assert (r.est_jaccard == 1.0) == (r.dup_of is not None)
        idx_ids = sorted(r.doc_id for r in cat.table("m.idx").read().collect())
        assert idx_ids == sorted(i for i, _ in index_model)
    # cache discipline: the drains left no tick caches behind
    assert jsc.getPersistentRDDs().size() <= cached_before
