"""Adversarial hardening tests.

1. Optimistic-commit fault injection beyond the happy path: real
   concurrent writer threads with the documented retry protocol, a loser
   that retries after ``CommitConflictError``, and a VALID orphaned
   manifest (crash after manifest create, before pointer flip) that must
   stay invisible to readers.
2. A planted 10k-identical-docs corpus proving the MinHash exact-collapse
   + bucket-cap guards actually bound the LSH candidate set (the guards'
   code paths exist since r2; this is the adversarial proof).
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.tables import Catalog
from etl_to_iceberg_spark.tables.format import CommitConflictError


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def test_conflict_loser_retries_and_succeeds(cat, spark, sf_dir):
    """The documented recovery — re-read and retry — must actually work:
    after a CommitConflictError the SAME table handle commits cleanly and
    the rival's committed rows survive (no lost update)."""
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_retry")
    t.create(region)

    # Rival fully commits version 2 after our writer froze its choice.
    rival = cat.table("s.r_retry")
    nxt = t._next_version()
    frozen = t._next_version
    t._next_version = lambda: nxt
    rival.append(region.withColumn("r_name", F.lit("RIVAL")))

    with pytest.raises(CommitConflictError):
        t.append(region)

    # Retry: restore real version allocation (= re-read current state).
    t._next_version = frozen
    snap = t.append(region)
    assert snap.version == 3
    df = t.read()
    assert df.count() == 3 * region.count()
    assert df.where(F.col("r_name") == "RIVAL").count() == region.count()


def test_concurrent_appends_all_land(cat, spark, sf_dir):
    """N writer threads appending to one table with retry-on-conflict:
    every append must land exactly once (serialized by the exclusive
    manifest create), no lost updates, version chain contiguous."""
    region = load_table(spark, sf_dir, "region").cache()
    n_rows = region.count()
    t0 = cat.table("s.r_conc")
    t0.create(region.withColumn("writer", F.lit(-1)))

    n_writers, errors = 6, []

    def writer(i: int) -> None:
        handle = cat.table("s.r_conc")  # own handle, like a real executor
        batch = region.withColumn("writer", F.lit(i))
        for _ in range(20):  # bounded retry
            try:
                handle.append(batch)
                return
            except CommitConflictError:
                continue
        errors.append(f"writer {i} exhausted retries")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    final = cat.table("s.r_conc")
    df = final.read()
    assert df.count() == (n_writers + 1) * n_rows
    # every writer's batch landed exactly once
    per_writer = {
        r["writer"]: r["n"]
        for r in df.groupBy("writer").agg(F.count("*").alias("n")).collect()
    }
    assert per_writer == {i: n_rows for i in range(-1, n_writers)}
    # version chain is contiguous and parent-linked
    snaps = sorted(final.snapshots(), key=lambda s: s.version)
    assert [s.version for s in snaps] == list(range(1, n_writers + 2))
    assert all(s.parent == s.version - 1 for s in snaps[1:])


def test_valid_orphan_manifest_stays_invisible(cat, spark, sf_dir):
    """Crash AFTER a fully valid manifest write but BEFORE the pointer
    flip: readers must keep serving the old version (the orphan's files
    must not leak into reads), and the next commit skips the orphaned
    version number."""
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_orphan")
    t.create(region)

    # Simulate the crash by doing a real commit, then rolling the pointer
    # back by hand: snap-2.json is VALID on disk, pointer says 1.
    t.append(region.withColumn("r_name", F.lit("GHOST")))
    with open(os.path.join(t.meta_dir, "version-hint.txt"), "w") as f:
        f.write("1")

    fresh = cat.table("s.r_orphan")
    assert fresh.current_version() == 1
    df = fresh.read()
    assert df.count() == region.count()
    assert df.where(F.col("r_name") == "GHOST").count() == 0

    snap = fresh.append(region)  # must allocate 3, not collide on 2
    assert snap.version == 3
    # the ghost rows stay dead even after the table moves on
    assert fresh.read().where(F.col("r_name") == "GHOST").count() == 0


def test_torn_manifest_fails_loudly_not_silently(cat, spark, sf_dir):
    """A truncated (torn-write) manifest for the CURRENT version is
    corruption, not a state to paper over: reading must raise, not
    silently serve partial data."""
    region = load_table(spark, sf_dir, "region")
    t = cat.table("s.r_torn")
    t.create(region)
    snap_path = os.path.join(t.meta_dir, "snap-1.json")
    blob = open(snap_path).read()
    with open(snap_path, "w") as f:
        f.write(blob[: len(blob) // 2])
    fresh = cat.table("s.r_torn")
    with pytest.raises(Exception):
        fresh.read().count()


# --- MinHash adversarial corpus -------------------------------------------


def _planted_corpus(spark, n_copies: int = 10_000, n_distinct: int = 50):
    """n_copies byte-identical boilerplate docs + a tail of distinct docs
    (two of which are true near-duplicates of each other)."""
    boiler = "terms of service apply to all users of this site " * 6
    rows = [(i, boiler) for i in range(n_copies)]
    for j in range(n_distinct):
        rows.append(
            (
                n_copies + j,
                f"document {j} discusses topic {j} with unique content "
                f"alpha beta gamma delta {j} " * 3,
            )
        )
    # a genuine near-dup pair far from the boilerplate cluster
    rows.append((90_000, "the quick brown fox jumps over the lazy dog near the river bank today"))
    rows.append((90_001, "the quick brown fox jumps over the lazy dog near the river bank tonight"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_collapse_bounds_planted_identical_cluster(spark):
    """10k identical docs must contribute ONE representative to the LSH
    join — the banded candidate set stays small — while the pair output
    still covers the whole cluster via re-emitted exact edges, and the
    planted near-dup pair is found."""
    from etl_to_iceberg_spark.ext.dedup import (
        lsh_candidate_pairs,
        minhash_near_duplicates,
        minhash_signatures,
    )

    df = _planted_corpus(spark)

    # Guard 1 (collapse): the candidate join, fed post-collapse, is bounded.
    sigs_fp = minhash_signatures(
        df, extra_cols=[F.xxhash64("text").alias("__fp")]
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__fp")
    reps = (
        sigs_fp.withColumn("__rep", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("__rep"))
        .select("doc_id", "sig")
    )
    assert reps.count() == 53  # 1 boilerplate rep + 50 distinct + fox pair
    n_cands = lsh_candidate_pairs(reps, max_bucket_size=256).count()
    assert n_cands < 200, f"candidate set not bounded: {n_cands}"

    # End-to-end: full pipeline output covers the cluster without a
    # quadratic candidate explosion (10k identical docs -> 9999 exact
    # edges to the representative, NOT ~5e7 pairs).
    pairs = minhash_near_duplicates(df, threshold=0.5)
    total = pairs.count()
    assert 9_999 <= total <= 9_999 + 300, total
    fox = pairs.where(
        (F.col("id_a") == 90_000) & (F.col("id_b") == 90_001)
        | (F.col("id_a") == 90_001) & (F.col("id_b") == 90_000)
    )
    assert fox.count() == 1
    cluster_edges = pairs.where((F.col("id_a") < 10_000) & (F.col("id_b") < 10_000))
    assert cluster_edges.count() == 9_999


def test_minhash_bucket_cap_bounds_residual_hot_bucket(spark):
    """With collapse OFF (distinct ids, identical signatures — the
    residual pathology the cap exists for), an uncapped run would emit
    ~n^2/2 pairs; the cap must keep the candidate set at zero for the hot
    bucket and the oversized_buckets accounting must report what was
    skipped."""
    from etl_to_iceberg_spark.ext.dedup import (
        _explode_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        oversized_buckets,
    )

    boiler = "identical hot bucket text repeated everywhere " * 5
    df = spark.createDataFrame(
        [(i, boiler) for i in range(2_000)], "doc_id long, text string"
    )
    sigs = minhash_signatures(df)
    capped = lsh_candidate_pairs(sigs, max_bucket_size=256)
    assert capped.count() == 0  # every bucket is oversized -> all skipped
    banded = _explode_bands(sigs, bands=8)
    over = oversized_buckets(banded, ["band", "band_hash"], 256)
    rows = over.collect()
    assert rows and all(r["n"] == 2_000 for r in rows)


# --- streaming restart: crash mid-drain, resume from checkpoint ------------


class _TableProxy:
    """IceTable wrapper that injects a crash around the Nth write."""

    def __init__(self, inner, state, crash_on, when):
        self._inner = inner
        self._state = state
        self._crash_on = crash_on
        self._when = when

    def _gate(self, do_write):
        self._state["writes"] += 1
        n = self._state["writes"]
        if self._when == "before" and n == self._crash_on:
            raise RuntimeError("injected crash before write")
        do_write()
        if self._when == "after" and n == self._crash_on:
            raise RuntimeError("injected crash after write")

    def append(self, df):
        self._gate(lambda: self._inner.append(df))

    def merge(self, df, **kw):
        self._gate(lambda: self._inner.merge(df, **kw))

    def __getattr__(self, name):
        # reads (read/exists/snapshots/...) pass through un-gated
        return getattr(self._inner, name)


class _CrashingCatalog(Catalog):
    """Catalog whose tables crash around the Nth micro-batch write —
    simulates an executor/driver death mid-drain at the worst moments."""

    def __init__(self, spark, warehouse, *, crash_on, when):
        super().__init__(spark, warehouse)
        self.state = {"writes": 0}
        self._crash_on = crash_on
        self._when = when

    def table(self, identifier):
        return _TableProxy(
            super().table(identifier), self.state, self._crash_on, self._when
        )


def _write_source_files(spark, sf_dir, src_dir, n_files=6):
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    for i in range(n_files):
        nation.where(F.col("n_nationkey") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    return nation


def test_streaming_restart_append_no_loss_no_dupes(spark, sf_dir, tmp_path):
    """Kill the drain before batch 3's write, restart from the checkpoint:
    the resumed query must process exactly the unprocessed files — no lost
    rows (batch 3 itself) and no duplicates (batches 1-2)."""
    from etl_to_iceberg_spark.streaming.ingest import ingest_available_now

    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "_ckpt")
    nation = _write_source_files(spark, sf_dir, src_dir)
    schema = nation.schema

    crashing = _CrashingCatalog(
        spark, str(tmp_path / "wh"), crash_on=3, when="before"
    )
    with pytest.raises(Exception, match="injected crash"):
        ingest_available_now(
            spark, src_dir, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
            catalog=crashing, target_identifier="stream.nation",
            max_files_per_trigger=1,
        )
    # partial progress landed: some but not all batches committed
    clean = Catalog(spark, str(tmp_path / "wh"))
    partial = clean.table("stream.nation").read().count()
    assert 0 < partial < nation.count()

    ingest_available_now(
        spark, src_dir, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
        catalog=clean, target_identifier="stream.nation",
        max_files_per_trigger=1,
    )
    got = clean.table("stream.nation").read()
    assert got.count() == nation.count()
    assert got.select("n_nationkey").distinct().count() == nation.count()


def test_streaming_restart_upsert_idempotent_worst_case_crash(
    spark, sf_dir, tmp_path
):
    """Worst crash window: batch 3's MERGE lands, then the process dies
    BEFORE the checkpoint commit. The restarted query re-runs batch 3 —
    at-least-once delivery — and MERGE idempotency must absorb the replay:
    exactly one row per key at the end (the pairing the reference's
    wall-clock-cursor CDC lacks, hdfs_to_iceberg_cdc_operator.py:291-313)."""
    from etl_to_iceberg_spark.streaming.ingest import ingest_available_now

    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "_ckpt")
    nation = _write_source_files(spark, sf_dir, src_dir)
    schema = nation.schema

    crashing = _CrashingCatalog(
        spark, str(tmp_path / "wh"), crash_on=3, when="after"
    )
    with pytest.raises(Exception, match="injected crash"):
        ingest_available_now(
            spark, src_dir, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
            catalog=crashing, target_identifier="stream.nation_ups",
            mode="upsert", primary_key=["n_nationkey"],
            max_files_per_trigger=1,
        )
    clean = Catalog(spark, str(tmp_path / "wh"))
    ingest_available_now(
        spark, src_dir, fmt="parquet", schema=schema, checkpoint_dir=ckpt,
        catalog=clean, target_identifier="stream.nation_ups",
        mode="upsert", primary_key=["n_nationkey"],
        max_files_per_trigger=1,
    )
    got = clean.table("stream.nation_ups").read()
    assert got.count() == nation.count()  # replayed batch did not duplicate
    assert got.select("n_nationkey").distinct().count() == nation.count()


def test_streaming_incremental_dedup_survives_worst_case_crash(
    spark, sf_dir, tmp_path
):
    """Streaming dedup with durable index state, killed in the NASTIEST
    window: a micro-batch's index append lands, then the process dies
    before the labels merge and before the checkpoint commit. The
    restarted drain replays that batch at-least-once; the tick's replay
    detection (docs matching their OWN index rows report
    already_ingested, not is_new) must keep the index single-absorbed —
    the durable-state analogue of MERGE idempotency."""
    from etl_to_iceberg_spark.ext.dedup import exact_dedup
    from etl_to_iceberg_spark.streaming.ingest import stream_incremental_dedup

    src_dir = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "_ckpt")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 240)
    )
    n_files = 6
    for i in range(n_files):
        docs.where(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    # Each micro-batch = 1 index append + 1 labels merge; crash_on=5
    # "after" dies right after batch 3's index append.
    crashing = _CrashingCatalog(
        spark, str(tmp_path / "wh"), crash_on=5, when="after"
    )
    with pytest.raises(Exception, match="injected crash"):
        stream_incremental_dedup(
            spark, src_dir, fmt="parquet", schema=docs.schema,
            checkpoint_dir=ckpt, catalog=crashing,
            index_identifier="dedup.idx", labels_identifier="dedup.labels",
            max_files_per_trigger=1,
        )
    clean = Catalog(spark, str(tmp_path / "wh"))
    partial = clean.table("dedup.idx").read().count()
    assert partial > 0  # batch 3's append committed before the crash

    stream_incremental_dedup(
        spark, src_dir, fmt="parquet", schema=docs.schema,
        checkpoint_dir=ckpt, catalog=clean,
        index_identifier="dedup.idx", labels_identifier="dedup.labels",
        max_files_per_trigger=1,
    )

    index = clean.table("dedup.idx").read().cache()
    labels = clean.table("dedup.labels").read().cache()
    n_docs = docs.count()
    n_reps = exact_dedup(docs).count()

    # every doc labeled exactly once; the index absorbed each fingerprint
    # exactly once (no double-absorb through the crash/replay)
    assert labels.count() == n_docs
    assert labels.select("doc_id").distinct().count() == n_docs
    assert index.count() == n_reps
    assert index.select("fingerprint").distinct().count() == n_reps
    assert index.select("doc_id").distinct().count() == n_reps
    # representative accounting: is_new ∪ already_ingested = index docs
    reps = labels.where("is_new OR already_ingested")
    assert reps.count() == n_reps
    assert (
        reps.select("doc_id")
        .exceptAll(index.select("doc_id"))
        .count()
        == 0
    )
    # every duplicate points at a doc holding the SAME fingerprint
    dup_fp = (
        labels.where("dup_of IS NOT NULL")
        .alias("l")
        .join(
            index.alias("i"), F.col("l.dup_of") == F.col("i.doc_id"), "left"
        )
        .where(
            F.col("i.doc_id").isNull()
            | (F.col("l.fingerprint") != F.col("i.fingerprint"))
        )
    )
    assert dup_fp.count() == 0
    index.unpersist(); labels.unpersist()


# --- stateful sessionization with a table sink ------------------------------


def test_sessionize_table_sink_crash_replay_and_cross_drain_state(
    spark, tmp_path
):
    """The deployment sink for stateful sessionization: emissions MERGE
    into a managed table keyed by (user_id, session_start). Three things
    must hold at once:

    1. crash mid-drain (a micro-batch's MERGE lands, the process dies
       before its checkpoint commit) → the restarted drain replays that
       batch and the keyed MERGE absorbs it (no duplicate session rows);
    2. GroupState resumes ACROSS drains — a session left open in drain 1
       must keep its session_start and grow in drain 2, not fork;
    3. the final table equals the batch sessionize() oracle over all
       delivered events, with closed=False exactly on each user's last
       session.

    Wave-1 files are one-per-user so micro-batch ORDER across files
    cannot change the outcome (per-user event order is within-batch)."""
    import datetime as dt

    from etl_to_iceberg_spark.streaming.windows import (
        sessionize,
        sessionize_stateful_to_table,
    )

    base = dt.datetime(2024, 1, 1)
    gap_s = 120
    src = str(tmp_path / "ev_in")
    ckpt = str(tmp_path / "_ck")
    schema = spark.createDataFrame([], "user_id long, ts timestamp").schema

    def write_file(rows):
        spark.createDataFrame(
            [(u, base + dt.timedelta(seconds=s)) for u, s in rows], schema
        ).coalesce(1).write.mode("append").parquet(src)

    wave1 = {
        1: [0, 60, 1000, 1060],  # two sessions
        2: [10, 50, 90],         # one session
        3: [500],                # one session, will continue in wave 2
    }
    for u, times in wave1.items():
        write_file([(u, s) for s in times])

    crashing = _CrashingCatalog(
        spark, str(tmp_path / "wh"), crash_on=2, when="after"
    )
    with pytest.raises(Exception, match="injected crash"):
        sessionize_stateful_to_table(
            spark, src, schema=schema, checkpoint_dir=ckpt,
            catalog=crashing, target_identifier="s.sessions",
            gap=f"{gap_s} seconds", max_files_per_trigger=1,
        )
    clean = Catalog(spark, str(tmp_path / "wh"))
    assert clean.table("s.sessions").read().count() > 0  # partial landed

    # restart drain 1: replays the crashed batch, finishes the backlog
    assert sessionize_stateful_to_table(
        spark, src, schema=schema, checkpoint_dir=ckpt,
        catalog=clean, target_identifier="s.sessions",
        gap=f"{gap_s} seconds", max_files_per_trigger=1,
    )

    # wave 2: user 3 CONTINUES its open session (560 - 500 < gap); user 1
    # continues (1100) then opens a new one (3000); user 2 idles.
    write_file([(3, 560), (1, 1100), (1, 3000)])
    assert sessionize_stateful_to_table(
        spark, src, schema=schema, checkpoint_dir=ckpt,
        catalog=clean, target_identifier="s.sessions",
        gap=f"{gap_s} seconds", max_files_per_trigger=1,
    )

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.closed)
        for r in clean.table("s.sessions").read().collect()
    }
    # oracle: batch sessionize over ALL events; closed=False only on each
    # user's last session
    all_rows = [(u, s) for u, ts in wave1.items() for s in ts] + [
        (3, 560), (1, 1100), (1, 3000),
    ]
    events = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s)) for u, s in all_rows], schema
    )
    batch = sessionize(events, ts_col="ts", order_tiebreak="ts", gap=f"{gap_s} seconds")
    from pyspark.sql import Window as W

    last = F.max("session_start").over(W.partitionBy("user_id"))
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.closed)
        for r in batch.withColumn("closed", F.col("session_start") != last)
        .select("user_id", "session_start", "session_end", "n_events", "closed")
        .collect()
    }
    assert got == want


def test_streaming_minhash_dedup_survives_worst_case_crash(
    spark, sf_dir, tmp_path
):
    """Minhash sibling of the exact-dedup crash test: a micro-batch's
    index append lands, the process dies before the labels merge and
    checkpoint commit. The replayed batch's docs collide with their own
    index rows in every band (identical signatures, est 1.0) and report
    already_ingested — the index stays single-absorbed."""
    from etl_to_iceberg_spark.streaming.ingest import (
        stream_incremental_minhash_dedup,
    )

    src_dir = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "_ckpt")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 120)
    )
    n_files = 4
    for i in range(n_files):
        docs.where(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    # each micro-batch = 1 index append + 1 labels merge; die right after
    # batch 2's index append
    crashing = _CrashingCatalog(
        spark, str(tmp_path / "wh"), crash_on=3, when="after"
    )
    with pytest.raises(Exception, match="injected crash"):
        stream_incremental_minhash_dedup(
            spark, src_dir, fmt="parquet", schema=docs.schema,
            checkpoint_dir=ckpt, catalog=crashing,
            index_identifier="mh.idx", labels_identifier="mh.labels",
            max_files_per_trigger=1,
        )
    clean = Catalog(spark, str(tmp_path / "wh"))
    assert clean.table("mh.idx").read().count() > 0

    stream_incremental_minhash_dedup(
        spark, src_dir, fmt="parquet", schema=docs.schema,
        checkpoint_dir=ckpt, catalog=clean,
        index_identifier="mh.idx", labels_identifier="mh.labels",
        max_files_per_trigger=1,
    )
    index = clean.table("mh.idx").read().cache()
    labels = clean.table("mh.labels").read().cache()
    n_docs = docs.count()
    # every doc labeled exactly once; index = exactly the is_new docs,
    # absorbed once each (no double-append through the crash/replay)
    assert labels.count() == n_docs
    assert labels.select("doc_id").distinct().count() == n_docs
    news = labels.where("is_new OR already_ingested").select("doc_id")
    assert index.count() == news.count()
    assert index.select("doc_id").distinct().count() == index.count()
    assert news.exceptAll(index.select("doc_id")).count() == 0
    index.unpersist(); labels.unpersist()
