"""Cache-discipline contract (SCALING.md watchpoint 6): scoped caches
release on exit, lazily-returned operator caches release via the
registry — a long-running service's storage memory is reclaimable
without spark.catalog.clearCache()."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_to_iceberg_spark import caching
from etl_to_iceberg_spark.caching import (
    cached,
    release_operator_caches,
    tracked_cache,
)


def test_cached_scopes_the_cache(spark):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    with cached(df) as d:
        d.count()
        assert d.storageLevel.useMemory
    assert not df.storageLevel.useMemory


def test_cached_releases_on_exception(spark):
    df = spark.range(10)
    try:
        with cached(df):
            df.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not df.storageLevel.useMemory


def test_tracked_cache_release_drains_registry(spark):
    a = tracked_cache(spark.range(50))
    b = tracked_cache(spark.range(60))
    a.count(), b.count()
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    released = release_operator_caches()
    assert released >= 2
    assert not caching._tracked
    assert not a.storageLevel.useMemory and not b.storageLevel.useMemory
    assert release_operator_caches() == 0  # idempotent


def test_service_loop_storage_returns_to_baseline(spark, sf_dir):
    """The realistic long-running-service shape (VERDICT r8 #8): several
    tracked-cache operators back-to-back in ONE session, then a release
    between "requests" — storage must return to its pre-loop baseline,
    probed from the JVM's persistent-RDD registry (not our own
    bookkeeping), so a leak in ANY operator's cache discipline fails
    here even if it is registered nowhere."""
    from etl_to_iceberg_spark.ext.dedup import (
        minhash_near_duplicates,
        simhash_near_duplicates,
    )
    from etl_to_iceberg_spark.ext.queries import dedup_simhash
    from etl_to_iceberg_spark.sources.tables import load_table

    def persistent_rdds() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    release_operator_caches()
    spark.catalog.clearCache()
    baseline = persistent_rdds()

    for _ in range(3):  # three service "requests" in one session
        docs = load_table(spark, sf_dir, "documents").limit(100)
        simhash_near_duplicates(docs).count()
        minhash_near_duplicates(docs, threshold=0.6).count()
        dedup_simhash(spark, sf_dir).count()  # registry-level entry point
        assert persistent_rdds() > baseline  # caches were actually taken
        released = release_operator_caches()
        assert released >= 2
        # <= not ==: the count can dip BELOW baseline when localCheckpoint
        # RDDs leaked by earlier tests in the shared session (ticks called
        # without a `caches` list) are garbage-collected by the
        # ContextCleaner mid-loop; the leak property under test is
        # NO GROWTH past baseline.
        assert persistent_rdds() <= baseline, (
            "storage memory did not return to baseline after "
            "release_operator_caches — an operator cache escaped tracking"
        )


def test_operator_caches_are_tracked(spark, sf_dir):
    """The dedup operators' internal caches (LSH candidate pairs + the
    verify shingle sets) register for release — the VERDICT r7 #8 sites.
    (The simhash collapsed relation is no longer cached at all: r18
    replaced the windowed collapse with a groupBy whose exchange is
    plan-level reused, so simhash contributes zero tracked frames.)"""
    from etl_to_iceberg_spark.ext.dedup import (
        minhash_near_duplicates,
        simhash_near_duplicates,
    )
    from etl_to_iceberg_spark.sources.tables import load_table

    release_operator_caches()  # clean slate
    docs = load_table(spark, sf_dir, "documents").limit(100)
    simhash_near_duplicates(docs).count()
    minhash_near_duplicates(docs, threshold=0.6).count()
    assert len(caching._tracked) >= 2
    assert release_operator_caches() >= 2


def test_release_frame_drops_cache_and_local_checkpoint(spark):
    """release_frame must free BOTH persistence shapes the minhash tick
    hands back through `caches`: a plain .cache() (unpersist path) and
    an eager localCheckpoint, whose blocks belong to the checkpointed
    RDD inside the LogicalRDD leaf — invisible to DataFrame.unpersist,
    so a naive caller leaks one RDD per tick until GC."""
    from etl_to_iceberg_spark.caching import release_frame

    cdf = spark.range(100).selectExpr("id", "id * 2 AS y").cache()
    cdf.count()
    ck = spark.range(100).selectExpr("id * 3 AS z").localCheckpoint(eager=True)
    ck_rdd = ck._jdf.queryExecution().analyzed().rdd()

    def live(lvl) -> bool:
        return lvl.useMemory() or lvl.useDisk()

    assert cdf.storageLevel.useMemory
    assert live(ck_rdd.getStorageLevel())
    ck.unpersist(blocking=True)  # the plain call a checkpoint survives
    assert live(ck_rdd.getStorageLevel())
    release_frame(cdf)
    release_frame(ck)
    assert not cdf.storageLevel.useMemory
    assert not live(ck_rdd.getStorageLevel())


def test_release_frame_spares_externally_persisted_rdds(spark):
    """release_frame's RDD-unpersist is scoped to RDDs localCheckpoint
    actually produced (ADVICE r17): a frame whose LogicalRDD wraps an
    EXTERNALLY persisted shared RDD (createDataFrame over a cached RDD)
    must keep its blocks — other consumers own them."""
    from etl_to_iceberg_spark.caching import release_frame

    base = spark.sparkContext.parallelize([(1,), (2,), (3,)]).persist()
    df = spark.createDataFrame(base, "a int")
    df.count()
    assert base.getStorageLevel().useMemory
    release_frame(df)
    assert base.getStorageLevel().useMemory, (
        "release_frame dropped a shared RDD's blocks out from under "
        "other consumers"
    )
    base.unpersist()
