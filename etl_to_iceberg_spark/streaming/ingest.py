"""Structured Streaming file ingestion.

The reference's file-CDC operator
(``/root/reference/airflow-plugins/hdfs_to_iceberg/hdfs_to_iceberg_cdc_operator.py``)
re-implements, by hand, exactly what Spark's streaming file source already
does: new-file detection (mtime/size cursors, ``:169-241``), per-partition
checkpoints in Airflow XCom (``:291-313``), and at-least-once reprocessing.
Here the whole surface is ``readStream`` + ``Trigger.AvailableNow`` + a
checkpoint directory:

- new/changed-file detection → the file source's own file index;
- checkpoint JSON in XCom → the checkpoint location (exactly-once file
  tracking, replay-safe);
- scheduled 5-minute DAG cadence → either re-running AvailableNow (batch
  drain, the reference's model) or a continuous trigger;
- late/duplicate handling (absent in the reference, SURVEY §2.8
  ``late_data_note``) → watermark + dropDuplicates / MERGE on key.

``foreachBatch`` writes each micro-batch through the managed-table layer so
streaming gets the same append/merge semantics as batch.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from etl_to_iceberg_spark.tables import Catalog


def await_drain(q: StreamingQuery, timeout_sec: float, *, label: str = "") -> bool:
    """Await an AvailableNow drain; on timeout, stop the straggler and warn.

    Stopping is mandatory: a still-active query would collide with the next
    drain on the same checkpoint instead of letting it resume. The warning
    makes a PARTIAL drain observable (ADVICE r6) — downstream tables hold
    only the committed micro-batch prefix, which is otherwise
    indistinguishable from a complete drain. Returns the finished flag so
    callers that need a hard guarantee can raise on False."""
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        warnings.warn(
            f"streaming drain {label or q.id} timed out after {timeout_sec}s"
            " and was stopped with batches pending; downstream tables hold"
            " only the committed micro-batch prefix",
            RuntimeWarning,
            stacklevel=2,
        )
    return finished


def stream_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    schema=None,
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming scan of a directory (file source). ``schema`` is required
    by streaming sources; pass the target table's schema or a DDL string."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    *,
    fmt: str,
    schema,
    checkpoint_dir: str,
    catalog: Catalog,
    target_identifier: str,
    mode: str = "append",
    primary_key: list[str] | None = None,
    dedup_order_by: list[str] | None = None,
    watermark: tuple[str, str] | None = None,
    dedup_keys: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    timeout_sec: float = 300.0,
) -> StreamingQuery:
    """Drain all currently-available new files into a managed table.

    One call == one reference CDC tick (``execute`` at :243-319), but the
    file bookkeeping lives in ``checkpoint_dir``: a second call processes
    ONLY files that appeared since the first — the ``cdc_file_mtime`` /
    ``cdc_file_size`` semantics with exactly-once tracking.

    ``watermark=("ts", "10 minutes")`` + ``dedup_keys`` adds bounded-state
    late-duplicate dropping (the capability gap noted in SURVEY §2.8).
    ``mode='upsert'`` MERGEs each micro-batch by ``primary_key`` — replays
    after failure are idempotent.

    ``max_files_per_trigger`` bounds each micro-batch (AvailableNow drains
    the backlog in several batches instead of one) — the backfill-sizing
    knob for a 100 TB catch-up, and what makes a mid-drain crash recover
    from the last committed batch rather than restarting the whole drain.
    """
    df = stream_files(
        spark, source_dir, fmt, schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )
    if watermark is not None:
        df = df.withWatermark(*watermark)
        if dedup_keys:
            df = df.dropDuplicatesWithinWatermark(dedup_keys)
    elif dedup_keys:
        df = df.dropDuplicates(dedup_keys)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = catalog.table(target_identifier)
        if mode == "append":
            target.append(batch_df)
        elif mode == "upsert":
            if not primary_key:
                raise ValueError("mode='upsert' requires primary_key")
            target.merge(batch_df, keys=primary_key, dedup_order_by=dedup_order_by)
        else:
            raise ValueError(f"unknown mode {mode!r}")

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, timeout_sec, label=f"ingest:{target_identifier}")
    return q


def stream_incremental_dedup(
    spark: SparkSession,
    source_dir: str,
    *,
    fmt: str,
    schema,
    checkpoint_dir: str,
    catalog: Catalog,
    index_identifier: str,
    labels_identifier: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
    timeout_sec: float = 300.0,
) -> StreamingQuery:
    """Streaming corpus ingestion with DURABLE exact-dedup state.

    Each micro-batch runs ext/incremental.py's exact tick against the
    persisted fingerprint index: novel docs' (doc_id, fingerprint) rows
    append to ``index_identifier``; the full labeling (dup_of / is_new /
    already_ingested) upserts into ``labels_identifier`` keyed by doc_id
    when given. This is the steady-state 100 TB ingest shape: dedup
    state lives in a table that survives restarts and is shared across
    streams/backfills, not in stream operator state (contrast
    ``dropDuplicatesWithinWatermark``, whose key state is bounded by the
    watermark and private to one query).

    Crash/replay safety needs NO transactional coupling between the
    stream checkpoint and the table commits: foreachBatch is
    at-least-once, and a re-delivered batch re-ticks against an index
    that already absorbed it — every previously-new doc matches its own
    index row, reports ``already_ingested``, and the index append is
    empty; the labels write is an idempotent keyed MERGE. Killed
    mid-drain, a restart resumes from the last committed micro-batch
    with the index intact (tests/test_fault_injection.py).
    """
    from etl_to_iceberg_spark.ext.incremental import incremental_exact_tick

    df = stream_files(
        spark, source_dir, fmt, schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )

    def tick(batch_df: DataFrame, batch_id: int) -> None:
        index = catalog.table(index_identifier)
        idx_df = (
            index.read()
            if index.exists()
            else spark.createDataFrame([], "doc_id long, fingerprint string")
        )
        labeled = incremental_exact_tick(
            idx_df, batch_df, id_col=id_col, text_col=text_col
        )
        # The tick plan is consumed twice (index append + labels merge);
        # it is batch-sized, so materialize once.
        labeled = labeled.cache()
        index.append(labeled.where("is_new").select("doc_id", "fingerprint"))
        if labels_identifier is not None:
            catalog.table(labels_identifier).merge(labeled, keys=["doc_id"])
        labeled.unpersist()

    q = (
        df.writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, timeout_sec, label=f"dedup:{index_identifier}")
    return q


def stream_incremental_minhash_dedup(
    spark: SparkSession,
    source_dir: str,
    *,
    fmt: str,
    schema,
    checkpoint_dir: str,
    catalog: Catalog,
    index_identifier: str,
    labels_identifier: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 32,
    shingle_n: int = 3,
    bands: int = 8,
    max_files_per_trigger: int | None = None,
    timeout_sec: float = 300.0,
) -> StreamingQuery:
    """Streaming corpus ingestion with durable NEAR-dup (minhash) state —
    the near-duplicate sibling of :func:`stream_incremental_dedup`.

    Each micro-batch runs ext/incremental.py's minhash tick against the
    persisted (doc_id, sig, band_hashes) index: novel docs' rows append
    to ``index_identifier``; the labeling (dup_of / est_jaccard / is_new /
    already_ingested) MERGEs into ``labels_identifier`` keyed by doc_id.
    Corpus text is sketched exactly once, in the micro-batch that ingests
    it — later batches band-join the ~300 B/doc index, never the text.

    Replay safety matches the exact wrapper: a re-delivered batch's docs
    collide with their OWN index rows in every band (identical
    signatures, est 1.0), report ``already_ingested``, and the index
    append is empty — at-least-once foreachBatch + idempotent keyed MERGE
    = exactly-once effect with no checkpoint/commit coupling.

    Cache discipline: the tick's internal frames (checkpointed batch
    sketch + cached candidate set) are released after each micro-batch
    materializes — the long-lived-caller contract in
    incremental_minhash_tick's docstring, via caching.release_frame
    (plain unpersist cannot reach the checkpoint's blocks) — so an
    unbounded stream's block-store footprint stays one batch's worth."""
    from etl_to_iceberg_spark.caching import release_frame
    from etl_to_iceberg_spark.ext.incremental import incremental_minhash_tick

    df = stream_files(
        spark, source_dir, fmt, schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )
    empty_schema = "doc_id long, sig array<bigint>, band_hashes array<bigint>"

    def tick(batch_df: DataFrame, batch_id: int) -> None:
        index = catalog.table(index_identifier)
        idx_df = (
            index.read()
            if index.exists()
            else spark.createDataFrame([], empty_schema)
        )
        caches: list[DataFrame] = []
        labeled = incremental_minhash_tick(
            idx_df, batch_df, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_n=shingle_n, bands=bands,
            threshold=threshold, caches=caches,
        ).cache()
        caches.append(labeled)
        try:
            # append the novel docs' index rows from the tick's CACHED
            # batch sketch (caches[0]) — no second signature fold
            index.append(
                caches[0]
                .select("doc_id", "sig", "band_hashes")
                .join(
                    labeled.where("is_new").select("doc_id"),
                    on="doc_id",
                    how="left_semi",
                )
            )
            if labels_identifier is not None:
                catalog.table(labels_identifier).merge(labeled, keys=["doc_id"])
        finally:
            for c in caches:
                release_frame(c)  # exception-safe, handles cache + ckpt

    q = (
        df.writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, timeout_sec, label=f"minhash-dedup:{index_identifier}")
    return q
