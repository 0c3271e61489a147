"""Table maintenance services: compaction, snapshot expiry, rollback,
cherry-pick, snapshot listing.

Completes the reference's maintenance operator suite (SURVEY.md §2.9) —
including the four actions it stubs
(``iceberg_snapshot_operator.py:158-187`` rollback/cherry-pick "requires
Spark", ``iceberg_compaction_operator.py:138-169`` PyIceberg-path no-op).
With the Iceberg jar these map to ``CALL catalog.system.rewrite_data_files
/ expire_snapshots / rollback_to_snapshot / cherrypick_snapshot``; here
they operate on the built-in snapshot format with identical semantics.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, functions as F

from etl_to_iceberg_spark.tables.format import FileEntry, IceTable, Snapshot


def snapshot_list(table: IceTable) -> DataFrame:
    """Snapshot history as a DataFrame (ref: maint_snapshot_list,
    ``iceberg_snapshot_operator.py:130-156`` — a Python parent-pointer walk;
    here it is just the table's metadata relation, like Iceberg's
    ``t.snapshots``)."""
    rows = [
        (
            s.version,
            s.parent,
            s.timestamp_ms,
            s.operation,
            len(s.files),
            s.total_rows,
        )
        for s in table.snapshots()
    ]
    return table.spark.createDataFrame(
        rows,
        "version int, parent int, timestamp_ms long, operation string, "
        "n_files int, total_rows long",
    )


def current_snapshot_info(table: IceTable) -> DataFrame:
    """'Create snapshot' semantics — snapshots happen on write; report the
    current one (ref: maint_snapshot_create, iceberg_snapshot_operator.py:117-128)."""
    s = table.snapshot()
    return table.spark.createDataFrame(
        [(s.version, s.operation, len(s.files), s.total_rows)],
        "version int, operation string, n_files int, total_rows long",
    )


def compact(
    table: IceTable,
    *,
    target_file_size_mb: int = 512,
    strategy: str = "binpack",
) -> Snapshot:
    """Small-file compaction (ref: maint_compact — ``CALL
    rewrite_data_files(strategy=>'binpack', target-file-size-mb=>512)``,
    ``iceberg_compaction_operator.py:110-136``).

    Binpack: compute the target file count from current total bytes and
    rewrite with that many output files per partition. At scale this runs
    as one distributed job; the 512 MB default matches the reference.
    """
    if strategy != "binpack":
        raise ValueError(f"unknown compaction strategy {strategy!r}")
    snap = table.snapshot()
    total_bytes = sum(
        os.path.getsize(fe.path) for fe in snap.files if os.path.exists(fe.path)
    )
    target_bytes = target_file_size_mb * 1024 * 1024
    n_files = max(1, -(-total_bytes // target_bytes))  # ceil
    df = table.read()
    spec = snap.partition_by
    version = table._next_version()
    if spec:
        # One shuffle keyed by partition columns so each output partition
        # directory gets coherent, full-size files.
        df = df.repartition(int(n_files), *[F.col(c) for c in spec])
    else:
        df = df.repartition(int(n_files))
    files = table._write_data(df, version, spec)
    return table._commit(
        "replace",
        files,
        table.schema(),
        spec,
        summary={
            "strategy": strategy,
            "target_file_size_mb": target_file_size_mb,
            "files_before": len(snap.files),
            "files_after": len(files),
        },
    )


def expire_snapshots(
    table: IceTable,
    *,
    older_than_ms: int | None = None,
    older_than_days: float = 7.0,
    retain_last: int = 10,
    now_ms: int | None = None,
) -> dict:
    """Snapshot aging + orphan-file GC (ref: maint_expire_snapshots —
    ``CALL expire_snapshots(older_than=>now-7d, retain_last=>10)``,
    ``iceberg_aging_operator.py:118-146``; defaults match :62-63).

    Never expires the current snapshot. Data files referenced by no
    surviving snapshot are deleted.
    """
    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    horizon = (
        older_than_ms
        if older_than_ms is not None
        else now_ms - int(older_than_days * 86400_000)
    )
    snaps = table.snapshots()
    current = table.current_version()
    keep_tail = {s.version for s in snaps[-retain_last:]} if retain_last > 0 else set()
    expired = [
        s
        for s in snaps
        if s.version != current and s.version not in keep_tail and s.timestamp_ms < horizon
    ]
    surviving = [s for s in snaps if s not in expired]
    live_files = {fe.path for s in surviving for fe in s.files}
    removed_files = 0
    for s in expired:
        for fe in s.files:
            if fe.path not in live_files and os.path.exists(fe.path):
                os.remove(fe.path)
                removed_files += 1
        os.remove(os.path.join(table.meta_dir, f"snap-{s.version}.json"))
    return {
        "expired_snapshots": len(expired),
        "removed_data_files": removed_files,
        "surviving_snapshots": len(surviving),
    }


def rollback(table: IceTable, version: int) -> Snapshot:
    """Roll the table back to an earlier snapshot (ref: maint_rollback —
    stubbed at ``iceberg_snapshot_operator.py:158-173``; real semantics =
    ``CALL rollback_to_snapshot``). Implemented as a NEW snapshot that
    references the old file set, so the rollback itself is in history."""
    old = table.snapshot(version)
    return table._commit(
        "rollback",
        list(old.files),
        table.schema(),
        old.partition_by,
        summary={"rolled_back_to": version},
    )


def cherrypick(table: IceTable, version: int) -> Snapshot:
    """Apply the file additions of an (append/merge) snapshot onto the
    current state (ref: maint_cherrypick — stubbed at
    ``iceberg_snapshot_operator.py:175-187``)."""
    picked = table.snapshot(version)
    if picked.parent is None:
        added = list(picked.files)
    else:
        parent_files = {fe.path for fe in table.snapshot(picked.parent).files}
        added = [fe for fe in picked.files if fe.path not in parent_files]
    cur = table.snapshot()
    cur_paths = {fe.path for fe in cur.files}
    new = [fe for fe in added if fe.path not in cur_paths]
    return table._commit(
        "cherrypick",
        cur.files + new,
        table.schema(),
        cur.partition_by,
        summary={"cherrypicked": version, "files_added": len(new)},
    )
