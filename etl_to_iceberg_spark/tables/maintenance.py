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
    version = table._next_version()  # before state read: pin the commit
    snap = table.snapshot()
    total_bytes = sum(
        os.path.getsize(fe.path) for fe in snap.files if os.path.exists(fe.path)
    )
    target_bytes = target_file_size_mb * 1024 * 1024
    n_files = max(1, -(-total_bytes // target_bytes))  # ceil
    df = table.read()
    spec = snap.partition_by
    if spec:
        # One shuffle keyed by partition columns so each output partition
        # directory gets coherent, full-size files.
        df = df.repartition(int(n_files), *[F.col(c) for c in spec])
    else:
        df = df.repartition(int(n_files))
    files = table._write_data(df, version, spec, sized=False)
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
            # table.read() applied any MOR tombstones, so this rewrite
            # materialized them; the commit (deliberately) clears them.
            "tombstones_materialized": len(snap.tombstones),
        },
        version=version, on_conflict_cleanup=table._bases(files),
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
    surviving snapshot are deleted — but ONLY files under this table's own
    location: a shallow-cloned table's manifests reference the source
    warehouse's data files by absolute path, and expiring snapshots on the
    clone must not reach into the shared source (the same ownership rule
    ``remove_orphan_files`` applies). Externally-owned unreferenced files
    are dropped from metadata and reported, not deleted.
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
    # realpath on BOTH sides: a warehouse reached via a symlinked path must
    # still classify its own files as owned, or GC silently never deletes.
    owned_root = os.path.realpath(table.location) + os.sep
    removed_files = 0
    skipped_external = 0
    for s in expired:
        for fe in s.files:
            if fe.path in live_files:
                continue
            if not os.path.realpath(fe.path).startswith(owned_root):
                skipped_external += 1
                continue
            if os.path.exists(fe.path):
                os.remove(fe.path)
                removed_files += 1
        os.remove(os.path.join(table.meta_dir, f"snap-{s.version}.json"))
    return {
        "expired_snapshots": len(expired),
        "removed_data_files": removed_files,
        "surviving_snapshots": len(surviving),
        "skipped_external_files": skipped_external,
    }


def partition_stats(table: IceTable) -> DataFrame:
    """Per-partition (files, rows) from the CURRENT snapshot's manifest —
    Iceberg's ``partitions`` metadata table. Row counts come from the
    parquet footers captured at commit time, so this never scans data:
    planning a backfill or spotting a skewed partition on a 100 TB table
    costs a manifest read. Partition values are the path-encoded strings
    (Hive layout), exactly as Iceberg reports identity-transform values."""
    snap = table.snapshot()
    spec = snap.partition_by
    agg: dict[tuple, list[int]] = {}
    for fe in snap.files:
        rel = os.path.relpath(fe.path, fe.base)
        vals = dict(
            seg.split("=", 1) for seg in rel.split(os.sep)[:-1] if "=" in seg
        )
        key = tuple(vals.get(c) for c in spec)
        a = agg.setdefault(key, [0, 0])
        a[0] += 1
        a[1] += fe.rows or 0
    rows = [(*k, n, r) for k, (n, r) in sorted(agg.items())]
    schema = ", ".join(
        [f"`{c}` string" for c in spec] + ["file_count long", "row_count long"]
    )
    return table.spark.createDataFrame(rows, schema)


def remove_orphan_files(table: IceTable, *, dry_run: bool = False) -> DataFrame:
    """Orphan-file cleanup (Iceberg's ``CALL remove_orphan_files``): delete
    data files sitting under the table's data directory that no snapshot —
    current or historical — references. Orphans come from writer crashes
    between data write and metadata commit; at 100 TB they silently leak
    storage forever unless swept.

    Scans the filesystem listing against the manifest union — both are
    metadata-sized (file PATHS, not file contents), so this is driver-side
    metadata work exactly like Iceberg's own action. Returns one row per
    orphan (path, removed) so the sweep is auditable."""
    import glob as _glob

    # realpath membership: manifests may record the path through a symlink
    # while the filesystem walk sees the resolved one (or vice versa) — a
    # mismatch would classify referenced files as orphans and delete them.
    referenced = {
        os.path.realpath(fe.path) for s in table.snapshots() for fe in s.files
    }
    data_dir = os.path.join(table.location, "data")
    on_disk = [
        os.path.realpath(p)
        for p in _glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    ]
    orphans = sorted(p for p in on_disk if p not in referenced)
    if not dry_run:
        for p in orphans:
            os.remove(p)
    return table.spark.createDataFrame(
        [(p, not dry_run) for p in orphans] or [],
        "path string, removed boolean",
    )


def rollback(table: IceTable, version: int) -> Snapshot:
    """Roll the table back to an earlier snapshot (ref: maint_rollback —
    stubbed at ``iceberg_snapshot_operator.py:158-173``; real semantics =
    ``CALL rollback_to_snapshot``). Implemented as a NEW snapshot that
    references the old file set, so the rollback itself is in history."""
    new_version = table._next_version()  # pin: serialize vs rival commits
    old = table.snapshot(version)
    return table._commit(
        "rollback",
        list(old.files),
        table.schema(),
        old.partition_by,
        summary={"rolled_back_to": version},
        tombstones=list(old.tombstones),  # restore that snapshot's MOR state too
        version=new_version,
    )


def cherrypick(table: IceTable, version: int) -> Snapshot:
    """Apply the file additions of an APPEND snapshot onto the current
    state (ref: maint_cherrypick — stubbed at
    ``iceberg_snapshot_operator.py:175-187``).

    Only append/create snapshots are eligible — the same restriction as
    Iceberg's ``cherrypick_snapshot``: a merge/overwrite/replace
    snapshot's new files contain REWRITTEN carried rows, so re-applying
    them onto a state that still holds the original files would
    duplicate those rows."""
    new_version = table._next_version()  # pin: serialize vs rival commits
    picked = table.snapshot(version)
    if picked.operation not in ("append", "create"):
        raise ValueError(
            f"cannot cherry-pick snapshot {version} ({picked.operation!r}): "
            "its files carry rewritten rows, not pure additions — only "
            "append/create snapshots are cherry-pickable"
        )
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
        tombstones=cur.tombstones,  # current MOR deletes stay in force
        version=new_version,
    )


def zvalue_n(cols: list[F.Column], bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of N non-negative ints' low ``bits``
    (bit i of column j lands at position i*N + j; N*bits must fit a long).

    Pure bitwise column expression (whole-stage codegen) — rows close in
    EVERY dimension get close z-values, so a z-sorted rewrite gives each
    file a tight min/max envelope on all clustered columns at once and
    min/max pruning serves predicates on any of them."""
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue_n interleaves at least 2 columns")
    if n * bits > 63:
        raise ValueError(f"{n} columns x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    cs = [c.cast("long") for c in cols]
    for i in range(bits):
        for j, c in enumerate(cs):
            # bit value (1 << i) relocated to position i*n + j
            z = z.bitwiseOR(c.bitwiseAND(F.lit(1 << i)) * (1 << (i * (n - 1) + j)))
    return z


def zvalue(a: F.Column, b: F.Column, bits: int = 16) -> F.Column:
    """Two-column Morton interleave (see :func:`zvalue_n`)."""
    return zvalue_n([a, b], bits=bits)


def cluster_zorder(
    table: IceTable,
    columns: list[str],
    *,
    target_file_size_mb: int = 512,
    bits: int | None = None,
    n_files: int | None = None,
) -> Snapshot:
    """Z-order clustering rewrite — the sort-strategy half of Iceberg's
    ``rewrite_data_files(strategy=>'sort', sort_order=>'zorder(a,b)')``
    that the reference's compaction operator leaves to binpack only
    (``iceberg_compaction_operator.py:110-136``).

    Content is byte-identical to the input (a pure rewrite — the checked
    query's oracle is the unclustered source); only the file layout
    changes: rows are range-partitioned and sorted by their interleaved-bit
    z-value, so each output file covers a tight rectangle in
    (columns[0], columns[1]) space and min/max pruning serves predicates
    on EITHER column. Scale shape: a 1-row min/max agg broadcast for
    normalization, then one repartitionByRange shuffle keyed by a
    codegen'd long — the same cost class as binpack compaction, with
    data-skipping payback on every subsequent scan.

    Each column is min/max-normalized to the ``bits``-wide domain before
    interleaving — raw interleaving of differently-scaled columns (e.g.
    a 0..150 key against a 0..2500-day range) degenerates to a sort on
    the wider column because its high bits dominate every split. Any
    number of columns >= 2 works (``bits`` defaults to the widest per-
    column precision that still fits a long: min(16, 63 // N))."""
    if len(columns) < 2:
        raise ValueError("zorder clustering takes at least 2 columns")
    if bits is None:
        bits = min(16, 63 // len(columns))
    version = table._next_version()  # before state read: pin the commit
    snap = table.snapshot()
    if n_files is None:
        total_bytes = sum(
            os.path.getsize(fe.path) for fe in snap.files if os.path.exists(fe.path)
        )
        n_files = max(1, -(-total_bytes // (target_file_size_mb * 1024 * 1024)))
    df = table.read()
    cols = [F.col(c).cast("double") for c in columns]
    bounds = df.agg(
        *[
            x
            for i, c in enumerate(cols)
            for x in (F.min(c).alias(f"__min{i}"), F.max(c).alias(f"__max{i}"))
        ]
    )
    top = (1 << bits) - 1

    def norm(col, lo, hi):
        span = F.col(hi) - F.col(lo)
        return F.when(span > 0, ((col - F.col(lo)) * top / span))\
            .otherwise(F.lit(0)).cast("long")

    z = zvalue_n(
        [norm(c, f"__min{i}", f"__max{i}") for i, c in enumerate(cols)],
        bits=bits,
    ).alias("__z")
    clustered = (
        df.crossJoin(F.broadcast(bounds))
        .select(*[F.col(c) for c in df.columns], z)
        .repartitionByRange(int(n_files), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    files = table._write_data(clustered, version, snap.partition_by, sized=False)
    return table._commit(
        "replace",
        files,
        table.schema(),
        snap.partition_by,
        summary={
            "strategy": "zorder",
            "columns": columns,
            "files_before": len(snap.files),
            "files_after": len(files),
        },
        version=version, on_conflict_cleanup=table._bases(files),
    )
