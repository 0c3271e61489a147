"""Snapshot-log managed tables over Parquet ("icetable").

The reference's sink is Apache Iceberg (append / overwrite / promised
upsert / snapshots / compaction / expiry — SURVEY.md §2.1, §2.9). With the
Iceberg runtime jar on the classpath the engine uses the real thing via the
``ice`` catalog configured in :mod:`etl_to_iceberg_spark.session`; this
module provides the same table semantics Spark-natively, so the engine is
complete in jar-less environments and its MERGE/maintenance logic is
testable hermetically.

Design (a deliberately small subset of the Iceberg spec):

- A table is a directory: ``warehouse/<namespace>/<table>/``

  - ``_meta/snap-<version>.json`` — one manifest per committed snapshot:
    operation, parent version, wall-clock ms, schema JSON, partition
    columns, and the FULL list of data files (path + basePath + row count).
  - ``_meta/version-hint.txt`` — current version, updated by atomic rename.
    Concurrent writers are handled optimistically: the per-version manifest
    is created exclusively, so a racing commit raises
    :class:`CommitConflictError` for retry instead of silently winning the
    pointer flip (the same protocol Iceberg's catalog provides).
  - ``data/v<version>-<token>/`` — files written BY that commit (possibly
    Hive-partitioned below); the random token makes each write attempt's
    dir private, so two writers racing for the same version never share a
    Hadoop ``_temporary`` committer dir. Commits never touch other
    commits' files, so every snapshot is immutable and time travel is
    just reading an older manifest. A conflict loser's dir is removed on
    conflict (or swept later as an orphan).

- Reads reconstruct a snapshot by grouping its file entries by basePath
  (needed for partition-column recovery) and unioning the per-group scans.
  Filters and projections push through the union into every scan, so
  partition pruning works exactly as on a plain parquet table.

- MERGE (and DELETE) are copy-on-write with FILE-LEVEL PRUNING: only data
  files that actually contain affected keys are rewritten; untouched files
  carry over to the new snapshot by reference. At 100 TB this is the
  difference between rewriting a few GB and rewriting the lake — same
  strategy as Iceberg's copy-on-write MERGE.

Reference parity notes: the reference stubs real upsert
(``oracle_to_iceberg_cdc_operator.py:211-221`` overwrites the whole table;
``hdfs_to_iceberg_cdc_operator.py:361-367`` has the MERGE TODO) and stubs
rollback/cherry-pick (``iceberg_snapshot_operator.py:158-187``). Here all
of them are implemented; the documented semantics are the spec.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from etl_to_iceberg_spark.caching import cached

_META = "_meta"
_HINT = "version-hint.txt"


class CommitConflictError(RuntimeError):
    """A concurrent writer committed the same version first. Re-read the
    table and retry (Iceberg optimistic-commit semantics)."""


def _strip_nullability(dt: T.DataType) -> T.DataType:
    """Type with every nullable/containsNull/valueContainsNull flag (and
    struct field casing) normalized away — the shape two batches must
    share for their columns to be the same column."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name.lower(), _strip_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_nullability(dt.keyType), _strip_nullability(dt.valueType), True
        )
    return dt


def _widen_nullability(a: T.DataType, b: T.DataType) -> T.DataType:
    """Union of two same-shaped types' nullability flags: the stored
    schema must admit every batch already written under either."""
    if isinstance(a, T.StructType):
        by_name = {f.name.lower(): f for f in b.fields}
        return T.StructType(
            [
                T.StructField(
                    f.name,
                    _widen_nullability(f.dataType, by_name[f.name.lower()].dataType),
                    f.nullable or by_name[f.name.lower()].nullable,
                )
                for f in a.fields
            ]
        )
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(
            _widen_nullability(a.elementType, b.elementType),
            a.containsNull or b.containsNull,
        )
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return T.MapType(
            _widen_nullability(a.keyType, b.keyType),
            _widen_nullability(a.valueType, b.valueType),
            a.valueContainsNull or b.valueContainsNull,
        )
    return a


def _evolve_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union-of-columns schema evolution (Iceberg add-column semantics):
    columns new to the incoming batch are appended as nullable; a name
    reappearing with a different type is rejected — implicit type
    coercion on write silently corrupts downstream readers at scale.
    Nullability is NOT a type: a column re-appearing as `array<long>`
    with containsNull flipped (e.g. an empty seed batch vs a computed
    one) is the same column, and the stored schema widens to admit both
    (tests/test_incremental.py's randomized tick sweep caught the strict
    comparison rejecting exactly this)."""
    by_name = {f.name.lower(): f for f in old.fields}
    fields = list(old.fields)
    for f in new.fields:
        prev = by_name.get(f.name.lower())
        if prev is None:
            fields.append(T.StructField(f.name, f.dataType, nullable=True))
        elif _strip_nullability(prev.dataType) != _strip_nullability(f.dataType):
            raise TypeError(
                f"schema evolution cannot change column {f.name!r} from "
                f"{prev.dataType.simpleString()} to {f.dataType.simpleString()}"
            )
        elif prev.dataType != f.dataType or prev.nullable != f.nullable:
            widened = T.StructField(
                prev.name,
                _widen_nullability(prev.dataType, f.dataType),
                prev.nullable or f.nullable,
            )
            fields[fields.index(prev)] = widened
            by_name[prev.name.lower()] = widened
    return T.StructType(fields)


def _footer_envelopes(md) -> dict | None:
    """Per-column [min, max] from a parquet footer's row-group statistics —
    the write-time half of manifest data skipping. Only JSON-safe leaf
    types (int / float / str / bool) are kept: a column without a safe
    envelope simply can't prune, which is always correct."""
    env: dict[str, list] = {}
    try:
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if not all(isinstance(v, (int, float, str, bool)) for v in (mn, mx)):
                    continue
                name = col.path_in_schema
                cur = env.get(name)
                if cur is None:
                    env[name] = [mn, mx]
                else:
                    cur[0] = min(cur[0], mn)
                    cur[1] = max(cur[1], mx)
    except Exception:
        return None
    return env or None


def _base_version(base: str) -> int:
    """Commit version from a data dir path (``.../data/vN`` or
    ``.../data/vN-<token>`` — the token is the per-write-attempt
    uniquifier, see :meth:`IceTable._write_data`). Unknown layouts report
    0 = oldest, so tombstones still apply — deleted data must never
    resurrect on a parsing gap."""
    name = os.path.basename(base.rstrip("/"))
    m = re.match(r"v(\d+)", name)
    return int(m.group(1)) if m else 0


def _strip_scheme(p: str) -> str:
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p


@dataclass
class FileEntry:
    path: str  # absolute local path
    base: str  # basePath for partition-column recovery
    rows: int | None = None
    # Per-column [min, max] envelopes from the parquet footer (numeric /
    # string / bool leaves only) — Iceberg-style manifest stats consumed
    # by read-time file skipping. None on entries from pre-stats commits.
    stats: dict | None = None

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "base": self.base,
            "rows": self.rows,
            "stats": self.stats,
        }

    @staticmethod
    def from_json(d: dict) -> "FileEntry":
        return FileEntry(
            path=d["path"],
            base=d["base"],
            rows=d.get("rows"),
            stats=d.get("stats"),
        )


@dataclass
class Snapshot:
    version: int
    parent: int | None
    timestamp_ms: int
    operation: str  # create | append | overwrite | merge | delete | replace | rollback
    schema_json: str
    partition_by: list[str]
    files: list[FileEntry]
    summary: dict = field(default_factory=dict)
    # Merge-on-read predicate tombstones: [{"p": <sql predicate>, "v": N}].
    # A tombstone applies to rows from files committed at version <= v —
    # later appends are untouched (Iceberg sequence-number semantics).
    tombstones: list = field(default_factory=list)

    @property
    def total_rows(self) -> int | None:
        if any(f.rows is None for f in self.files):
            return None
        return sum(f.rows for f in self.files)


class IceTable:
    """One managed table. Obtain via :class:`etl_to_iceberg_spark.tables.catalog.Catalog`."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = os.path.abspath(location)
        self.meta_dir = os.path.join(self.location, _META)

    # -- metadata ----------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.meta_dir, _HINT))

    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, _HINT)) as f:
            return int(f.read().strip())

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = self.current_version() if version is None else version
        p = os.path.join(self.meta_dir, f"snap-{v}.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"snapshot {v} of table {self.location} does not exist (expired or never committed)"
            )
        with open(p) as f:
            d = json.load(f)
        return Snapshot(
            version=d["version"],
            parent=d["parent"],
            timestamp_ms=d["timestamp_ms"],
            operation=d["operation"],
            schema_json=d["schema"],
            partition_by=d["partition_by"],
            files=[FileEntry.from_json(x) for x in d["files"]],
            summary=d.get("summary", {}),
            tombstones=d.get("tombstones", []),
        )

    def snapshots(self) -> list[Snapshot]:
        out = []
        for p in sorted(
            glob.glob(os.path.join(self.meta_dir, "snap-*.json")),
            key=lambda x: int(os.path.basename(x)[5:-5]),
        ):
            with open(p) as f:
                d = json.load(f)
            out.append(
                Snapshot(
                    version=d["version"],
                    parent=d["parent"],
                    timestamp_ms=d["timestamp_ms"],
                    operation=d["operation"],
                    schema_json=d["schema"],
                    partition_by=d["partition_by"],
                    files=[FileEntry.from_json(x) for x in d["files"]],
                    summary=d.get("summary", {}),
                    tombstones=d.get("tombstones", []),
                )
            )
        return out

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.snapshot().schema_json))

    # -- read path ---------------------------------------------------------

    def read(self, version: int | None = None, as_of_ms: int | None = None) -> DataFrame:
        """Current or time-travel read (ref: cdc_flashback — the reference
        stubs AS-OF at ``oracle_to_iceberg_cdc_operator.py:195-201``)."""
        if as_of_ms is not None:
            if version is not None:
                raise ValueError("pass either version or as_of_ms, not both")
            eligible = [s for s in self.snapshots() if s.timestamp_ms <= as_of_ms]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of_ms}")
            version = eligible[-1].version
        snap = self.snapshot(version)
        return self._read_snapshot(snap)

    def pruned_files(
        self, predicates: dict[str, tuple], version: int | None = None
    ) -> tuple[list[FileEntry], int]:
        """Manifest-level file skipping: keep the files whose [min, max]
        envelope intersects every ``col: (lo, hi)`` range (either bound
        may be None = unbounded). Files without an envelope for a column
        are conservatively kept. Returns (kept, skipped_count) — the
        planning half of :meth:`read_where`."""
        snap = self.snapshot(version)
        kept: list[FileEntry] = []
        for fe in snap.files:
            keep = True
            for col, (lo, hi) in predicates.items():
                st = (fe.stats or {}).get(col)
                if st is None or st[0] is None or st[1] is None:
                    continue
                mn, mx = st
                if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                    keep = False
                    break
            if keep:
                kept.append(fe)
        return kept, len(snap.files) - len(kept)

    def read_where(
        self, predicates: dict[str, tuple], version: int | None = None
    ) -> DataFrame:
        """Range-filtered read with Iceberg-style manifest pruning: files
        whose footer envelopes cannot contain a match are never opened —
        on a 100 TB table a selective range touches the few files a
        clustered layout (``maintenance.cluster_zorder``) confined it to.
        The residual row-level predicate is still applied (envelopes are
        necessary, not sufficient), and it also pushes into the parquet
        row-group stats of the files that ARE read.

        Partition columns have no footer envelope (they live in the path,
        not the file), so a partition-column range doesn't skip at the
        manifest — it prunes at the Spark scan via the recovered Hive
        layout instead, which costs planning but not I/O."""
        snap = self.snapshot(version)
        kept, _ = self.pruned_files(predicates, version)
        sub = Snapshot(
            version=snap.version,
            parent=snap.parent,
            timestamp_ms=snap.timestamp_ms,
            operation="subset",
            schema_json=snap.schema_json,
            partition_by=snap.partition_by,
            files=kept,
            tombstones=snap.tombstones,
        )
        df = self._read_snapshot(sub)
        for col, (lo, hi) in predicates.items():
            if lo is not None:
                df = df.where(F.col(col) >= lo)
            if hi is not None:
                df = df.where(F.col(col) <= hi)
        return df

    def _read_snapshot(self, snap: Snapshot) -> DataFrame:
        schema = T.StructType.fromJson(json.loads(snap.schema_json))
        if not snap.files:
            return self.spark.createDataFrame([], schema)
        tombs = snap.tombstones or []
        by_base: dict[str, list[str]] = {}
        for fe in snap.files:
            by_base.setdefault(fe.base, []).append(fe.path)
        parts: list[DataFrame] = []
        for base, paths in sorted(by_base.items()):
            # The snapshot manifest already KNOWS the schema — pass it to
            # the reader instead of letting every read() re-infer it from
            # parquet footers (driver-side file opens per base per call;
            # the table ops re-read tables constantly: merge's probe +
            # rewrite, the ticks' index scans, every read-back). Iceberg
            # reads likewise plan from manifest schema, never footers.
            # Per-base files written before a schema evolution simply
            # miss the newer columns and read as NULL (same result the
            # previous inferred-schema + unionByName(allowMissing) path
            # produced); partition columns present in the schema are
            # recovered from the directory layout as before, with the
            # schema pinning their types.
            reader = self.spark.read.schema(schema).option("basePath", base)
            part = reader.parquet(*sorted(paths))
            if tombs:
                # Each base dir is one commit (data/vN) — tag its version
                # so tombstones gate per-file-era after the union.
                part = part.withColumn(
                    "__commit_v", F.lit(_base_version(base))
                )
            parts.append(part)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        # Column order per table schema (partition cols land last on read).
        # Columns in the evolved schema but in none of the live files —
        # e.g. every post-evolution file was deleted — read as NULL.
        present = set(df.columns)
        df = df.select(
            *[
                F.col(f.name)
                if f.name in present
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ],
            *([F.col("__commit_v")] if tombs else []),
        )
        # Merge-on-read: apply each tombstone to rows from file eras at or
        # before its version. NULL predicate results keep the row (SQL
        # DELETE removes only rows where the predicate is TRUE).
        for t in tombs:
            deleted = F.coalesce(F.expr(t["p"]), F.lit(False))
            df = df.where((~deleted) | (F.col("__commit_v") > F.lit(t["v"])))
        return df.drop("__commit_v") if tombs else df

    def incremental_read(
        self,
        from_version: int,
        to_version: int | None = None,
        *,
        on_rewrite: str = "error",
    ) -> DataFrame:
        """Rows ADDED between two snapshots — the Spark/Iceberg analogue of
        the reference's SCN-delta read (``cdc_scn_delta``, SURVEY §2.8):
        only files committed by additive snapshots in the range are
        scanned, no diffing of row contents.

        Snapshot classification (Iceberg incremental-scan semantics):
        append/create/cherrypick files are the delta; ``replace``
        (compaction / z-order) is provably data-neutral — its files are
        skipped, so a compaction mid-range does NOT re-deliver the table;
        overwrite/merge/delete/rollback REWRITE data, so "rows added" is
        undefined across them — ``on_rewrite="error"`` (default) raises,
        matching Iceberg's incremental scan; ``on_rewrite="skip"``
        ignores them (Iceberg's streaming ``skip-overwrite-snapshots`` /
        ``skip-delete-snapshots`` escape hatch — consumers must tolerate
        missed updates)."""
        if on_rewrite not in ("error", "skip"):
            raise ValueError(f"on_rewrite must be 'error' or 'skip', got {on_rewrite!r}")
        to_version = self.current_version() if to_version is None else to_version
        base_files = {fe.path for fe in self.snapshot(from_version).files}
        snaps = [s for s in self.snapshots() if from_version < s.version <= to_version]
        new_entries: list[FileEntry] = []
        seen: set[str] = set(base_files)
        for s in snaps:
            if s.operation == "replace" or (
                on_rewrite == "skip"
                and s.operation in ("overwrite", "merge", "delete", "rollback")
            ):
                seen.update(fe.path for fe in s.files)
                continue
            if s.operation in ("overwrite", "merge", "delete", "rollback"):
                raise ValueError(
                    f"snapshot {s.version} is a {s.operation!r}: rows-added is "
                    "undefined across data rewrites — read the full table, or "
                    "pass on_rewrite='skip' to ignore rewrite snapshots"
                )
            for fe in s.files:
                if fe.path not in seen:
                    seen.add(fe.path)
                    new_entries.append(fe)
        snap = self.snapshot(to_version)
        pseudo = Snapshot(
            version=to_version,
            parent=from_version,
            timestamp_ms=snap.timestamp_ms,
            operation="incremental",
            schema_json=snap.schema_json,
            partition_by=snap.partition_by,
            files=new_entries,
        )
        return self._read_snapshot(pseudo)

    # -- write path --------------------------------------------------------

    def _next_version(self) -> int:
        """One past the highest version seen in the pointer OR on disk:
        a writer that crashed between manifest write and pointer flip
        leaves an orphaned snap file, and the next commit must skip that
        number or every subsequent commit would conflict forever."""
        if not self.exists():
            return 1
        latest = self.current_version()
        for p in glob.glob(os.path.join(self.meta_dir, "snap-*.json")):
            try:
                latest = max(latest, int(os.path.basename(p)[5:-5]))
            except ValueError:
                continue
        return latest + 1

    def _commit(
        self,
        operation: str,
        files: list[FileEntry],
        schema: T.StructType,
        partition_by: list[str],
        summary: dict | None = None,
        tombstones: list | None = None,
        version: int | None = None,
        on_conflict_cleanup: tuple[str, ...] = (),
    ) -> Snapshot:
        """``version`` pins the commit to the number the caller allocated
        BEFORE reading the snapshot state its file list derives from. A
        rival landing in between claims that same number, so the exclusive
        create below fails instead of this commit silently dropping the
        rival's files (lost update). Unpinned (None) is only safe for
        commits whose file list does not extend a previously-read state.
        ``on_conflict_cleanup``: this writer's private data dirs, removed
        on conflict so retries don't leak orphans."""
        os.makedirs(self.meta_dir, exist_ok=True)
        if version is None:
            version = self._next_version()
        parent = self.current_version() if self.exists() else None
        snap = Snapshot(
            version=version,
            parent=parent,
            timestamp_ms=int(time.time() * 1000),
            operation=operation,
            schema_json=json.dumps(schema.jsonValue()),
            partition_by=partition_by,
            files=files,
            summary=summary or {},
            # Default is CLEAR: a commit that materialized or replaced its
            # inputs (create/overwrite/compact) must not inherit tombstones.
            # Carry-through is each caller's explicit responsibility.
            tombstones=list(tombstones or []),
        )
        # Exclusive create = optimistic concurrency control: a concurrent
        # writer that claimed the same version number fails HERE instead
        # of silently winning the pointer rename below (lost update). The
        # loser re-reads the new current snapshot and retries its commit —
        # exactly Iceberg's catalog-level optimistic commit protocol.
        try:
            f = open(os.path.join(self.meta_dir, f"snap-{version}.json"), "x")
        except FileExistsError as e:
            for d in on_conflict_cleanup:
                shutil.rmtree(d, ignore_errors=True)
            raise CommitConflictError(
                f"version {version} of table {self.location} was committed "
                "concurrently; re-read the table and retry"
            ) from e
        with f:
            json.dump(
                {
                    "version": snap.version,
                    "parent": snap.parent,
                    "timestamp_ms": snap.timestamp_ms,
                    "operation": snap.operation,
                    "schema": snap.schema_json,
                    "partition_by": snap.partition_by,
                    "files": [fe.to_json() for fe in snap.files],
                    "summary": snap.summary,
                    "tombstones": snap.tombstones,
                },
                f,
            )
        # Atomic pointer flip: readers see the old or the new snapshot,
        # never a partial state (fixes the reference's chunked
        # overwrite-then-append race, oracle_to_iceberg_operator.py:267-282).
        tmp = os.path.join(self.meta_dir, _HINT + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.meta_dir, _HINT))
        return snap

    def _write_data(
        self,
        df: DataFrame,
        version: int,
        partition_by: list[str],
        *,
        sized: bool = True,
    ) -> list[FileEntry]:
        """Write ``df`` into a data dir private to this write attempt.

        The ``-<token>`` uniquifier means two concurrent writers that both
        allocated the same version number write into DISJOINT directories —
        without it they share one output dir and race inside Hadoop's
        ``_temporary`` committer scratch (one job's cleanup deletes the
        other's files: silently lost rows). The loser's dir becomes an
        orphan, swept by ``_commit``'s conflict cleanup or
        ``maintenance.remove_orphan_files`` — the same lifecycle real
        Iceberg gives a failed write's files."""
        token = uuid.uuid4().hex[:8]
        out_dir = os.path.join(self.location, "data", f"v{version}-{token}")
        if sized:
            # Maintenance rewrites (compact's binpack, zorder's n_files)
            # pick their own layout and pass sized=False.
            df = self._size_output(df)
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_dir)
        return self._list_written(out_dir)

    @staticmethod
    def _size_output(df: DataFrame) -> DataFrame:
        """Coalesce the write to ~target-file-size outputs (guide §6: aim
        for 128 MB–1 GB files; Iceberg's ``write.target-file-size-bytes``).

        Without this every commit emitted one file per incoming partition
        — a post-shuffle MERGE wrote 40 files for 1 MB of rows, and every
        later reader/committer paid the per-file listing, open and footer
        costs 40× (measured r17: the MERGE read-back's 'Listing leaf
        files' job alone was ~0.1 s at sf0.1). The file count derives
        from the optimizer's size estimate over the target size
        (``E2IS_TARGET_FILE_BYTES``, default 128 MiB), so the behavior is
        scale-adaptive: fixture-sized commits collapse to one file, a
        10 GB commit keeps ~80 write tasks. ``coalesce`` never RAISES the
        partition count, and an overestimate only means more, smaller
        files (today's behavior) — so the fallback on any estimate
        failure is simply to write at the incoming partitioning.

        A frame that ENDS in an explicit repartition or sort is a caller
        asking for that layout (range-partitioned files for pruning, a
        clustering sort) — real Iceberg likewise respects the incoming
        distribution when the user supplies one — so sizing skips when
        the logical plan's root is a repartition/sort node."""
        try:
            root = df._jdf.queryExecution().logical().nodeName()
            if root in ("Repartition", "RepartitionByExpression", "Sort"):
                return df
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            target = int(
                os.environ.get("E2IS_TARGET_FILE_BYTES", 128 * 1024 * 1024)
            )
            n = max(1, -(-est // max(target, 1)))
            return df.coalesce(n)
        except Exception:
            return df

    @staticmethod
    def _bases(entries: list[FileEntry]) -> tuple[str, ...]:
        """The (token-unique, this-writer-private) data dirs behind
        ``entries`` — safe to delete if the commit loses its race."""
        return tuple({fe.base for fe in entries})

    @staticmethod
    def _list_written(out_dir: str) -> list[FileEntry]:
        import pyarrow.parquet as pq

        entries = []
        for p in sorted(
            glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
        ):
            try:
                md = pq.read_metadata(p)  # footer-only, O(KB)
                rows = md.num_rows
                stats = _footer_envelopes(md)
            except Exception:
                rows = None
                stats = None
            entries.append(
                FileEntry(path=os.path.abspath(p), base=out_dir, rows=rows, stats=stats)
            )
        return entries

    def create(self, df: DataFrame, partition_by: list[str] | None = None) -> Snapshot:
        """Create the table from a DataFrame (ref: auto-creation on first
        write, ``oracle_to_iceberg_operator.py:209-244``)."""
        if self.exists():
            raise FileExistsError(f"table already exists at {self.location}")
        partition_by = [c.lower() for c in (partition_by or [])]
        files = self._write_data(df, 1, partition_by)
        return self._commit(
            "create", files, df.schema, partition_by,
            version=1, on_conflict_cleanup=self._bases(files),
        )

    def _partition_spec(self) -> list[str]:
        return self.snapshot().partition_by if self.exists() else []

    def evolve_partition_spec(self, partition_by: list[str] | None) -> Snapshot:
        """Iceberg-style partition evolution: a METADATA-ONLY commit that
        changes the layout of FUTURE writes. Existing files keep their
        old layout and stay readable as-is — each commit dir recovers its
        own Hive partition columns via basePath (_read_snapshot), and a
        column that stops being partitioned simply rides inside the new
        files' parquet instead of their paths. O(1): no data rewrite, no
        scan; incremental reads classify the commit as data-neutral (its
        file list adds nothing unseen).

        The reference can only set partitioning at table creation
        (utils/catalog_manager.py:57-69); real Iceberg evolves specs the
        same metadata-only way (v2 spec-id per manifest)."""
        spec = [c.lower() for c in (partition_by or [])]
        names = {f.name.lower() for f in self.schema().fields}
        unknown = [c for c in spec if c not in names]
        if unknown:
            raise ValueError(
                f"partition columns not in table schema: {unknown}"
            )
        # Pin the version BEFORE reading table state (same protocol as
        # every other writer): a rival commit landing between the read
        # and our commit then collides on the exclusive manifest create
        # (CommitConflictError) instead of being silently erased by a
        # commit carrying a stale file list. Pinning costs nothing on
        # the no-op path — no manifest is created unless we commit.
        version = self._next_version()
        prev = self.snapshot()
        if spec == prev.partition_by:
            return prev  # no-op: don't burn a version on an equal spec
        return self._commit(
            "evolve-partition",
            prev.files,
            self.schema(),
            spec,
            summary={"previous_spec": prev.partition_by, "new_spec": spec},
            tombstones=prev.tombstones,  # metadata-only: deletes still apply
            version=version,
        )

    def append(self, df: DataFrame) -> Snapshot:
        """Append (ref: sink_iceberg_append, ``oracle_to_iceberg_operator.py:121-122,147-155``).
        New files only; prior snapshot's files carried by reference.

        Schema evolution on write (Iceberg semantics the reference's
        fixed-DDL path lacks): columns new to ``df`` are added to the
        table schema as nullable; old files are never rewritten — the
        read path fills the missing columns with NULL
        (``_read_snapshot``'s ``allowMissingColumns`` union). A column
        re-appearing with a different type is an error, not a coercion."""
        if not self.exists():
            return self.create(df)
        spec = self._partition_spec()
        # Version BEFORE state read: a rival landing after this line claims
        # this same number and our commit conflicts instead of silently
        # dropping the rival's files.
        version = self._next_version()
        new_files = self._write_data(df, version, spec)
        prev = self.snapshot()
        schema = _evolve_schema(self.schema(), df.schema)
        return self._commit(
            "append", prev.files + new_files, schema, spec,
            tombstones=prev.tombstones,  # new files postdate them (gated by version)
            version=version, on_conflict_cleanup=self._bases(new_files),
        )

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> Snapshot:
        """Atomic replace (ref: sink_iceberg_overwrite,
        ``hdfs_to_iceberg_cdc_operator.py:363-367``) — one snapshot commit,
        no visible truncate-then-append window."""
        spec = [c.lower() for c in partition_by] if partition_by else self._partition_spec()
        version = self._next_version()
        files = self._write_data(df, version, spec)
        return self._commit(
            "overwrite", files, df.schema, spec,
            version=version, on_conflict_cleanup=self._bases(files),
        )

    def get_or_create(
        self, schema: T.StructType, partition_by: list[str] | None = None
    ) -> "IceTable":
        """DDL surface: CREATE TABLE IF NOT EXISTS with an explicit schema
        (ref: ddl_create_table_auto, ``catalog_manager.py:41-54``)."""
        if not self.exists():
            empty = self.spark.createDataFrame([], schema)
            self.create(empty, partition_by)
        return self

    # -- merge / delete (copy-on-write with file pruning) ------------------

    def _file_path_col(self) -> F.Column:
        return F.col("_metadata.file_path")

    def _read_with_path(self, snap: Snapshot) -> DataFrame:
        schema = T.StructType.fromJson(json.loads(snap.schema_json))
        if not snap.files:
            # Empty table (e.g. a COW delete removed every file): MERGE
            # degrades to insert-all, DELETE to a no-op — not an
            # IndexError. Found by the randomized lifecycle sweep.
            empty = T.StructType(
                list(schema.fields) + [T.StructField("__file", T.StringType())]
            )
            return self.spark.createDataFrame([], empty)
        by_base: dict[str, list[str]] = {}
        for fe in snap.files:
            by_base.setdefault(fe.base, []).append(fe.path)
        parts = []
        for base, paths in sorted(by_base.items()):
            # manifest schema, not footer inference — see _read_snapshot
            parts.append(
                self.spark.read.schema(schema)
                .option("basePath", base)
                .parquet(*sorted(paths))
                .withColumn("__file", F.col("_metadata.file_path"))
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        return df.select(*[f.name for f in schema.fields], "__file")

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        *,
        dedup_order_by: list[str] | None = None,
        delete_matched_when: str | None = None,
    ) -> Snapshot:
        """MERGE INTO target USING source ON keys
        WHEN MATCHED [AND delete_matched_when] THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *.

        The real upsert the reference documents but stubs with a full-table
        overwrite (``README.md:594-606`` vs
        ``oracle_to_iceberg_cdc_operator.py:211-221``).

        Scale strategy (same shape as Iceberg copy-on-write):

        1. Source is deduped per key first (latest by ``dedup_order_by``) —
           the ``row_number``-window dedup the reference's docs promise.
        2. One semi-join of target-with-file-path against source keys finds
           the data files that contain ANY matched key; only the distinct
           file list (metadata-sized) reaches the driver.
        3. Only those files are rewritten (their unmatched rows preserved,
           matched rows replaced/deleted); every untouched file moves to the
           new snapshot by reference. A 100 TB table with a 1 GB delta
           rewrites ~the files the delta touches, not the table.
        """
        keys = [k.lower() for k in keys]
        if dedup_order_by:
            w = Window.partitionBy(*keys).orderBy(
                *[F.col(c).desc() for c in dedup_order_by]
            )
            source = (
                source.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            source = source.dropDuplicates(keys)

        if not self.exists():
            return self.create(source)
        # Version before state read (see append): serializes this merge
        # against rival commits via the pinned exclusive create.
        version = self._next_version()
        snap = self.snapshot()
        # Source batches may carry NEW columns (schema evolution, same as
        # append): they join the table schema as nullable, old files are
        # not rewritten for it, and pre-evolution rows read NULL. A source
        # MISSING existing columns is still an error — UPDATE SET * with
        # absent columns would silently null live data.
        schema = _evolve_schema(self.schema(), source.schema)
        cols = [f.name for f in schema.fields]
        source = source.select(*cols)
        # Source is consumed several times (touched-file probe, keep-side
        # anti-join, delete-clause projections, rewrite) and fully
        # materialized before the commit returns — cache for exactly the
        # merge body, released even when a write fails (caching.cached).
        with cached(source):

            target = self._read_with_path(snap)
            touched = (
                target.join(source.select(*keys), on=keys, how="left_semi")
                .select("__file")
                .distinct()
                .collect()
            )
            touched_files = {_strip_scheme(r["__file"]) for r in touched}

            untouched_entries = [
                fe for fe in snap.files if os.path.abspath(fe.path) not in touched_files
            ]
            touched_entries = [
                fe for fe in snap.files if os.path.abspath(fe.path) in touched_files
            ]

            # Rewrite = unmatched rows of touched files + (filtered) source rows.
            if touched_entries:
                sub = Snapshot(
                    version=snap.version,
                    parent=snap.parent,
                    timestamp_ms=snap.timestamp_ms,
                    operation="subset",
                    schema_json=snap.schema_json,
                    partition_by=snap.partition_by,
                    files=touched_entries,
                    tombstones=snap.tombstones,  # rewrite must not resurrect MOR deletes
                )
                # One read of the touched-file sub-snapshot serves both the
                # unmatched-rows keep side and (below) the delete clause's
                # logical-key projection — not two independent scans.
                sub_df = self._read_snapshot(sub)
                keep = sub_df.join(source, on=keys, how="left_anti")
            else:
                sub = None
                sub_df = None
                keep = None

            incoming = source
            if delete_matched_when is not None and sub is not None:
                # Matched keys satisfying the predicate are deleted, i.e. simply
                # not re-inserted; unmatched source rows still insert. "Matched"
                # is judged against the LOGICAL table (tombstones applied) —
                # `target` above reads raw file rows (fine for touched-file
                # detection, where a superset only over-rewrites), but a key
                # whose rows were all MOR-deleted is NOT matched: its source row
                # must take the WHEN NOT MATCHED THEN INSERT branch, not the
                # matched-delete branch (caught by the randomized MERGE sweep).
                # Any logically-matched key appears RAW in some touched file (the
                # semi-join above found every file holding a matched key), so the
                # logical-key projection only needs the touched-file sub-snapshot
                # — tombstones still applied — not a full-table scan per merge.
                # No touched files => no raw match => no logical match: skip.
                logical_keys = sub_df.select(*keys).distinct()
                matched_keys = source.join(logical_keys, on=keys, how="left_semi")
                deletions = matched_keys.where(delete_matched_when).select(*keys)
                incoming = source.join(deletions, on=keys, how="left_anti")

            rewrite = (
                incoming
                if keep is None
                else keep.unionByName(incoming, allowMissingColumns=True)
            )
            new_files = self._write_data(rewrite.select(*cols), version, snap.partition_by)
            return self._commit(
                "merge",
                untouched_entries + new_files,
                schema,
                snap.partition_by,
                summary={
                    "rewritten_files": len(touched_entries),
                    "carried_files": len(untouched_entries),
                },
                tombstones=snap.tombstones,  # untouched by-reference files still need them
                version=version, on_conflict_cleanup=self._bases(new_files),
            )

    def delete_where(self, predicate: str, *, mode: str = "cow") -> Snapshot:
        """DELETE FROM t WHERE p.

        ``mode="cow"`` (default): file-pruned copy-on-write like merge —
        files containing matches are rewritten without the matching rows.

        ``mode="mor"`` (merge-on-read): an O(1) metadata commit appends a
        predicate tombstone; no data moves, however large the table.
        Reads apply the tombstone to rows from file eras at or before the
        delete (later appends are untouched — Iceberg sequence-number
        semantics), and compaction materializes tombstones and clears
        them. The classic trade: MOR for delete-heavy write paths (GDPR
        sweeps, retention), COW when read amplification matters more."""
        version = self._next_version()  # before state read, see append
        snap = self.snapshot()
        schema = self.schema()
        if mode == "mor":
            tombs = list(snap.tombstones) + [{"p": predicate, "v": snap.version}]
            return self._commit(
                "delete", list(snap.files), schema, snap.partition_by,
                summary={"mode": "mor", "predicate": predicate},
                tombstones=tombs,
                version=version,
            )
        if mode != "cow":
            raise ValueError(f"unknown delete mode {mode!r}")
        cols = [f.name for f in schema.fields]
        target = self._read_with_path(snap)
        touched = (
            target.where(predicate).select("__file").distinct().collect()
        )
        touched_files = {_strip_scheme(r["__file"]) for r in touched}
        untouched = [fe for fe in snap.files if os.path.abspath(fe.path) not in touched_files]
        touched_entries = [fe for fe in snap.files if os.path.abspath(fe.path) in touched_files]
        new_files: list[FileEntry] = []
        if touched_entries:
            sub = Snapshot(
                version=snap.version, parent=snap.parent, timestamp_ms=snap.timestamp_ms,
                operation="subset", schema_json=snap.schema_json,
                partition_by=snap.partition_by, files=touched_entries,
                tombstones=snap.tombstones,  # rewrite must not resurrect MOR deletes
            )
            keep = self._read_snapshot(sub).where(f"NOT ({predicate})")
            new_files = self._write_data(keep.select(*cols), version, snap.partition_by)
        return self._commit(
            "delete", untouched + new_files, schema, snap.partition_by,
            summary={"rewritten_files": len(touched_entries)},
            tombstones=snap.tombstones,  # untouched by-reference files still need them
            version=version, on_conflict_cleanup=self._bases(new_files),
        )
