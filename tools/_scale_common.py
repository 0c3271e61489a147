"""Shared helpers for the tools/*_scale.py measurement scripts.

The scale scripts run at import (they ARE the measurement), so they
historically repeated these helpers instead of importing each other —
four copies of the shuffle-metric read and the sign-flip replication
had drifted into existence by r13. This module holds the single copy;
it defines functions only and is safe to import from any script.
"""

from __future__ import annotations

import json
import time
import urllib.request

from pyspark.sql import functions as F


def shuffle_write_bytes(spark):
    """Total shuffle write across executors from the UI REST API —
    None when the UI is unreachable (callers report 'n/a')."""
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/executors"
        ) as r:
            return sum(e.get("totalShuffleWrite", 0) for e in json.load(r))
    except Exception:
        return None


def timed(spark, run, runs: int = 3):
    """One warm pass, then min-of-``runs`` wall with the shuffle-write
    delta of the fastest run. Returns (best_seconds, bytes_or_None)."""
    run()  # warm
    best, sw = None, None
    for _ in range(runs):
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        run()
        el = time.perf_counter() - t0
        s1 = shuffle_write_bytes(spark)
        if best is None or el < best:
            best = el
            sw = None if (s0 is None or s1 is None) else s1 - s0
    return best, sw


def ensure_replica(path: str, build) -> None:
    """Build the shared scale replica at ``path`` once, guarded by
    Spark's ``_SUCCESS`` marker (ADVICE r14): the four scale scripts
    (pq/semantic/semdecon/dedup_ab) reuse one sf1 replica dir across
    processes, and a bare ``os.path.isdir`` check accepts a partial dir
    left by an interrupted write. ``_SUCCESS`` is written by the
    committer only after every task commits, so presence-of-marker +
    at-least-one-parquet means a complete replica; anything else is
    rebuilt with an overwrite. Unlike ``ensure_sidecar`` this does NOT
    register atexit cleanup — cross-process reuse of the ~1-min build
    is the point (content is deterministic by (SRC, seed), and the
    path is already keyed by SRC via sidecar_path).

    Single-writer: concurrent scale-script launches could both miss
    ``_SUCCESS`` and run overlapping overwrite writes to the same path
    (ADVICE r15), so the build is serialized through an ``O_EXCL`` lock
    file beside the replica dir — the loser waits for the winner's
    ``_SUCCESS`` instead of double-building. (Documented ops practice
    is to never run scale scripts concurrently anyway; the lock makes
    the helper itself enforce it.)"""
    import glob
    import os
    import time as _time

    def _complete() -> bool:
        return bool(
            os.path.exists(os.path.join(path, "_SUCCESS"))
            and glob.glob(os.path.join(path, "*.parquet"))
        )

    if _complete():
        return
    lock = path.rstrip("/") + ".lock"
    os.makedirs(os.path.dirname(lock) or ".", exist_ok=True)

    def _stale() -> bool:
        # A SIGKILLed builder's finally never runs, so its lock would
        # otherwise pin every later run into the full wait + raise
        # (ADVICE r16). Two reclaim signals: the recorded builder PID is
        # gone, or the lock has outlived the build deadline.
        try:
            st = os.stat(lock)
            with open(lock) as f:
                pid = int(f.read().strip() or "0")
        except (OSError, ValueError):
            return False  # vanished or mid-write: let the loop re-check
        if pid > 0:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                return True  # builder died without cleanup
            except PermissionError:
                pass  # alive but not ours
        return _time.time() - st.st_mtime > 1800

    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        # Another process is building: wait for its _SUCCESS, for the
        # lock to vanish (normal cleanup), or for it to go stale
        # (killed builder) — then take over instead of raising forever.
        deadline = _time.time() + 1800
        while _time.time() < deadline:
            if _complete():
                return
            if not os.path.exists(lock):
                return ensure_replica(path, build)
            if _stale():
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass  # another waiter reclaimed it first
                return ensure_replica(path, build)
            _time.sleep(2.0)
        raise TimeoutError(f"replica build lock held too long: {lock}")
    try:
        os.write(fd, str(os.getpid()).encode())
        if not _complete():  # re-check under the lock
            build().write.mode("overwrite").parquet(path)
    finally:
        os.close(fd)
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass  # reclaimed as stale while we (validly) held it past deadline


def replicate_embeddings(emb, r: int, keep: tuple[str, ...] = (), d: int = 64):
    """Seeded orthogonal sign-flip replication of an embedding table:
    per-replica sign patterns keep within-replica cosines invariant and
    cancel cross-replica ones, so pair structure scales linearly — the
    honest 10× shape. ``keep`` columns (e.g. ``("label",)``) ride along
    unchanged: a replica is the same labeled point in a rotated basis."""
    import random

    parts = []
    for i in range(r):
        rng = random.Random(9000 + i)
        signs = F.array(
            *[F.lit(1.0 if (i == 0 or rng.random() < 0.5) else -1.0)
              for _ in range(d)]
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    signs,
                    lambda x, s: x * s,
                ).alias("embedding"),
                *keep,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
