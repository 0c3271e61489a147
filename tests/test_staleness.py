"""Check-rotation telemetry guard (VERDICT r8 #7).

The driver verifies ~50 registry ops per round, staleness-ordered
(registry.all_specs ranks greens oldest-row-first), so every op's latest
driver row should cycle within a few rounds. These tests read the same
CORRECTNESS_r*.json artifacts the rotation does and fail the build if
the tail is aging faster than the rotation can drain it — the condition
that previously had to be caught by hand-merging eight JSON files.

Pure-Python: no SparkSession, safe to run standalone.
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from gen_inventory import staleness_rows  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Rotation design bound: 181 ops / ~50 checks per round ≈ 3.6 rounds to
# cycle the whole registry even with zero budget spent on changed/new
# ops; 5 gives headroom for a couple of heavy-churn rounds in a row.
MAX_STALE_ROUNDS = 5


def _have_artifacts() -> bool:
    return bool(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")))


@pytest.mark.skipif(
    not _have_artifacts(), reason="no CORRECTNESS artifacts (fresh clone)"
)
def test_no_op_latest_row_is_a_failure():
    rows, _ = staleness_rows()
    failed = [r["name"] for r in rows if r["status"] == "failed"]
    assert not failed, (
        f"ops whose LATEST driver row failed: {failed} — fix before the "
        "next driver round (failed rank leads the rotation, so these burn "
        "budget every round until green)"
    )


@pytest.mark.skipif(
    not _have_artifacts(), reason="no CORRECTNESS artifacts (fresh clone)"
)
def test_checked_tail_never_ages_past_bound():
    rows, latest_round = staleness_rows()
    over = [
        (r["name"], r["staleness"])
        for r in rows
        if r["staleness"] is not None and r["staleness"] > MAX_STALE_ROUNDS
    ]
    assert not over, (
        f"ops whose latest driver row is > {MAX_STALE_ROUNDS} rounds old "
        f"(latest file r{latest_round}): {over} — keep _CHANGED_THIS_ROUND "
        "minimal so the rotation's leftover budget can drain the tail "
        "(registry.py rank ordering)"
    )


@pytest.mark.skipif(
    not _have_artifacts(), reason="no CORRECTNESS artifacts (fresh clone)"
)
def test_never_checked_backlog_fits_one_round_budget():
    # Never-checked ops rank ahead of stale greens; if more ops register
    # in one round than the driver checks (~50), some will wait — but a
    # backlog larger than a full budget means new ops are outpacing the
    # checker permanently.
    rows, _ = staleness_rows()
    never = [r["name"] for r in rows if r["status"] == "never"]
    assert len(never) <= 50, (
        f"{len(never)} registered ops have never received a driver row — "
        "more than one round's check budget; stop registering and let the "
        f"rotation catch up: {never[:10]}..."
    )


# The driver's per-round check budget (~50 ops, staleness-ordered) — the
# constant every round's by-hand budget math has been computed against
# since r8. If the real driver budget changes, update this and the
# simulation below inherits the new bound.
DRIVER_BUDGET = 50


@pytest.mark.skipif(
    not _have_artifacts(), reason="no CORRECTNESS artifacts (fresh clone)"
)
def test_rotation_drains_under_current_churn():
    """Simulate the driver's budget-limited rotation forward from the
    CURRENT artifacts + _CHANGED_THIS_ROUND and assert no op's driver
    row ever ages past MAX_STALE_ROUNDS within the lookahead horizon.

    This automates the per-round budget math that has been done by hand
    in every round's notes ("N changed + M never + K stale ≤ 50"): a
    too-long changed list or a burst of new registrations shows up HERE,
    at commit time, instead of as a test_checked_tail_never_ages_past
    failure two driver rounds later. Future rounds are simulated with
    ZERO further churn (the most optimistic assumption — real churn only
    tightens it), failed ops are modeled worst-case as staying failed
    (they lead the front and burn budget every round), and the front
    mirrors registry.all_specs' exact rank ordering: changed → failed →
    never-checked (registration order) → greens oldest-row-first."""
    from etl_to_iceberg_spark import registry

    registry.all_specs()  # trigger the module imports that register ops
    names = list(registry._REGISTRY)
    green, failed, latest, seen0 = registry._checked_history()
    last_seen = dict(seen0)
    changed_active = (
        set(registry._CHANGED_THIS_ROUND)
        if latest < registry._CHANGED_AS_OF_ROUND
        else set()
    )
    reg_pos = {n: i for i, n in enumerate(names)}

    horizon = MAX_STALE_ROUNDS + 2
    for step in range(1, horizon + 1):
        rnd = latest + step

        def rank(n, *, _step=step):
            if _step == 1 and n in changed_active:
                return (0, 0, reg_pos[n])
            if n in failed:
                return (1, 0, reg_pos[n])
            if n not in last_seen:
                return (2, 0, reg_pos[n])
            return (3, last_seen[n], reg_pos[n])

        front = sorted(names, key=rank)[:DRIVER_BUDGET]
        for n in front:
            # Every checked op receives a fresh driver ROW — including a
            # red one (the artifact records the failure, so its row age
            # resets; test_checked_tail_never_ages_past measures age
            # from the latest row regardless of status). Only the
            # FAILED status persists worst-case, keeping the op rank-1
            # and burning a budget slot every simulated round.
            last_seen[n] = rnd
        over = sorted(
            (n, rnd - last_seen[n])
            for n in names
            if n in last_seen and rnd - last_seen[n] > MAX_STALE_ROUNDS
        )
        assert not over, (
            f"simulated round r{rnd} (+{step} from r{latest}, zero future "
            f"churn): {len(over)} ops age past {MAX_STALE_ROUNDS} rounds "
            f"under the {DRIVER_BUDGET}-op budget — shrink "
            f"_CHANGED_THIS_ROUND or stop registering: {over[:8]}"
        )
    never_left = [n for n in names if n not in last_seen]
    assert not never_left, (
        f"{len(never_left)} ops never earn a driver row within {horizon} "
        f"simulated rounds: {never_left[:8]}"
    )
