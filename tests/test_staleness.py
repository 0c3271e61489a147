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
