"""Driver-check rotation invariants: the budget-limited checker walks
`all_specs()` in order, so ordering bugs silently starve queries of
driver correctness rows."""

from __future__ import annotations

import etl_to_iceberg_spark.registry as R


def _partition(names):
    green, failed, _, _ = R._checked_history()
    never = [n for n in names if n not in green and n not in failed]
    return green, failed, never


def test_rotation_rank_order_holds():
    names = list(R.all_specs())
    green, failed, never = _partition(names)
    changed = set(R._CHANGED_THIS_ROUND) if names[0] in R._CHANGED_THIS_ROUND else set()
    idx = {n: i for i, n in enumerate(names)}
    plain_green = [n for n in names if n in green and n not in changed]
    plain_never = [n for n in never if n not in changed]
    if plain_never and plain_green:
        # every never-checked query precedes every plain green query
        assert max(idx[n] for n in plain_never) < min(idx[n] for n in plain_green)
    if changed:
        # live changed list leads everything
        assert names[: len(changed)] == [n for n in names if n in changed][: len(changed)]
        if plain_never:  # empty once every registered op has a driver row
            assert all(idx[c] < min(idx[n] for n in plain_never) for c in changed)


def test_changed_list_expires_once_its_round_is_checked(monkeypatch):
    R.all_specs()  # force registration
    green, failed, _, seen = R._checked_history()
    monkeypatch.setattr(
        R, "_checked_history", lambda: (green, failed, R._CHANGED_AS_OF_ROUND, seen)
    )
    names = list(R.all_specs())
    idx = {n: i for i, n in enumerate(names)}
    never = [n for n in names if n not in green and n not in failed]
    expired_green = [n for n in R._CHANGED_THIS_ROUND if n in green]
    # once expired, previously-changed green queries sort with the greens —
    # behind every never-checked query, not ahead of them
    if never and expired_green:
        assert min(idx[n] for n in expired_green) > max(idx[n] for n in never)


def test_changed_ids_exist():
    specs = R.all_specs()
    assert set(R._CHANGED_THIS_ROUND) <= set(specs)


def test_bench_names_exist_and_compat_is_prefix():
    """bench.py's frozen compat list and headline set must reference real
    registry ids (a rename would otherwise crash the round's bench), and
    the compat set must be a subset of HEADLINE (bench sums compat from
    HEADLINE results; a compat name outside HEADLINE would trip the
    missing-name assert at the end of every run)."""
    import bench

    specs = R.all_specs()
    assert set(bench.HEADLINE) <= set(specs)
    assert set(bench.R01_COMPAT) <= set(bench.HEADLINE)
    assert len(bench.R01_COMPAT) == 17  # frozen like-for-like set


def test_inventory_in_sync_with_registry():
    """INVENTORY.md is generated; this pins it to the live registry so it
    cannot silently go stale again (VERDICT r7 §wrong-1: r7 registered
    stream_incremental_minhash but the snapshot shipped a 173-op
    inventory)."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "INVENTORY.md").read_text()
    ids = set(re.findall(r"^\| \d+ \| `([^`]+)` \|", text, flags=re.M))
    specs = set(R.all_specs())
    assert ids == specs, (
        f"INVENTORY.md drifted from registry — rerun tools/gen_inventory.py; "
        f"missing={sorted(specs - ids)} extra={sorted(ids - specs)}"
    )


def test_scratch_dirs_removed_at_exit(monkeypatch):
    import os

    from etl_to_iceberg_spark import scratch

    d = scratch.scratch_dir("e2is_test_")
    assert os.path.isdir(d)
    # Swap in a private list so _cleanup only touches THIS test's dir —
    # running it against the shared _dirs would rmtree scratch dirs that
    # process-level caches (_PRISTINE warehouses, _layout_cache,
    # _sid_work_cache) still point at, breaking later tests in the same
    # process (ADVICE r7).
    monkeypatch.setattr(scratch, "_dirs", [d])
    scratch._cleanup()
    assert not os.path.exists(d)
