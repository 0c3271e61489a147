"""Query registry — the declared operator inventory.

Every operator the engine claims (SURVEY.md §2 IDs plus extension IDs) is
registered here as a :class:`QuerySpec`:

- ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation, run by
  the driver at sf0.01.
- ``sql`` — the equivalent ANSI SQL for the DuckDB oracle (``None`` for
  non-SQL-expressible ops, which get a rows-only check).

``__spark_entry__.py`` exposes this registry through the driver contract.

Determinism discipline (so value-hashes match bit-for-bit):

- Sums/avgs over ``double`` columns are computed over ``DECIMAL`` casts
  (exact, order-independent arithmetic) and cast back to ``DOUBLE`` — both
  engines then produce the identical IEEE value regardless of partition
  order. Plain ``SUM(double)`` would differ in low bits between engines.
- Any top-k ordering includes a unique tie-break key.
- No wall-clock (``current_timestamp``) in any checked query; time anchors
  are literals (the reference's wall-clock CDC cursor is reproduced as an
  explicit parameter instead — see ``operators/cdc.py``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None -> rows-only check
    doc: str = ""
    # Sidecar FAMILIES this op touches (engine or oracle side) — the
    # first argument of every sidecars.sidecar_path()/oracle_sidecar_path()
    # call its execution can reach. Declared at registration so
    # sidecar-coverage tooling (tools/cold_sweep.py, the oracle-lint
    # seeds) is registry-driven instead of grepping oracle SQL for path
    # substrings — the grep misses ENGINE-ONLY sidecars whose oracle
    # re-derives independently and reads nothing (ADVICE/VERDICT r13).
    # tests/test_sidecars.py pins the manifest against the package's
    # actual sidecar_path call sites so a declaration can't go stale.
    sidecars: tuple[str, ...] = ()


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    sql: str | None = None,
    doc: str = "",
    sidecars: tuple[str, ...] = (),
):
    """Decorator: register a query implementation under a SURVEY §2 ID."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            sql=sql,
            doc=doc or (fn.__doc__ or ""),
            sidecars=tuple(sidecars),
        )
        return fn

    return deco


# Queries whose implementation changed this round — re-check them even
# though a prior round recorded a green row. Keep this list current, and
# bump _CHANGED_AS_OF_ROUND when refreshing it: once the driver's check
# for that round has produced a CORRECTNESS file, the list is spent and
# auto-expires (a stale entry must not outrank never-checked queries).
_CHANGED_AS_OF_ROUND = 17
_CHANGED_THIS_ROUND: list[str] = [
    # r17: the bucketed-index refactor (SCALING.md watchpoint 10) —
    # incremental_minhash_tick's sketch-marking and label-derivation
    # blocks are now the shared helpers _marked_batch_sketch /
    # _minhash_raw_labels (extracted verbatim; the bucketed tick reuses
    # them), so the two consumers of the flat tick re-check:
    # (r17 optimization pass additionally swapped the marked batch
    # sketch's lazy .cache() for an eager localCheckpoint —
    # ext/incremental._materialize, labels bit-identical, release via
    # caching.release_frame — touching the same three ops plus the
    # bucketed tick below.)
    "dedup_incremental_minhash",
    "stream_incremental_minhash",
    "dedup_incremental_minhash_bucketed",
    # r17: _SEMDECON["thresh"] 0.30 -> 0.29 (VERDICT r16 #3 — the
    # incremental tick's only driver row matched on 0 rows; one notch
    # down makes the attestation non-vacuous). The constant is shared
    # by both decontaminators and their oracles:
    "corpus_semantic_decontaminate",
    "corpus_semantic_decontaminate_incremental",
    # r17 optimization pass: norm-factored cosine (cosine_with_norms —
    # the L2 norms are computed once per VECTOR in the projection before
    # a join instead of once per scored PAIR inside it; bit-identical
    # arithmetic, see the helper's docstring) through ivf_assign, the
    # re-rank joins, and the tick scorer; plus the known-nlist probe-job
    # skip. Every registered consumer of those helpers re-checks (all 21
    # pre-verified green by tools/driver_sim.py this round):
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "similarity_ann_lsh_multiprobe",
    "similarity_ann_ivf",
    "similarity_ivf_kmeans",
    "similarity_ann_ivf_two_level",
    "similarity_ann_ivf_pq",
    "similarity_ann_ivf_pq_residual",
    "similarity_ann_ivf_pq_residual_two_level",
    "similarity_incremental_ann",
    "similarity_quantizer_refresh",
    "similarity_knn_graph",
    "similarity_knn_label_vote",
    "dedup_embedding_cosine",
    "dedup_semantic_kmeans",
    "dedup_semantic_clusters",
    "corpus_label_purity",
    "corpus_embedding_outlier_prune",
    # r17 optimization pass: jaccard_verify caches the candidate-touched
    # shingle sets (both verify-join sides consumed the subtree — the
    # semi-join + text repartition + tokenization ran twice per query):
    "dedup_minhash_lsh",
    # r17 optimization pass: lang_id/quality_score rebuilt with a
    # let-bound token array (one tokenization per row instead of one per
    # reference; bit-identical arithmetic) + parallelism guards on the
    # text pipelines. All 8 registered consumers re-check (pre-verified
    # green by tools/driver_sim.py this round):
    "text_quality_score",
    "text_lang_id",
    "corpus_curate",
    "corpus_curate_v2",
    "text_quality_rank_filter",
    "corpus_token_budget_mix",
    "corpus_decontaminate",
    "text_ngram_topk",
    # r17 optimization pass: connected_components folds the bridge-size
    # probe and driver payload into one limit(max+1) collect, and
    # dedup_connected_components drops the no-op balancing exchange:
    "dedup_connected_components",
    # r17 optimization pass: _write_data sizes outputs to the target
    # file size (guide §6). Values are layout-independent (20-op parity
    # sweep green this round); the ops whose TIMED write path changed
    # re-check:
    "merge_keyed_upsert",
    "cdc_incremental_upsert",
    "merge_schema_evolve",
    "delete_where_mor",
    "maint_compact",
    "sink_iceberg_append",
    "sink_iceberg_overwrite",
    "sink_partitioned_write",
    "ddl_create_table_auto",
    "dedup_incremental_exact",
]
# Round-15 rotation budget (VERDICT r14 #1): rotation-FULL, churn = 0.
# Front = the 2 slipped r10 ops (`dedup_incremental_exact`,
# `stream_incremental_dedup`, age 5, must-check) + 48 of the 49-op r11
# cohort (age 4); one r11 op slips to r16 even at zero churn, so
# nothing registered and no green-checked op's implementation changed
# this round (the one package diff is a docstring). r16 pre-plan +
# probe results live in README's round notes: the 7-op dedup-removal
# changed list drains clean with headroom for +1 new op. The budget
# arithmetic is not hand-maintained: tests/test_staleness.py::
# test_rotation_drains_under_current_churn simulates the front forward
# from the artifacts and fails at commit time if churn or registrations
# outrun the drain (the true bound: ~300 registered ops at budget 50).


@lru_cache(maxsize=1)
def _checked_history() -> tuple[frozenset[str], frozenset[str], int, dict[str, int]]:
    """(ever_green, ever_failed) query names from prior rounds'
    CORRECTNESS_r*.json files (repo root, two levels up from this file).

    A budget-limited checker walks the registry in order, so ordering the
    never-checked tail first is how every query eventually earns a driver
    row. Reading the driver's own artifacts makes the rotation
    self-maintaining — no hand-curated module order to go stale. Missing
    files (fresh clone, driver sandbox) degrade to registration order.
    Cached per process: the artifact files cannot change mid-run and
    queries()/oracle_sql() both funnel through all_specs()."""
    import json
    from pathlib import Path

    # Latest-row semantics: a query's status is its MOST RECENT driver row
    # (files walk in ascending round order, so later rounds overwrite).
    # Ever-failed semantics would pin a fixed-then-reverified query in the
    # failed rank forever, burning check budget on it every round.
    status: dict[str, bool] = {}
    last_seen: dict[str, int] = {}
    latest_round = 0
    root = Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        try:
            rnd = int(p.stem.split("_r")[-1])
        except ValueError:
            rnd = 0
        latest_round = max(latest_round, rnd)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            err = row.get("err")
            ok_err = err is None or err == "no_oracle"
            ok_vals = row.get("rows_match") is not False and row.get(
                "hash_match"
            ) is not False
            status[name] = ok_err and ok_vals and row.get("spark_rows") is not None
    green = {n for n, ok in status.items() if ok}
    failed = {n for n, ok in status.items() if not ok}
    return frozenset(green), frozenset(failed), latest_round, last_seen


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs, ordered for a budget-limited driver checker:
    never-checked first, then prior fails/errors, then queries changed
    this round, then the queries with prior green rows."""
    import etl_to_iceberg_spark.operators.table_queries  # noqa: F401
    import etl_to_iceberg_spark.ext.queries  # noqa: F401
    import etl_to_iceberg_spark.ext.corpus_queries  # noqa: F401
    import etl_to_iceberg_spark.operators.analytics  # noqa: F401
    import etl_to_iceberg_spark.operators.tpch_more  # noqa: F401
    import etl_to_iceberg_spark.operators.tpch_more2  # noqa: F401
    import etl_to_iceberg_spark.operators.tpch_partsupp  # noqa: F401
    import etl_to_iceberg_spark.operators.scale_queries  # noqa: F401
    import etl_to_iceberg_spark.operators.advanced  # noqa: F401
    import etl_to_iceberg_spark.operators.relational  # noqa: F401
    import etl_to_iceberg_spark.operators.cdc_queries  # noqa: F401
    # New this round — imported last so never-checked newcomers queue
    # behind the older never-checked tail in the driver-check rotation.
    import etl_to_iceberg_spark.ext.pipeline_queries  # noqa: F401
    import etl_to_iceberg_spark.operators.table_evolution  # noqa: F401
    import etl_to_iceberg_spark.operators.ingest_formats  # noqa: F401
    import etl_to_iceberg_spark.operators.sketches  # noqa: F401
    import etl_to_iceberg_spark.ext.incremental_queries  # noqa: F401

    green, failed, latest_round, last_seen = _checked_history()
    # The changed list is only live until the driver check for its round
    # has run; after that its entries were re-verified (their fresh rows
    # are already in `green`/`failed`) and it expires automatically.
    changed = (
        set(_CHANGED_THIS_ROUND) if latest_round < _CHANGED_AS_OF_ROUND else set()
    )
    unknown = changed - _REGISTRY.keys()
    assert not unknown, f"_CHANGED_THIS_ROUND has stale/unknown ids: {unknown}"

    def rank(name: str) -> tuple[int, int]:
        # Changed and previously-failed queries lead: they have a stale or
        # red driver row that must be refreshed this round no matter how
        # many brand-new (never-checked) queries registered since — new
        # ops can wait a round; a wrong green/red row cannot. Within the
        # never-checked rank the stable sort keeps registration order, so
        # ops added in later-imported modules queue behind the older
        # never-checked tail instead of displacing it. Greens order by
        # STALENESS (oldest driver row first): leftover budget re-verifies
        # the rows that have gone longest unchecked, so every green row
        # refreshes round-robin instead of the same early registrations
        # soaking up the slack each round.
        if name in changed:
            return (0, 0)
        if name in failed:
            return (1, 0)
        if name in green:
            return (3, last_seen.get(name, 0))
        return (2, 0)  # never checked

    ordered = sorted(_REGISTRY, key=lambda n: rank(n))  # stable: keeps reg order within rank
    return {name: _REGISTRY[name] for name in ordered}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in all_specs().items() if spec.sql is not None}
