"""Graded-similarity sweep for incremental_minhash_tick (round 8).

tests/test_incremental_sweep.py's churn sweep uses a binary-content
scheme — every est is 1.0 or ~0 — so it never exercises the tick's
graded machinery: intermediate signature-estimated Jaccards, best-match
selection among MULTIPLE index/batch candidates with distinct
estimates, max-struct tie-breaks, or the within-batch bucket cap. This
sweep covers that regime with a different validity argument: the
seeded-xxhash64 sketch is taken as GROUND TRUTH (minhash_index_rows is
deterministic, and the tick provably computes the identical rows
internally), and a pure-Python model replicates the tick's documented
relational contract over those sketches — band collision is positional
hash equality, est = round(agreeing positions / 32, 6) (exact: every
k/32 is a 5-decimal binary fraction, so rounding is the identity in
both engines), index match preferred over in-batch, ties to the lowest
id, buckets over ``max_bucket_size`` dropped from the self-join, twins
inheriting the rep's index decision with the self-reference and
twin-replay guards.

Corpora are mutation families: a base token list plus siblings with a
random fraction of tokens replaced, yielding a spread of shingle
overlaps, multiple competing candidates per doc, partial band
collisions — plus identical twins, exact replays, same-id-new-content
rows, and NULL/'' texts from the churn move set. One parametrization
runs ``max_bucket_size=2`` so 3+-row buckets really are dropped while
2-row buckets still pair (the cap path the sf fixtures never reach).
"""

from __future__ import annotations

import random

from etl_to_iceberg_spark.caching import release_frame
from collections import Counter

import pytest

from etl_to_iceberg_spark.ext.incremental import (
    incremental_minhash_tick,
    minhash_index_rows,
)

Sketch = tuple[int, tuple[int, ...], tuple[int, ...]]  # id, sig, band_hashes


def _est(a: tuple[int, ...], b: tuple[int, ...]) -> float:
    return round(sum(x == y for x, y in zip(a, b)) / len(a), 6)


def _model_tick(
    index: list[Sketch],
    batch: list[Sketch],
    *,
    threshold: float,
    cap: int | None,
) -> dict[int, tuple]:
    """doc_id -> (dup_of, est_jaccard, is_new, already_ingested), the
    tick's contract computed from the sketches alone."""
    rep_of: dict[tuple[int, ...], int] = {}
    for d, s, _ in sorted(batch):
        rep_of.setdefault(s, d)
    reps = [(d, s, bh) for d, s, bh in batch if rep_of[s] == d]

    # rep x index: >=1 positional band collision, est >= threshold
    raw: list[tuple[int, int, float]] = []
    for d, s, bh in reps:
        for xd, xs, xbh in index:
            if any(h == xh for h, xh in zip(bh, xbh)):
                e = _est(s, xs)
                if e >= threshold:
                    raw.append((d, xd, e))
    replay_reps = {d for d, xd, e in raw if xd == d and e == 1.0}
    self_hits: dict[int, set[int]] = {}  # rep -> index ids seen at est 1.0
    for d, xd, e in raw:
        if e == 1.0:
            self_hits.setdefault(d, set()).add(xd)
    idx_best: dict[int, tuple[int, float]] = {}
    for d, xd, e in raw:
        if xd == d:
            continue
        cur = idx_best.get(d)
        if cur is None or (e, -xd) > (cur[1], -cur[0]):
            idx_best[d] = (xd, e)

    # within-batch over reps: drop banded rows in buckets larger than cap
    n_in_bucket = Counter(
        (band, h) for _, _, bh in reps for band, h in enumerate(bh)
    )
    buckets: dict[tuple[int, int], list[tuple[int, tuple[int, ...]]]] = {}
    for d, s, bh in reps:
        for band, h in enumerate(bh):
            if cap is None or n_in_bucket[(band, h)] <= cap:
                buckets.setdefault((band, h), []).append((d, s))
    pair_est: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        for a, sa in members:
            for b, sb in members:
                if a < b:
                    e = _est(sa, sb)
                    if e >= threshold:
                        pair_est[(b, a)] = e
    batch_best: dict[int, tuple[int, float]] = {}
    for (b, a), e in pair_est.items():
        cur = batch_best.get(b)
        if cur is None or (e, -a) > (cur[1], -cur[0]):
            batch_best[b] = (a, e)

    out: dict[int, tuple] = {}
    for d, s, bh in batch:
        rep = rep_of[s]
        if d == rep:
            im, bm = idx_best.get(d), batch_best.get(d)
            match = im or bm
            out[d] = (
                match[0] if match else None,
                match[1] if match else None,
                match is None and d not in replay_reps,
                d in replay_reps,
            )
        else:
            im = idx_best.get(rep)
            inherited = im if im is not None and im[0] != d else None
            out[d] = (
                inherited[0] if inherited else rep,
                inherited[1] if inherited else 1.0,
                False,
                d in self_hits.get(rep, set()),
            )
    return out


_VOCAB_STEP = 1000  # family f owns tokens f*1000 .. f*1000+999


def _family_base(rng: random.Random, family: int, n_tokens: int) -> list[str]:
    return [
        f"w{family * _VOCAB_STEP + rng.randrange(_VOCAB_STEP)}"
        for _ in range(n_tokens)
    ]


def _mutate(rng: random.Random, base: list[str], frac: float) -> str:
    """Replace ~frac of the base tokens with globally-fresh ones."""
    toks = list(base)
    for i in range(len(toks)):
        if rng.random() < frac:
            toks[i] = f"m{rng.randrange(10**9)}"
    return " ".join(toks)


def _gen_batches(rng: random.Random, n_ticks: int, max_batch: int):
    """Batches of (doc_id, text): mutation families (graded overlap),
    identical twins, exact replays of ingested rows, same-id-new-content,
    and nullish texts. Ids unique within a batch (tick contract)."""
    next_id = 0
    bases: list[list[str]] = []
    texts: list[str | None] = []  # every text ever emitted (dup targets)
    ingested: list[tuple[int, str | None]] = []  # rows a tick may replay
    batches: list[list[tuple[int, str | None]]] = []
    for _ in range(n_ticks):
        batch: list[tuple[int, str | None]] = []
        used: set[int] = set()
        if bases and rng.random() < 0.5:
            # flood: 4 suffix-extended siblings of one family in ONE
            # batch — appending a unique token leaves every original
            # shingle intact, so the sigs are distinct (no twin
            # collapse) yet agree in most 4-hash bands: 3+-row buckets
            # exist and a small cap really drops them
            base = rng.choice(bases)
            for _ in range(4):
                batch.append(
                    (next_id, " ".join(base) + f" u{rng.randrange(10**9)}")
                )
                used.add(next_id)
                texts.append(batch[-1][1])
                next_id += 1
        for _ in range(rng.randint(2, max_batch)):
            move = rng.random()
            if move < 0.35 or not bases:  # new family base
                base = _family_base(rng, len(bases), rng.randint(12, 24))
                bases.append(base)
                doc = (next_id, " ".join(base))
                next_id += 1
            elif move < 0.60:  # graded sibling of a random family
                doc = (
                    next_id,
                    _mutate(rng, rng.choice(bases), rng.choice((0.1, 0.3, 0.6))),
                )
                next_id += 1
            elif move < 0.72 and texts:  # identical twin, new id
                doc = (next_id, rng.choice(texts))
                next_id += 1
            elif move < 0.82 and ingested:  # exact replay
                doc = rng.choice(ingested)
            elif move < 0.90 and ingested:  # same id, new content
                rid, _ = rng.choice(ingested)
                doc = (rid, _mutate(rng, rng.choice(bases), 0.9))
            else:  # nullish
                doc = (next_id, None if rng.random() < 0.5 else "")
                next_id += 1
            if doc[0] in used:
                continue
            used.add(doc[0])
            batch.append(doc)
            if doc[1] is not None:
                texts.append(doc[1])
        batches.append(batch)
        # rough replay pool (authoritative labels come from the model)
        for row in batch:
            if row not in ingested:
                ingested.append(row)
    return batches


@pytest.mark.parametrize(
    "seed,threshold,cap",
    [(81, 0.5, 256), (82, 0.3, 256), (83, 0.5, 2), (84, 0.3, 2)],
)
def test_minhash_tick_graded_corpora_match_sketch_model(
    spark, seed, threshold, cap
):
    """3 programs x 3 ticks per parametrization: full labels (dup_of,
    est_jaccard, is_new, already_ingested) must equal the sketch-level
    model after every tick, with the index maintained by the callers'
    append-is_new contract on both sides."""
    for prog_i in range(3):
        rng = random.Random(100 * seed + prog_i)
        index_rows: list[Sketch] = []
        for batch in _gen_batches(rng, n_ticks=3, max_batch=8):
            bdf = spark.createDataFrame(batch, "doc_id long, text string")
            sketches: list[Sketch] = [
                (r.doc_id, tuple(r.sig), tuple(r.band_hashes))
                for r in minhash_index_rows(bdf).collect()
            ]
            idx_df = spark.createDataFrame(
                [(d, list(s), list(bh)) for d, s, bh in index_rows] or [],
                "doc_id long, sig array<bigint>, band_hashes array<bigint>",
            )
            caches: list = []
            rows = incremental_minhash_tick(
                idx_df, bdf, threshold=threshold, max_bucket_size=cap,
                caches=caches,
            ).collect()
            want = _model_tick(
                index_rows, sketches, threshold=threshold, cap=cap
            )
            got = {
                r.doc_id: (r.dup_of, r.est_jaccard, r.is_new, r.already_ingested)
                for r in rows
            }
            assert got == want, f"seed={seed} prog={prog_i}"
            new_ids = {r.doc_id for r in rows if r.is_new}
            index_rows.extend(s for s in sketches if s[0] in new_ids)
            for c in caches:
                release_frame(c)
