"""Seeded randomized sweeps for the r8 corpus ops vs pure-Python models.

The parity suite checks corpus_importance_resample and text_tfidf_topk
against their DuckDB oracles — but oracle SQL shares the operators'
RELATIONAL shape, so a shared misreading (wrong smoothing denominator,
df counted over tokens instead of docs, rank on the unrounded score)
would pass parity on both sides. These sweeps re-derive the documented
math from scratch in pure Python — dict counters, explicit HALF_UP
decimal quantization matching Spark's DECIMAL(20,9)/round(…,6) casts,
Spark's exact percentile interpolation formula — over randomized
corpora with planted edges the sf fixtures never produce: tokenless
docs, a single-language corpus (every importance weight identical, so
the strict above-median rule keeps NOTHING), rounded-tfidf ties that
must break by token, and docs with fewer than k distinct terms.
"""

from __future__ import annotations

import math
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

_LANGS = ["en", "de", "fr"]
# Per-lang token preferences: overlapping vocabularies with different
# weights so log ratios take a spread of values (not two point masses).
_VOCAB = [f"w{i}" for i in range(24)]


def _gen_corpus(seed: int, only_en: bool = False):
    rng = random.Random(seed)
    rows = []
    for doc_id in range(rng.randint(18, 30)):
        lang = "en" if only_en else rng.choice(_LANGS)
        if rng.random() < 0.12:
            text = rng.choice(["", "?!?", "---"])  # tokenless
        else:
            bias = _LANGS.index(lang)
            n = rng.randint(1, 20)
            # lang-dependent triangular-ish preference over the vocab
            toks = [
                _VOCAB[min(23, int(abs(rng.gauss(bias * 8, 5))))]
                for _ in range(n)
            ]
            text = " ".join(toks)
        rows.append((doc_id, text, lang))
    return rows


def _toks(text: str) -> list[str]:
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _q(x: float, exp: str) -> float:
    """Spark's HALF_UP decimal cast/round on the exact double value."""
    return float(Decimal(x).quantize(Decimal(exp), rounding=ROUND_HALF_UP))


def _spark_percentile(vals: list[float], p: float) -> float:
    """percentile()'s exact linear interpolation, same double ops."""
    s = sorted(vals)
    i = p * (len(s) - 1)
    lo = int(math.floor(i))
    hi = int(math.ceil(i))
    if lo == hi:
        return s[lo]
    return s[lo] + (i - lo) * (s[hi] - s[lo])


def _model_resample(rows):
    cnt_r: Counter = Counter()
    cnt_t: Counter = Counter()
    doc_toks = {}
    for doc_id, text, lang in rows:
        ts = _toks(text)
        if ts:
            doc_toks[doc_id] = (lang, ts)
            cnt_r.update(ts)
            if lang == "en":
                cnt_t.update(ts)
    n_r, n_t, v = sum(cnt_r.values()), sum(cnt_t.values()), len(cnt_r)
    llr_nanos = {
        tok: int(
            Decimal(
                math.log((cnt_t[tok] + 1) / float(n_t + v))
                - math.log((cnt_r[tok] + 1) / float(n_r + v))
            ).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
            .scaleb(9)
        )
        for tok in cnt_r
    }
    scored = {}
    for doc_id, (lang, ts) in doc_toks.items():
        total = sum(llr_nanos[t] for t in ts)  # exact integer sum
        weight = _q(float(Decimal(total).scaleb(-9)) / len(ts), "1e-6")
        scored[doc_id] = (lang, len(ts), weight)
    if not scored:
        return {}
    w50 = _q(_spark_percentile([w for _, _, w in scored.values()], 0.5), "1e-6")
    return {
        doc_id: (lang, n, w)
        for doc_id, (lang, n, w) in scored.items()
        if w > w50
    }


def _model_tfidf_topk(rows, k=3):
    n_docs = len(rows)
    tf = {}
    for doc_id, text, _ in rows:
        for tok, c in Counter(_toks(text)).items():
            tf[(doc_id, tok)] = c
    df: Counter = Counter(tok for _, tok in tf)
    out = {}
    per_doc: dict[int, list] = {}
    for (doc_id, tok), c in tf.items():
        score = _q(c * (math.log(float(n_docs)) - math.log(float(df[tok]))), "1e-6")
        per_doc.setdefault(doc_id, []).append((-score, tok, c))
    for doc_id, terms in per_doc.items():
        for rk, (neg, tok, c) in enumerate(sorted(terms)[:k], start=1):
            out[(doc_id, rk)] = (tok, c, -neg)
    return out


def _write(spark, tmp_path, rows, sub):
    d = tmp_path / sub
    spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_importance_resample_matches_model(spark, tmp_path, seed):
    from etl_to_iceberg_spark.ext.corpus_queries import (
        corpus_importance_resample,
    )

    rows = _gen_corpus(seed)
    sf = _write(spark, tmp_path, rows, f"s{seed}")
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.weight)
        for r in corpus_importance_resample(spark, sf).collect()
    }
    assert got == _model_resample(rows)


def test_importance_resample_single_language_keeps_nothing(spark, tmp_path):
    """All-en corpus: every token's target and raw distributions coincide,
    so every doc gets the identical constant weight, the median equals it,
    and the strict above-median rule keeps zero docs — the degenerate edge
    a 'keep top half' implementation with >= would silently invert."""
    from etl_to_iceberg_spark.ext.corpus_queries import (
        corpus_importance_resample,
    )

    rows = _gen_corpus(99, only_en=True)
    sf = _write(spark, tmp_path, rows, "onlyen")
    assert _model_resample(rows) == {}
    assert corpus_importance_resample(spark, sf).count() == 0


@pytest.mark.parametrize("seed", [21, 22, 23, 24])
def test_tfidf_topk_matches_model(spark, tmp_path, seed):
    from etl_to_iceberg_spark.ext.corpus_queries import text_tfidf_topk

    rows = _gen_corpus(seed)
    sf = _write(spark, tmp_path, rows, f"t{seed}")
    got = {
        (r.doc_id, r.rk): (r.token, r.tf, r.tfidf)
        for r in text_tfidf_topk(spark, sf).collect()
    }
    assert got == _model_tfidf_topk(rows)


def _cos6(a, b):
    """ext.similarity.cosine + round(…,6), replicated operation-for-
    operation: sequential left-to-right fold for dot and norms (the
    F.aggregate contract), double division, HALF_UP quantization."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    for x in a:
        na = na + x * x
    for y in b:
        nb = nb + y * y
    return _q(dot / (math.sqrt(na) * math.sqrt(nb)), "1e-6")


def _model_knn_graph(vecs, cents, k, cap):
    assign = {}
    for vid, v in vecs:
        best = min(
            ((-_cos6(v, cv), cell) for cell, cv in cents),
        )
        assign[vid] = best[1]
    sizes = Counter(assign.values())
    kept = {vid: c for vid, c in assign.items() if sizes[c] <= cap}
    out = {}
    for vid, cell in kept.items():
        v = dict(vecs)[vid]
        nbrs = sorted(
            (-_cos6(v, dict(vecs)[o]), o)
            for o, c2 in kept.items()
            if c2 == cell and o != vid
        )
        for rk, (neg, o) in enumerate(nbrs[:k], start=1):
            out[(vid, rk)] = (o, cell, -neg)
    return out


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_knn_graph_matches_model(spark, seed):
    """Randomized vectors + randomized quantizer vs a from-scratch model
    of assignment (rounded-cosine max, cell tiebreak), the cluster-size
    cap, and per-vector top-k ordering — with a cap small enough that
    some clusters really are dropped."""
    from etl_to_iceberg_spark.ext.similarity import knn_graph

    rng = random.Random(seed)
    dim = 6
    vecs = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(40)
    ]
    cents = [
        (c, [rng.gauss(0, 1) for _ in range(dim)]) for c in range(4)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")
    got = {
        (r.vec_id, r.rk): (r.nbr_id, r.cell, r.cos_sim)
        for r in knn_graph(emb, cdf, k=3, max_cluster_size=14).collect()
    }
    model = _model_knn_graph(vecs, cents, k=3, cap=14)
    assert got == model
    # the sweep is only meaningful if the cap actually dropped something
    sizes = Counter(
        min(((-_cos6(v, cv), cell) for cell, cv in cents))[1]
        for _, v in vecs
    )
    assert any(s > 14 for s in sizes.values()) or seed != 31
