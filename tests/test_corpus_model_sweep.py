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
    if na == 0.0 or nb == 0.0:
        return -1.0  # the engine's zero-norm convention (DuckDB's)
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


# --- Gopher quality rules (r9: all seven named rules) ----------------------

_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _model_gopher(rows):
    """text_gopher_quality re-derived from the paper's rule list in pure
    Python: \\S+ words, char-count word length, ≥1-alphabetic-char word
    fraction, '#'/'...' occurrence ratios, bullet/ellipsis line
    fractions over non-blank lines, distinct-stopword hits — each ratio
    HALF_UP-rounded to 6dp like the engine's round(…, 6)."""
    import re

    out = {}
    for doc_id, text, _ in rows:
        text = text or ""
        ws = re.findall(r"\S+", text)
        lines = [l for l in text.split("\n") if l.strip(" ") != ""]
        n = len(ws)
        wc = n
        mean_len = _q(sum(len(w) for w in ws) / n, "1e-6") if n else 0.0
        alpha = (
            _q(sum(1 for w in ws if re.search("[A-Za-z]", w)) / n, "1e-6")
            if n
            else 0.0
        )
        hashes = len(re.findall("#", text))
        dots = len(re.findall(r"\.\.\.", text))
        hash_ratio = _q(hashes / n, "1e-6") if n else 0.0
        ell_ratio = _q(dots / n, "1e-6") if n else 0.0
        nl = len(lines)
        bullet = (
            _q(
                sum(
                    1
                    for l in lines
                    if l.lstrip(" ").startswith(("-", "*", "•"))
                )
                / nl,
                "1e-6",
            )
            if nl
            else 0.0
        )
        ell_line = (
            _q(
                sum(
                    1
                    for l in lines
                    if l.rstrip(" ").endswith(("...", "…"))
                )
                / nl,
                "1e-6",
            )
            if nl
            else 0.0
        )
        lowered = {w.lower() for w in ws}
        sw = sum(1 for s in _STOPWORDS if s in lowered)
        passes = (
            50 <= wc <= 100000
            and 3 <= mean_len <= 10
            and alpha >= 0.8
            and hash_ratio < 0.1
            and ell_ratio < 0.1
            and bullet <= 0.9
            and ell_line <= 0.3
            and sw >= 2
        )
        out[doc_id] = (
            wc, mean_len, alpha, hash_ratio, ell_ratio, bullet, ell_line,
            sw, passes,
        )
    return out


_GOPHER_WORDS = (
    _STOPWORDS
    + ["alpha", "bravo", "charlie", "delta", "interchange", "quantum"]
    + ["12345", "9", "#tag", "x1", "...", "---", "•"]
)


def _gen_gopher_corpus(seed: int):
    rng = random.Random(seed)
    rows = []
    for doc_id in range(rng.randint(14, 22)):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            n = rng.randint(0, 40)
            toks = [rng.choice(_GOPHER_WORDS) for _ in range(n)]
            line = " ".join(toks)
            r = rng.random()
            if r < 0.15:
                line = "- " + line  # bullet-led
            elif r < 0.25:
                line = line + " ..."  # ellipsis-ended
            elif r < 0.3:
                line = "   "  # blank (must not count as a line)
            lines.append(line)
        rows.append((doc_id, "\n".join(lines), "en"))
    # planted edges the random mix may miss:
    rows.append((9000, "", "en"))  # empty doc: every ratio guards /0
    rows.append((9001, "12 34 56", "en"))  # short all-numeric
    return rows


@pytest.mark.parametrize("seed", [41, 42, 43, 44])
def test_gopher_quality_matches_model(spark, tmp_path, seed):
    from etl_to_iceberg_spark.ext.corpus_queries import text_gopher_quality

    rows = _gen_gopher_corpus(seed)
    sf = _write(spark, tmp_path, rows, f"g{seed}")
    got = {
        r.doc_id: (
            r.word_count, r.mean_word_len, r.alpha_word_frac, r.hash_ratio,
            r.ellipsis_ratio, r.bullet_frac, r.ellipsis_line_frac,
            r.stopword_hits, r.passes,
        )
        for r in text_gopher_quality(spark, sf).collect()
    }
    assert got == _model_gopher(rows)


def test_gopher_alphabetic_rule_flips_numeric_table(spark, tmp_path):
    """A document that satisfies every OTHER rule — 100 clean words, two
    stopwords, no symbols or bullets — but is 75% numeric tokens must
    fail on alpha_word_frac alone (the r9 rule; a 6-rule implementation
    would pass it)."""
    from etl_to_iceberg_spark.ext.corpus_queries import text_gopher_quality

    words = ["12345"] * 75 + ["the", "and"] + ["steady"] * 23
    rows = [(0, " ".join(words), "en")]
    sf = _write(spark, tmp_path, rows, "numtab")
    (r,) = text_gopher_quality(spark, sf).collect()
    assert r.word_count == 100 and r.stopword_hits >= 2
    assert 3 <= r.mean_word_len <= 10
    assert r.hash_ratio < 0.1 and r.ellipsis_ratio < 0.1
    assert r.bullet_frac <= 0.9 and r.ellipsis_line_frac <= 0.3
    assert r.alpha_word_frac == 0.25
    assert r.passes is False  # fails ONLY the alphabetic-words rule


# --- semantic clusters (r9 composite: mutual-kNN + components) -------------


def _model_semantic_clusters(vecs, cents, k, cap, thr):
    """semantic_clusters from scratch: model kNN graph → mutual edges at
    ≥ thr on the ROUNDED cosine → min-label union-find over every
    corpus vector (singletons stay their own cluster)."""
    knn = _model_knn_graph(vecs, cents, k, cap)
    directed = {}
    for (vid, _rk), (nbr, _cell, cos) in knn.items():
        directed[(vid, nbr)] = cos
    edges = [
        (a, b)
        for (a, b), cos in directed.items()
        if a < b and cos >= thr and (b, a) in directed
    ]
    parent = {vid: vid for vid, _ in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {vid: find(vid) for vid, _ in vecs}
    sizes = Counter(labels.values())
    return {
        vid: (lab, sizes[lab], vid == lab) for vid, lab in labels.items()
    }


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_semantic_clusters_matches_model(spark, seed):
    """Planted near-duplicate families (base vector + tiny perturbations,
    in-family cosine ≈ 1) among isolated noise vectors, randomized
    quantizer: the full composite — cell-blocked kNN, mutual-kNN edge
    selection at the threshold, min-label components, cluster sizes and
    the canonical flag — must match the union-find model exactly."""
    from etl_to_iceberg_spark.ext.similarity import semantic_clusters

    rng = random.Random(seed)
    dim = 6
    vecs = []
    vid = 0
    for _f in range(rng.randint(3, 5)):  # planted families
        base = [rng.gauss(0, 1) for _ in range(dim)]
        for _ in range(rng.randint(2, 6)):
            vecs.append(
                (vid, [x + rng.gauss(0, 0.01) for x in base])
            )
            vid += 1
    for _ in range(12):  # isolated noise
        vecs.append((vid, [rng.gauss(0, 1) for _ in range(dim)]))
        vid += 1
    cents = [(c, [rng.gauss(0, 1) for _ in range(dim)]) for c in range(3)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")
    got = {
        r.vec_id: (r.cluster_id, r.cluster_size, r.is_canonical)
        for r in semantic_clusters(
            emb, cdf, k=2, threshold=0.5, max_cluster_size=50
        ).collect()
    }
    model = _model_semantic_clusters(vecs, cents, k=2, cap=50, thr=0.5)
    assert got == model
    # a planted family's two mutually-nearest members always form a
    # mutual edge, so the sweep must produce at least one real cluster
    assert any(size >= 2 for _, size, _c in model.values())
    # and the noise keeps at least one singleton canonical
    assert any(size == 1 for _, size, _c in model.values())


# --- Gopher repetition filters (r9) ----------------------------------------


def _model_gopher_repetition(rows):
    """text_gopher_repetition from scratch: Counter-based duplicate-line
    membership (every occurrence of a line seen ≥2 times), char-weighted
    variant, top-2-gram and duplicated-5-gram character fractions over
    total word characters — the occurrences × gram-letters approximation
    the docstring documents, HALF_UP 6dp."""
    import re

    out = {}
    for doc_id, text, _ in rows:
        text = text or ""
        lines = [l for l in text.split("\n") if l.strip(" ") != ""]
        ws = re.findall(r"[a-z0-9]+", text.lower())
        n_lines = len(lines)
        cnt = Counter(lines)
        dup_lines = [l for l in lines if cnt[l] >= 2]
        dlf = _q(len(dup_lines) / n_lines, "1e-6") if n_lines else 0.0
        line_chars = sum(len(l) for l in lines)
        dlcf = (
            _q(sum(len(l) for l in dup_lines) / line_chars, "1e-6")
            if line_chars
            else 0.0
        )
        tc = sum(len(w) for w in ws)

        def grams(n):
            if len(ws) < n:
                return []
            return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]

        g2 = Counter(grams(2))
        top2 = (
            _q(
                max(c * len(g.replace(" ", "")) for g, c in g2.items()) / tc,
                "1e-6",
            )
            if g2 and tc
            else 0.0
        )
        g5 = Counter(grams(5))
        dup5 = (
            _q(
                sum(
                    c * len(g.replace(" ", ""))
                    for g, c in g5.items()
                    if c >= 2
                )
                / tc,
                "1e-6",
            )
            if g5 and tc
            else 0.0
        )
        passes = (
            dlf <= 0.30 and dlcf <= 0.20 and top2 <= 0.20 and dup5 <= 0.15
        )
        out[doc_id] = (n_lines, dlf, dlcf, top2, dup5, passes)
    return out


def _gen_repetition_corpus(seed: int):
    """Small line pool + small vocab so exact line duplicates and
    repeated 2/5-grams actually occur, plus planted pathologies."""
    rng = random.Random(seed)
    vocab = ["the", "fox", "data", "run", "42", "loop", "spark", "row"]
    pool = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8)))
        for _ in range(6)
    ]
    rows = []
    for doc_id in range(rng.randint(12, 18)):
        n_lines = rng.randint(1, 8)
        lines = [rng.choice(pool) for _ in range(n_lines)]
        if rng.random() < 0.2:
            lines.append("   ")  # blank line must not count
        rows.append((doc_id, "\n".join(lines), "en"))
    rows.append((9000, "", "en"))  # empty doc
    # clean doc: long enough that its single biggest 2-gram covers <20%
    # of chars (the metric inherently fails very short docs — Gopher
    # applies repetition after the ≥50-word quality gate)
    rows.append(
        (9001, " ".join(f"word{i} item{i}" for i in range(20)), "en")
    )
    rows.append((9002, "\n".join(["same line again"] * 30), "en"))  # all-dup
    rows.append((9003, " ".join(["alpha beta gamma delta eps"] * 30), "en"))
    return rows


@pytest.mark.parametrize("seed", [61, 62, 63, 64])
def test_gopher_repetition_matches_model(spark, tmp_path, seed):
    from etl_to_iceberg_spark.ext.corpus_queries import text_gopher_repetition

    rows = _gen_repetition_corpus(seed)
    sf = _write(spark, tmp_path, rows, f"r{seed}")
    got = {
        r.doc_id: (
            r.n_lines, r.dup_line_frac, r.dup_line_char_frac,
            r.top2_char_frac, r.dup5_char_frac, r.passes,
        )
        for r in text_gopher_repetition(spark, sf).collect()
    }
    model = _model_gopher_repetition(rows)
    assert got == model
    # planted pathologies flip the verdict...
    assert got[9002][1] == 1.0 and got[9002][5] is False  # all-dup lines
    assert got[9003][4] > 1.0 and got[9003][5] is False  # looped phrase
    # ...and clean docs keep it
    assert got[9001][5] is True
    assert got[9000] == (0, 0.0, 0.0, 0.0, 0.0, True)  # empty doc


# --- C4 heuristics (r9) ----------------------------------------------------


def _model_c4(rows):
    import re

    out = {}
    for doc_id, text, _ in rows:
        t = text or ""
        lt = t.lower()
        lines = [l for l in t.split("\n") if l.strip(" ") != ""]

        def wc(s):
            return len(re.findall(r"[a-z0-9]+", s.lower()))

        kept = [
            l
            for l in lines
            if l.rstrip(" ").endswith((".", "!", "?", '"')) and wc(l) >= 5
        ]
        rlf = _q(len(kept) / len(lines), "1e-6") if lines else 0.0
        sents = [s for s in re.split(r"[.!?]", t) if wc(s) >= 3]
        brace = "{" in t
        lorem = "lorem ipsum" in lt
        js = any("javascript" in re.findall(r"[a-z0-9]+", l.lower()) for l in lines)
        passes = len(sents) >= 3 and not brace and not lorem
        out[doc_id] = (len(lines), rlf, len(sents), brace, lorem, js, passes)
    return out


def _gen_c4_corpus(seed: int):
    rng = random.Random(seed)
    frag = ["the data is here", "we run spark jobs", "rows scan fast", "ok"]
    rows = []
    for doc_id in range(rng.randint(12, 18)):
        lines = []
        for _ in range(rng.randint(1, 6)):
            s = " ".join(rng.choice(frag) for _ in range(rng.randint(1, 3)))
            r = rng.random()
            if r < 0.5:
                s += rng.choice([".", "!", "?", '"'])
            if r > 0.9:
                s += " {code}"
            lines.append(s)
        rows.append((doc_id, "\n".join(lines), "en"))
    rows.append((9000, "", "en"))
    rows.append((9001, "Lorem Ipsum dolor sit amet. More words here. And a third sentence now.", "en"))
    rows.append((9002, "Click here to enable javascript in your browser now.\nThe data is here to stay. We run spark jobs daily. Rows scan fast always.", "en"))
    rows.append((9003, "The data is here to stay. We run spark jobs daily. Rows scan fast always.", "en"))
    return rows


@pytest.mark.parametrize("seed", [71, 72, 73, 74])
def test_c4_quality_matches_model(spark, tmp_path, seed):
    from etl_to_iceberg_spark.ext.corpus_queries import text_c4_quality

    rows = _gen_c4_corpus(seed)
    sf = _write(spark, tmp_path, rows, f"c{seed}")
    got = {
        r.doc_id: (
            r.n_lines, r.retained_line_frac, r.n_sentences,
            r.has_curly_brace, r.has_lorem_ipsum, r.has_javascript_line,
            r.passes,
        )
        for r in text_c4_quality(spark, sf).collect()
    }
    model = _model_c4(rows)
    assert got == model
    assert got[9001][4] is True and got[9001][6] is False  # lorem drops page
    assert got[9002][5] is True and got[9002][6] is True  # js flags line only
    assert got[9003][6] is True and got[9003][1] == 1.0  # clean page passes
    assert got[9000] == (0, 0.0, 0, False, False, False, False)


# --- quantizer refresh audit (r9) ------------------------------------------


def _model_refresh(vecs, old, new):
    matched = {}
    for nc, nv in new:
        best = min((-_cos6(nv, ov), oc) for oc, ov in old)
        matched[nc] = (best[1], -best[0])
    occ = Counter(
        min((-_cos6(v, nv), nc) for nc, nv in new)[1] for _, v in vecs
    )
    return {
        nc: (oc, drift, occ.get(nc, 0))
        for nc, (oc, drift) in matched.items()
    }


@pytest.mark.parametrize("seed", [81, 82, 83])
def test_quantizer_refresh_matches_model(spark, seed):
    """Randomized old/new quantizers over random vectors, plus planted
    structure: new cell 0 IS old cell 2 (drift exactly 1.0 after
    rounding) and one new cell placed opposite everything — the model
    re-derives matching, drift, and occupancy from scratch."""
    from etl_to_iceberg_spark.ext.similarity import quantizer_refresh_report

    rng = random.Random(seed)
    dim = 6
    vecs = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(40)]
    old = [(c, [rng.gauss(0, 1) for _ in range(dim)]) for c in range(4)]
    new = [(0, list(old[2][1]))] + [  # planted: unchanged cell
        (c, [rng.gauss(0, 1) for _ in range(dim)]) for c in range(1, 4)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    odf = spark.createDataFrame(old, "cell int, __cent array<double>")
    ndf = spark.createDataFrame(new, "cell int, __cent array<double>")
    got = {
        r.cell: (r.old_cell, r.cos_to_old, r.n_assigned)
        for r in quantizer_refresh_report(emb, odf, ndf).collect()
    }
    model = _model_refresh(vecs, old, new)
    assert got == model
    assert got[0][0] == 2 and got[0][1] == 1.0  # planted identity match
    assert sum(n for _, _, n in got.values()) == len(vecs)  # total occupancy


# --- Bloom decontamination membership (r9) -----------------------------------


def _model_bloom_hits(eval_shingles, candidates, k):
    """Pure-Python partitioned-Bloom verdicts: candidate is positive iff
    every one of its k (seed, idx) positions was set by SOME eval
    shingle — false positives arise exactly when different shingles
    cover all k positions."""
    from etl_to_iceberg_spark.ext.bloom import model_positions

    bits = set()
    for s in eval_shingles:
        bits.update(model_positions(s, k=k))
    return [
        all(p in bits for p in model_positions(c, k=k)) for c in candidates
    ]


@pytest.mark.parametrize("seed,k,n_eval", [(91, 3, 300), (92, 1, 50_000)])
def test_bloom_membership_matches_model(spark, seed, k, n_eval):
    """Engine Bloom verdicts == the pure-Python model on every candidate
    — true members, misses, AND false positives. The k=1 / dense-eval
    case raises the fill factor (~5%) until FPs genuinely occur; md5 is
    deterministic so the planted strings give a fixed outcome."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.bloom import (
        bloom_bitmap,
        bloom_contains_expr,
    )

    rng = random.Random(seed)
    eval_sh = [f"ev {seed} {i} shingle" for i in range(n_eval)]
    cands, want_member = [], []
    for i in range(400):
        member = rng.random() < 0.1
        cands.append(
            rng.choice(eval_sh) if member else f"cand {seed} {i} novel"
        )
        want_member.append(member)

    ev = spark.createDataFrame([(s,) for s in eval_sh], "s string")
    bm = bloom_bitmap(ev, k=k)
    cdf = spark.createDataFrame(
        [(i, [c]) for i, c in enumerate(cands)], "i long, sh array<string>"
    )
    got_hits = sorted(
        r.i
        for r in cdf.crossJoin(F.broadcast(bm))
        .where(F.expr(bloom_contains_expr("sh", k=k)))
        .collect()
    )
    model = _model_bloom_hits(eval_sh, cands, k)
    assert got_hits == [i for i, h in enumerate(model) if h]
    # every true member must hit (Bloom has no false negatives)
    assert all(model[i] for i, m in enumerate(want_member) if m)
    fps = [i for i, m in enumerate(want_member) if model[i] and not m]
    if k == 1:  # dense case: the FP path is genuinely exercised
        assert fps, "expected at least one false positive at ~5% fill"
    else:  # 3 seeds at tiny fill: FPs astronomically unlikely
        assert not fps


# --- token-budgeted quality mix (r9) ----------------------------------------


def _model_quality6(text):
    import re

    toks = re.findall(r"[a-z0-9]+", text.lower())
    wc = len(toks)
    nonspace = len(re.sub(r"\s", "", text))
    alnum = len(re.sub(r"[^A-Za-z0-9]", "", text))
    sw = sum(
        1
        for t in toks
        if t in {"the", "and", "of", "to", "is", "in", "that", "with"}
    )
    punct = (nonspace - alnum) / nonspace if nonspace > 0 else 0.0
    swr = sw / wc if wc else 0.0
    q = (
        0.4 * (min(wc, 100) / 100.0)
        + 0.3 * (1.0 - punct)
        + 0.3 * min(4.0 * swr, 1.0)
    )
    return _q(q, "0.000001")


def _model_budget_mix(rows, budget):
    """rows: (doc_id, text, source). Whole 2dp quality tiers admitted
    best-first per source while cumulative tokens stay within budget."""
    per_src = {}
    scored = []
    for doc_id, text, src in rows:
        n_tok = len(_toks(text))
        qb = _q(_model_quality6(text), "0.01")
        scored.append((doc_id, src, n_tok, qb))
        per_src.setdefault(src, {}).setdefault(qb, 0)
        per_src[src][qb] += n_tok
    kept_tiers = set()
    for src, tiers in per_src.items():
        cum = 0
        for qb in sorted(tiers, reverse=True):
            cum += tiers[qb]
            if cum > budget:
                break
            kept_tiers.add((src, qb))
    return sorted(
        (d, s, n, qb) for d, s, n, qb in scored if (s, qb) in kept_tiers
    )


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_token_budget_mix_matches_model(spark, tmp_path, seed):
    """Randomized multi-source corpora with a spread of quality scores;
    one planted tiny source must be admitted in full (its total is under
    budget) and at least one doc must be dropped somewhere."""
    from etl_to_iceberg_spark.ext.corpus_queries import (
        _TOKEN_BUDGET,
        corpus_token_budget_mix,
    )

    rng = random.Random(seed)
    sw = ["the", "and", "of", "to", "is", "in", "that", "with"]
    rows = []
    doc_id = 0
    for src in ["sa", "sb", "sc"]:
        for _ in range(rng.randint(10, 16)):
            n = rng.randint(30, 110)
            toks = [
                rng.choice(sw)
                if rng.random() < rng.random() * 0.6
                else rng.choice(_VOCAB)
                for _ in range(n)
            ]
            if rng.random() < 0.2:
                toks.append("!!!???...")  # punctuation drag on quality
            rows.append((doc_id, " ".join(toks), src))
            doc_id += 1
    rows.append((doc_id, "tiny low doc", "sd"))  # planted under-budget source
    d = tmp_path / "mix"
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    got = sorted(
        (r.doc_id, r.source, r.n_tokens, r.quality_tier)
        for r in corpus_token_budget_mix(spark, str(d)).collect()
    )
    model = _model_budget_mix(rows, _TOKEN_BUDGET)
    assert got == model
    assert any(s == "sd" for _, s, _, _ in got)  # tiny source fully kept
    assert len(got) < len(rows)  # the budget genuinely dropped docs


# --- character-entropy filter (r9) ------------------------------------------


def _model_entropy(text):
    cs = list(text.lower())
    n = len(cs)
    if n == 0:
        return (0, 0, 0.0, False)
    cnt = Counter(cs)
    total = Decimal(0)
    for _, c in cnt.items():
        p = c / n
        total += Decimal(p * math.log2(p)).quantize(
            Decimal("0.000000001"), rounding=ROUND_HALF_UP
        )
    ent = _q(float(-total), "0.000001")
    return (n, len(cnt), ent, ent >= 2.5)


@pytest.mark.parametrize("seed", [111, 112])
def test_entropy_filter_matches_model(spark, tmp_path, seed):
    """Randomized docs plus planted degenerates: empty text, a
    repeated-char flood (entropy 0), a two-char alternation (entropy 1)
    — all must fail the 2.5-bit floor; ordinary prose must pass. The
    model re-derives the quantized fold from scratch, summing in a
    DIFFERENT order than either engine (dict order), which is exactly
    what the DECIMAL(20,9) per-term quantization must make irrelevant."""
    from etl_to_iceberg_spark.ext.corpus_queries import text_entropy_filter

    rng = random.Random(seed)
    rows = [
        (9000, "", "en"),
        (9001, "aaaaaaaaaaaaaaaaaaaaaaaa", "en"),
        (9002, "ababababababababababab", "en"),
        (9003, "The quick brown fox jumps over the lazy dog.", "en"),
    ]
    for i in range(rng.randint(12, 20)):
        n = rng.randint(5, 160)
        rows.append(
            (
                i,
                " ".join(rng.choice(_VOCAB) for _ in range(max(1, n // 4))),
                "en",
            )
        )
    d = _write(spark, tmp_path, [(i, t, la) for i, t, la in rows], "ent")
    got = {
        r.doc_id: (r.n_chars_total, r.n_distinct, r.entropy, r.passes)
        for r in text_entropy_filter(spark, d).collect()
    }
    model = {i: _model_entropy(t) for i, t, _ in rows}
    assert got == model
    assert not got[9000][3] and not got[9001][3] and not got[9002][3]
    assert got[9001][2] == 0.0 and got[9002][2] == 1.0
    assert got[9003][3]


# --- IVF-PQ codes + ADC (r9) --------------------------------------------------


def _qdec(x: float) -> Decimal:
    """Spark's CAST(double AS DECIMAL(20,9)) on the exact double value."""
    return Decimal(x).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)


def _model_pq_codes(vecs, cbs, m, dsub):
    """codes[(vec_id, m)] = argmin over the codebook by (exact decimal
    sum of squared diffs, code) — the engine's window order."""
    codes = {}
    for vid, v in vecs:
        for mi in range(m):
            sv = v[mi * dsub : (mi + 1) * dsub]
            cands = []
            for code, cent in cbs[mi]:
                d2 = sum(
                    (_qdec((a - b) * (a - b)) for a, b in zip(sv, cent)),
                    Decimal(0),
                )
                cands.append((d2, code))
            codes[(vid, mi)] = min(cands)[1]
    return codes


def _model_pq_adc(vecs, queries, cents, cbs, *, m, dsub, nprobe, k):
    """(query_id, vec_id) -> (score, rank) of the full IVF-PQ search."""
    codes = _model_pq_codes(vecs, cbs, m, dsub)
    cell_of = {
        vid: min((-_cos6(v, cv), cell) for cell, cv in cents)[1]
        for vid, v in vecs
    }
    out = {}
    for qid, qv in queries:
        probed = {
            cell
            for _, cell in sorted(
                ((-_cos6(qv, cv), cell) for cell, cv in cents)
            )[:nprobe]
        }
        scored = []
        for vid, _ in vecs:
            if cell_of[vid] not in probed:
                continue
            total = Decimal(0)
            for mi in range(m):
                cent = dict(cbs[mi])[codes[(vid, mi)]]
                qsv = qv[mi * dsub : (mi + 1) * dsub]
                total += sum(
                    (_qdec(a * b) for a, b in zip(qsv, cent)), Decimal(0)
                )
            scored.append((_q(float(total), "1e-6"), vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for r, (score, vid) in enumerate(scored[:k], start=1):
            out[(qid, vid)] = (score, r)
    return out


@pytest.mark.parametrize("seed", [41, 42])
def test_pq_codes_and_adc_match_model(spark, seed):
    """Engine IVF-PQ (codes + ADC ranking) == the pure-Python model on
    seeded random unit vectors, with planted structure: codebook entries
    2 and 3 of subspace 0 are IDENTICAL, so every vector equidistant to
    them must take code 2 (tie broken by code), and query 0 is also
    corpus vector 0 (self should score highly, though PQ quantization
    need not rank it first)."""
    from etl_to_iceberg_spark.ext.similarity import pq_adc_topk, pq_codes

    rng = random.Random(seed)
    m, dsub, ksub, nprobe, k = 2, 4, 4, 2, 5

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    vecs = [(i, unit(m * dsub)) for i in range(30)]
    cents = [(c, unit(m * dsub)) for c in range(3)]
    cbs = {mi: [(j, unit(dsub)) for j in range(ksub)] for mi in range(m)}
    cbs[0][3] = (3, list(cbs[0][2][1]))  # planted duplicate entry
    queries = [(0, list(vecs[0][1])), (99, unit(m * dsub))]

    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")
    cbdf = spark.createDataFrame(
        [(mi, j, cv) for mi, entries in cbs.items() for j, cv in entries],
        "m int, code int, cent array<double>",
    )
    qdf = spark.createDataFrame(
        queries, "query_id long, embedding array<double>"
    )
    from pyspark.sql import functions as F

    c = emb.select("vec_id", F.col("embedding").alias("__v"))
    q = qdf.select("query_id", F.col("embedding").alias("__v"))

    got_codes = {
        (r.vec_id, r.m): r.code
        for r in pq_codes(c, cbdf, m=m, dsub=dsub).collect()
    }
    assert got_codes == _model_pq_codes(vecs, cbs, m, dsub)
    assert 3 not in {
        code for (_, mi), code in got_codes.items() if mi == 0
    }  # the duplicate entry never wins its tie

    got = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in pq_adc_topk(
            c, q, cdf, cbdf, k=k, nprobe=nprobe, m=m, dsub=dsub
        ).collect()
    }
    model = _model_pq_adc(
        vecs, queries, cents, cbs, m=m, dsub=dsub, nprobe=nprobe, k=k
    )
    assert got == model


# --- embedding outlier prune (r9) ---------------------------------------------


def _model_outlier(vecs, cents, margin):
    assigned = {}
    for vid, v in vecs:
        best = min((-_cos6(v, cv), cell) for cell, cv in cents)
        assigned[vid] = (best[1], -best[0])
    means = {}
    for cell in {c for c, _ in assigned.values()}:
        cos = [cs for c, cs in assigned.values() if c == cell]
        means[cell] = _q(
            float(sum((_qdec(x) for x in cos), Decimal(0))) / len(cos), "1e-6"
        )
    return {
        vid: (cell, cs, means[cell], cs < means[cell] - margin)
        for vid, (cell, cs) in assigned.items()
    }


@pytest.mark.parametrize("seed", [51, 52])
def test_embedding_outlier_matches_model(spark, seed):
    """Engine outlier report == the model on seeded vectors clustered
    tightly around 2 centroids, plus ONE planted straggler (orthogonal
    direction, still nearest to centroid 0) that must flag — and the
    tight members must not."""
    from etl_to_iceberg_spark.ext.similarity import embedding_outlier_report

    rng = random.Random(seed)
    dim = 6
    cents = [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0, 1.0] + [0.0] * (dim - 2))]

    def around(axis):
        v = [rng.gauss(0, 0.05) for _ in range(dim)]
        v[axis] += 1.0
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    vecs = [(i, around(i % 2)) for i in range(20)]
    straggler = [0.3, 0.0, 0.0, 0.0, 0.0, 0.954]  # leans to cell 0, far off
    s = math.sqrt(sum(x * x for x in straggler))
    vecs.append((99, [x / s for x in straggler]))

    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")
    got = {
        r.vec_id: (r.cell, r.cos_sim, r.cell_mean, r.is_outlier)
        for r in embedding_outlier_report(emb, cdf, margin=0.1).collect()
    }
    assert got == _model_outlier(vecs, cents, 0.1)
    assert got[99][3] is True  # the planted straggler flags
    assert not any(got[i][3] for i in range(20))  # tight members don't


# --- bigram LM logprob (r9) ----------------------------------------------------


def _model_bigram_logprob(rows, floor=-7.0):
    import re

    pairs = []
    doc_pairs = {}
    for doc_id, text, _ in rows:
        ws = re.findall(r"[a-z0-9]+", text.lower())
        bs = list(zip(ws, ws[1:]))
        doc_pairs[doc_id] = bs
        pairs.extend(bs)
    c1 = Counter(w1 for w1, _ in pairs)
    c12 = Counter(pairs)
    out = {}
    for doc_id, bs in doc_pairs.items():
        if not bs:
            out[doc_id] = (0, None, False)
            continue
        total = sum(
            (_qdec(math.log(c12[b] / float(c1[b[0]]))) for b in bs),
            Decimal(0),
        )
        avg = _q(float(total) / len(bs), "1e-6")
        out[doc_id] = (len(bs), avg, avg >= floor)
    return out


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_bigram_logprob_matches_model(spark, tmp_path, seed):
    """Engine bigram LM == the model on seeded random small-vocab docs,
    with planted degenerates: a single-token doc (0 bigrams, NULL score,
    passes=false), a repeated-token doc ('a a a ...': P(a|a) dominated
    by the corpus, hand-checkable), and one doc of corpus-unique tokens
    (every bigram count 1 but first-position counts vary)."""
    from etl_to_iceberg_spark.ext.corpus_queries import text_bigram_logprob

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))), "en")
        for i in range(25)
    ]
    rows.append((100, "lonely", "en"))  # 0 bigrams
    rows.append((101, " ".join(["a"] * 12), "en"))
    rows.append((102, "zq zr zs zt", "en"))  # corpus-unique chain
    sf = _write(spark, tmp_path, rows, f"bg{seed}")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob, r.passes)
        for r in text_bigram_logprob(spark, sf).collect()
    }
    model = _model_bigram_logprob(rows)
    assert got == model
    assert got[100] == (0, None, False)
    assert got[102][0] == 3  # three unique bigrams


# --- eval overlap report (r9) --------------------------------------------------


def _model_eval_overlap(rows, shingle=8):
    import re

    WORD = re.compile(r"[A-Za-z0-9']+")

    def shingles(text):
        t = WORD.findall(text)
        return {
            " ".join(t[i : i + shingle]) for i in range(len(t) - shingle + 1)
        }

    bench = set()
    for doc_id, text, _ in rows:
        if doc_id % 97 == 0:
            bench |= shingles(text)
    out = {}
    for doc_id, text, _ in rows:
        if doc_id % 97 == 0:
            continue
        sh = shingles(text)
        n = len(sh)
        m = len(sh & bench)
        out[doc_id] = (n, m, _q(m / n, "1e-6") if n else 0.0)
    return out


@pytest.mark.parametrize("seed", [71, 72])
def test_eval_overlap_report_matches_model(spark, tmp_path, seed):
    """Engine overlap rates == the model, with planted structure: doc
    200 copies eval doc 0 verbatim (rate 1.0), doc 201 splices one eval
    shingle into fresh text (0 < rate < 1), doc 202 is shorter than one
    shingle (0/0 -> rate 0)."""
    from etl_to_iceberg_spark.ext.pipeline_queries import (
        corpus_eval_overlap_report,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 40))), "en")
        for i in range(60)
    ]
    eval_text = rows[0][1]  # doc 0 is the eval slice (0 % 97 == 0)
    rows.append((200, eval_text, "en"))
    ev_words = eval_text.split()
    if len(ev_words) >= 8:
        splice = " ".join(ev_words[:8])
        rows.append((201, "x1 x2 x3 " + splice + " x4 x5 x6 x7 x8 x9", "en"))
    rows.append((202, "too short for shingles", "en"))
    sf = _write(spark, tmp_path, rows, f"ov{seed}")
    got = {
        r.doc_id: (r.n_shingles, r.n_matched, r.overlap_rate)
        for r in corpus_eval_overlap_report(spark, sf).collect()
    }
    model = _model_eval_overlap(rows)
    assert got == model
    if len(ev_words) >= 8:
        assert got[200][2] == 1.0
        assert 0.0 < got[201][2] < 1.0
    assert got[202] == (0, 0, 0.0)


# --- IVF-PQ residual (IVFADC) + two-level assignment (r11) -------------------


def _model_pq_res_codes(vecs, cents, cbs, m, dsub):
    """Residual codes: quantize v − its assigned coarse centroid (cell
    by rounded-cosine desc, cell asc — the ivf_assign order), then the
    same decimal-d2 argmin as _model_pq_codes."""
    cell_of = {
        vid: min((-_cos6(v, cv), cell) for cell, cv in cents)[1]
        for vid, v in vecs
    }
    cmap = dict(cents)
    res = [
        (vid, [a - b for a, b in zip(v, cmap[cell_of[vid]])])
        for vid, v in vecs
    ]
    return _model_pq_codes(res, cbs, m, dsub), cell_of


def _model_pq_res_adc(vecs, queries, cents, cbs, *, m, dsub, nprobe, k):
    """Full residual IVF-PQ search: ADC score = exact decimal centroid
    term dot(q, cent_cell) + the per-subspace LUT parts, one double cast
    + round at the end."""
    codes, cell_of = _model_pq_res_codes(vecs, cents, cbs, m, dsub)
    cmap = dict(cents)
    out = {}
    for qid, qv in queries:
        probed = {
            cell
            for _, cell in sorted(
                ((-_cos6(qv, cv), cell) for cell, cv in cents)
            )[:nprobe]
        }
        scored = []
        for vid, _ in vecs:
            cell = cell_of[vid]
            if cell not in probed:
                continue
            total = sum(
                (_qdec(a * b) for a, b in zip(qv, cmap[cell])), Decimal(0)
            )
            for mi in range(m):
                cent = dict(cbs[mi])[codes[(vid, mi)]]
                qsv = qv[mi * dsub : (mi + 1) * dsub]
                total += sum(
                    (_qdec(a * b) for a, b in zip(qsv, cent)), Decimal(0)
                )
            scored.append((_q(float(total), "1e-6"), vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for r, (score, vid) in enumerate(scored[:k], start=1):
            out[(qid, vid)] = (score, r)
    return out


@pytest.mark.parametrize("seed", [61, 62])
def test_pq_residual_adc_matches_model(spark, seed):
    """Engine residual IVF-PQ == the pure-Python IVFADC model, with the
    planted pathologies the raw-PQ sweep can't produce: corpus vector 7
    IS centroid 1 (residual exactly the zero vector — codes must pick
    the entries nearest zero, deterministically), and vectors 20/21/22
    are IDENTICAL (equal ADC scores — rank must break ties by vec_id,
    and all three take identical codes)."""
    from etl_to_iceberg_spark.ext.similarity import pq_adc_topk, pq_codes

    rng = random.Random(seed)
    m, dsub, ksub, nprobe, k = 2, 4, 4, 2, 6

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    vecs = [(i, unit(m * dsub)) for i in range(30)]
    cents = [(c, unit(m * dsub)) for c in range(3)]
    vecs[7] = (7, list(cents[1][1]))          # residual == 0 vector
    dup = unit(m * dsub)
    for vid in (20, 21, 22):                  # tie-heavy ADC scores
        vecs[vid] = (vid, list(dup))
    cbs = {mi: [(j, unit(dsub)) for j in range(ksub)] for mi in range(m)}
    queries = [(0, list(vecs[0][1])), (99, list(dup))]

    from pyspark.sql import functions as F

    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")
    cbdf = spark.createDataFrame(
        [(mi, j, cv) for mi, entries in cbs.items() for j, cv in entries],
        "m int, code int, cent array<double>",
    )
    qdf = spark.createDataFrame(
        queries, "query_id long, embedding array<double>"
    )
    c = emb.select("vec_id", F.col("embedding").alias("__v"))
    q = qdf.select("query_id", F.col("embedding").alias("__v"))

    model_codes, _ = _model_pq_res_codes(vecs, cents, cbs, m, dsub)
    got_codes = {
        (r.vec_id, r.m): r.code
        for r in pq_codes(c, cbdf, m=m, dsub=dsub, centroids=cdf).collect()
    }
    assert got_codes == model_codes
    assert all(
        got_codes[(20, mi)] == got_codes[(21, mi)] == got_codes[(22, mi)]
        for mi in range(m)
    )

    got = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in pq_adc_topk(
            c, q, cdf, cbdf, k=k, nprobe=nprobe, m=m, dsub=dsub,
            residual=True,
        ).collect()
    }
    model = _model_pq_res_adc(
        vecs, queries, cents, cbs, m=m, dsub=dsub, nprobe=nprobe, k=k
    )
    assert got == model
    # identical vectors that survived routing rank contiguously by id
    dup_ranks = sorted(
        r for (qid, vid), (_, r) in got.items() if qid == 99 and vid in (20, 21, 22)
    )
    assert dup_ranks == list(
        range(dup_ranks[0], dup_ranks[0] + len(dup_ranks))
    )


def _model_two_level_assign(vecs, cents, super_probes=4, iters=8):
    """Pure re-derivation of _super_quantizer + two-level routing +
    best-child selection. The Lloyd's arithmetic mirrors the engine's
    numpy ops (matrix cosine argmax, per-cluster mean) so float results
    are bit-identical; routing and the final pick use the rounded-6dp
    cosine orderings the engine's window/max_by encode."""
    import numpy as np

    rows = sorted(cents, key=lambda t: t[0])
    cellids = [c for c, _ in rows]
    cmat = np.asarray([cv for _, cv in rows], dtype=np.float64)
    norms = np.linalg.norm(cmat, axis=1)
    norms[norms == 0.0] = 1.0
    unit = cmat / norms[:, None]
    nsuper = max(2, math.isqrt(len(rows) - 1) + 1)
    sup = unit[:nsuper].copy()
    for _ in range(iters):
        assign = (unit @ sup.T).argmax(axis=1)
        for j in range(nsuper):
            pts = unit[assign == j]
            if len(pts):
                sup[j] = pts.mean(axis=0)
    assign = (unit @ sup.T).argmax(axis=1)
    children = {}
    for i, cell in enumerate(cellids):
        children.setdefault(int(assign[i]), []).append((cell, cmat[i]))
    # mirror the engine's childless-super filter (ADVICE r11): an
    # emptied Lloyd cluster keeps its init centroid but can never
    # contribute candidate cells, so it is dropped before routing
    supers = [
        (j, [float(x) for x in sup[j]]) for j in range(nsuper) if j in children
    ]
    out = {}
    for vid, v in vecs:
        routed = sorted(
            ((-_cos6(v, sv), j) for j, sv in supers)
        )[:super_probes]
        cands = []
        for _, j in routed:
            for cell, cv in children.get(j, []):
                cands.append((-_cos6(v, list(cv)), cell))
        out[vid] = min(cands)[1]
    return out


@pytest.mark.parametrize("seed", [71, 72])
def test_two_level_assign_matches_model(spark, seed):
    """ivf_assign's two-level path (nlist >= 64) == a pure re-derivation
    of super-quantizer training + routing + best-child pick, with
    planted structure: centroids 50 and 51 are IDENTICAL (the winner
    must be cell 50 by the tie order) and one centroid is the zero
    vector (the norm guard must not NaN the routing)."""
    from etl_to_iceberg_spark.ext.similarity import ivf_assign

    rng = random.Random(seed)
    dim = 16

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    cents = [(c, unit(dim)) for c in range(70)]
    cents[51] = (51, list(cents[50][1]))      # exact duplicate centroid
    cents[60] = (60, [0.0] * dim)             # zero vector: norm guard
    vecs = [(i, unit(dim)) for i in range(40)]
    vecs[3] = (3, list(cents[50][1]))         # sits exactly on the dup

    from pyspark.sql import functions as F

    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")
    c = emb.select("vec_id", F.col("embedding").alias("__v"))

    got = {
        r.vec_id: r.cell
        for r in ivf_assign(c, cdf, id_col="vec_id").collect()
    }
    model = _model_two_level_assign(vecs, cents)
    assert got == model
    assert got[3] == 50  # duplicate-centroid tie broken to the lower cell
    # the routing-only shape (no vector through the exchange) must pick
    # identical cells
    skinny = ivf_assign(c, cdf, id_col="vec_id", with_vector=False)
    assert skinny.columns == ["vec_id", "cell"]
    assert {r.vec_id: r.cell for r in skinny.collect()} == model


def test_super_quantizer_drops_childless_supers(spark):
    """Planted emptied Lloyd cluster (ADVICE r11): two tight centroid
    bundles A(×2)/B(×3) with nsuper=3 make init super 1 (a second copy
    of A) lose every argmax tie to super 0, so it ends childless while
    keeping a REAL centroid direction. The filter must drop it from the
    super list (the subset assertion), and routing must assign every
    vector exactly once. NOTE (ADVICE r12): the literal pre-fix "vector
    silently vanished" state is NOT reachable in this geometry — the
    probe-widening formula raises super_probes 1 → 2, and a childless
    super is always an exact duplicate of a LOWER-indexed live super
    (its init cell ties to the lowest cos-1 super), so the live twin
    outranks it in every vector's probe list. The real pre-fix harm is
    the WASTED PROBE SLOT, which test_childless_super_wastes_probe_slot
    below exercises as an actual assignment difference."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.similarity import _super_quantizer, ivf_assign

    dim = 8
    A = [1.0] + [0.0] * (dim - 1)
    B = [0.0, 1.0] + [0.0] * (dim - 2)
    cents = [(0, A), (1, A), (2, B), (3, B), (4, B)]
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")

    cellmap, supers = _super_quantizer(cdf)
    live = {j for _, j in cellmap}
    assert {j for j, _ in supers} <= live, "childless super survived the filter"
    assert len(supers) < 3, "expected the duplicate-init super to empty"

    vecs = [(0, A), (1, B), (2, [0.9, 0.1] + [0.0] * (dim - 2))]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    c = emb.select("vec_id", F.col("embedding").alias("__v"))
    out = ivf_assign(
        c, cdf, id_col="vec_id", two_level_min_nlist=5, super_probes=1,
        with_vector=False,
    ).collect()
    assert len(out) == len(vecs), "a vector disappeared from the assignment"
    got = {r.vec_id: r.cell for r in out}
    assert got[0] == 0 and got[1] == 2  # ties break to the lower cell id


def test_childless_super_wastes_probe_slot(spark):
    """The pre-fix regression the childless filter actually prevents,
    planted so keeping the childless super would CHANGE an assignment
    (ADVICE r12 asked for a geometry where the regression itself is
    exercised, not just the filter's subset invariant).

    Geometry: cells [A, A, B, B, M] with M = (0.6, 0.8)·e12 clustering
    to the B super (cos(M,B)=0.8 > cos(M,A)=0.6). Lloyd ends with live
    supers {0: A, 2: mean(B,B,M)} and super 1 a childless twin of A.
    The probe vector v = (0.9, 0.6)·e12 ranks A-direction supers above
    the B-mean super (cos 0.832 vs 0.717) but its true nearest CELL is
    M (cos 0.943, inside the B super's children). With the widened 2
    probe slots, a kept childless super would fill the second slot with
    a duplicate of A's children and v would assign to cell 0; the filter
    makes slot 2 the B-mean super, finding M. The pure-Python model
    (which mirrors the filter) agrees, and an explicit pre-fix
    re-derivation (childless super kept) confirms the answers differ —
    i.e. this test FAILS if the filter regresses."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.similarity import _super_quantizer, ivf_assign

    dim = 8

    def e12(x, y):
        return [x, y] + [0.0] * (dim - 2)

    A, B, M = e12(1.0, 0.0), e12(0.0, 1.0), e12(0.6, 0.8)
    cents = [(0, A), (1, A), (2, B), (3, B), (4, M)]
    cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")

    cellmap, supers = _super_quantizer(cdf)
    live = {j for _, j in cellmap}
    assert live == {0, 2} and {j for j, _ in supers} == {0, 2}
    assert dict(cellmap) == {0: 0, 1: 0, 2: 2, 3: 2, 4: 2}

    v = e12(0.9, 0.6)
    emb = spark.createDataFrame(
        [(0, v)], "vec_id long, embedding array<double>"
    )
    c = emb.select("vec_id", F.col("embedding").alias("__v"))
    got = {
        r.vec_id: r.cell
        for r in ivf_assign(
            c, cdf, id_col="vec_id", two_level_min_nlist=5, super_probes=1,
            with_vector=False,
        ).collect()
    }
    # post-fix: slot 2 probes the live B-mean super -> finds M (cell 4);
    # the model (filter mirrored, widened probes = 2) agrees
    assert got == {0: 4}
    assert _model_two_level_assign([(0, v)], cents, super_probes=2) == {0: 4}

    # pre-fix re-derivation: same routing with the childless super KEPT
    # (init direction retained, exactly what _super_quantizer used to
    # emit). v's top-2 supers are then the A twins {0, 1}, its candidate
    # cells only {0, 1}, and the assignment lands on cell 0, not M —
    # the filter is what changes the answer.
    rows = sorted(cents, key=lambda t: t[0])
    unit = np.asarray([cv for _, cv in rows], dtype=np.float64)
    unit = unit / np.linalg.norm(unit, axis=1)[:, None]
    sup = unit[:3].copy()
    for _ in range(8):
        assign = (unit @ sup.T).argmax(axis=1)
        for j in range(3):
            pts = unit[assign == j]
            if len(pts):
                sup[j] = pts.mean(axis=0)
    assign = (unit @ sup.T).argmax(axis=1)
    prefix_supers = [(j, sup[j]) for j in range(3)]  # childless KEPT
    routed = sorted((-_cos6(v, list(sv)), j) for j, sv in prefix_supers)[:2]
    assert [j for _, j in routed] == [0, 1], (
        "geometry drifted: v no longer ranks the A twins as its top-2"
    )
    children = {}
    for i, (cell, cv) in enumerate(rows):
        children.setdefault(int(assign[i]), []).append((cell, cv))
    cands = [
        (-_cos6(v, list(cv)), cell)
        for _, j in routed
        for cell, cv in children.get(j, [])
    ]
    assert min(cands)[1] == 0, "pre-fix path should have missed M"
    assert min(cands)[1] != got[0]


def _model_pq_res_rerank(
    vecs, queries, cents, cbs, *, m, dsub, nprobe, k, rerank
):
    """The registered residual op's full shape: IVFADC shortlist of
    ``rerank`` (via _model_pq_res_adc), then exact-cosine re-rank of the
    shortlist to top-``k`` (score desc, vec_id). Also returns the raw
    per-query candidate counts so the caller can assert the shortlist
    genuinely truncated (i.e. ADC decided membership, not just order)."""
    adc = _model_pq_res_adc(
        vecs, queries, cents, cbs, m=m, dsub=dsub, nprobe=nprobe, k=rerank
    )
    _, cell_of = _model_pq_res_codes(vecs, cents, cbs, m, dsub)
    vmap = dict(vecs)
    shortlist = {}
    for (qid, vid), _sr in adc.items():
        shortlist.setdefault(qid, []).append(vid)
    cand_counts = {}
    for qid, qv in queries:
        probed = {
            cell
            for _, cell in sorted(
                ((-_cos6(qv, cv), cell) for cell, cv in cents)
            )[:nprobe]
        }
        cand_counts[qid] = sum(1 for vid, _ in vecs if cell_of[vid] in probed)
    out = {}
    for qid, qv in queries:
        exact = sorted(
            ((-_cos6(qv, vmap[vid]), vid) for vid in shortlist.get(qid, []))
        )
        for r, (negs, vid) in enumerate(exact[:k], start=1):
            out[(qid, vid)] = (-negs if negs != 0 else 0.0, r)
    return out, cand_counts


@pytest.mark.parametrize("seed", [81, 82])
def test_registered_residual_op_matches_model_from_its_sidecars(
    spark, tmp_path, seed
):
    """End-to-end sweep of the REGISTERED similarity_ann_ivf_pq_residual
    op's sidecar plumbing (VERDICT r11 #8): the op trains and persists
    its own quantizer + residual codebooks on a planted corpus; the
    model is rebuilt from THE ARTIFACTS THE OP PERSISTED (sidecar
    parquet read-back), so any drift between what was stored and what
    the search consumed — the stale-model class the params keying
    exists for — breaks the sweep. Planted pathologies: a zero-norm
    vector (assignment must use the -1.0 cosine convention, not crash
    or NaN), and an identical trio including query 97 (tie-heavy exact
    rerank must break by vec_id). The corpus is sized so candidate
    lists EXCEED the rerank shortlist — ADC decides membership, so
    wrong/stale codebooks change the result."""
    import os

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext import corpus_queries as cq

    rng = random.Random(seed)
    dim = cq._PQ_M * cq._PQ_DSUB

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    n = 300
    vecs = [(i, unit(dim)) for i in range(n)]
    vecs[7] = (7, [0.0] * dim)                # zero-norm corpus vector
    dup = unit(dim)
    for vid in (97, 120, 121):                # 97 is also a query
        vecs[vid] = (vid, list(dup))

    sf = str(tmp_path / "sfres")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    got = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in cq.similarity_ann_ivf_pq_residual(spark, sf).collect()
    }

    # rebuild the model from the artifacts the op itself persisted
    cents = [
        (r["cell"], list(r["__cent"]))
        for r in spark.read.parquet(
            sidecars.sidecar_path("ivfk_centroids", sf, cq._IVFK_PARAMS)
        ).collect()
    ]
    cbs: dict = {}
    for r in spark.read.parquet(
        sidecars.sidecar_path("pq_codebooks", sf, cq._PQ_RES_PARAMS)
    ).collect():
        cbs.setdefault(r["m"], []).append((r["code"], list(r["cent"])))
    queries = [(vid, v) for vid, v in vecs if vid % 97 == 0]
    model, cand_counts = _model_pq_res_rerank(
        vecs, queries, cents, cbs,
        m=cq._PQ_M, dsub=cq._PQ_DSUB, nprobe=4, k=10, rerank=cq._PQ_RERANK,
    )
    assert max(cand_counts.values()) > cq._PQ_RERANK, (
        f"shortlist never truncated ({cand_counts}) — the sweep would "
        "degrade to an exact-cosine test that can't see stale codebooks"
    )
    assert got == model
    # tie-heavy rerank: the identical trio ranks contiguously by id for
    # the duplicate query
    trio = sorted(r for (qid, vid), (_, r) in got.items()
                  if qid == 97 and vid in (97, 120, 121))
    assert trio == list(range(trio[0], trio[0] + len(trio)))

    # params-keying guards (ADVICE r11 medium): raw and residual
    # codebooks never share a directory, and the residual key folds in
    # the coarse-quantizer params it was trained against
    raw_p = sidecars.sidecar_path("pq_codebooks", sf, cq._PQ_PARAMS)
    res_p = sidecars.sidecar_path("pq_codebooks", sf, cq._PQ_RES_PARAMS)
    assert raw_p != res_p
    other_ivfk = dict(
        cq._PQ_PARAMS, residual=True,
        **{f"ivfk_{k}": v for k, v in dict(cq._IVFK_PARAMS, nlist=999).items()},
    )
    assert sidecars.sidecar_path("pq_codebooks", sf, other_ivfk) != res_p, (
        "a coarse-quantizer param change must relocate the residual "
        "codebook sidecar"
    )


def test_ivf2l_assignment_sidecar_matches_live_routing(spark, sf_dir):
    """The two-level ops' shared assignment sidecar must equal a FRESH
    ivf_assign computation from the stored quantizer: the two_level op's
    engine consumes the sidecar while pq_residual_two_level routes live
    inside pq_adc_topk, so any routing change that isn't reflected in a
    rebuilt sidecar would split the two (and fail the driver loudly
    mid-round). This pins the equality as a test failure instead."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.corpus_queries import (
        _IVF2L_PARAMS,
        _ivf2l_assignments,
        _ivf2l_centroids,
    )
    from etl_to_iceberg_spark.ext.similarity import _to_double, ivf_assign
    from etl_to_iceberg_spark.sources.tables import load_table

    stored = {
        (r.side, r.id, r.cell)
        for r in _ivf2l_assignments(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf2l_centroids(spark, sf_dir)
    c = emb.select("vec_id", _to_double("embedding").alias("__v"))
    q = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("__v")
    )
    live = {
        ("c", r.vec_id, r.cell)
        for r in ivf_assign(
            c, cents, id_col="vec_id", n_best=1, with_vector=False
        ).collect()
    } | {
        ("q", r.query_id, r.cell)
        for r in ivf_assign(
            q, cents, id_col="query_id",
            n_best=_IVF2L_PARAMS["nprobe"], with_vector=False,
        ).collect()
    }
    assert stored == live


@pytest.mark.parametrize("seed", [91, 92])
def test_registered_two_level_op_matches_model_from_its_sidecar(
    spark, tmp_path, seed
):
    """End-to-end sweep of the REGISTERED similarity_ann_ivf_two_level
    op on a planted corpus: the op trains its nlist=64 quantizer,
    routes through the two-level branch, persists the assignment, and
    searches from the stored rows; the model re-derives the search half
    (shared-cell candidates → exact cosine → top-k) from THE SIDECAR
    THE OP WROTE. Planted: a zero-norm vector (must assign via the
    -1.0 convention and never crash the rerank) and an identical trio
    including query 97 (tie ranks break by vec_id)."""
    import os

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext import corpus_queries as cq

    rng = random.Random(seed)
    dim = 64

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    n = 300
    vecs = [(i, unit(dim)) for i in range(n)]
    vecs[7] = (7, [0.0] * dim)
    dup = unit(dim)
    for vid in (97, 130, 131):
        vecs[vid] = (vid, list(dup))

    sf = str(tmp_path / "sf2l")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    got = {
        (r.query_id, r.vec_id): (r.score, r.rank)
        for r in cq.similarity_ann_ivf_two_level(spark, sf).collect()
    }

    rows = spark.read.parquet(
        sidecars.sidecar_path("ivf2l_assign", sf, cq._IVF2L_PARAMS)
    ).collect()
    ccell = {r.id: r.cell for r in rows if r.side == "c"}
    qcells: dict = {}
    for r in rows:
        if r.side == "q":
            qcells.setdefault(r.id, set()).add(r.cell)
    vmap = dict(vecs)
    model = {}
    for qid, cells in qcells.items():
        cand = sorted(
            (-_cos6(vmap[qid], vmap[vid]), vid)
            for vid, cell in ccell.items()
            if cell in cells
        )
        for r, (negs, vid) in enumerate(cand[: cq._IVF2L_PARAMS["k"]], start=1):
            model[(qid, vid)] = (-negs, r)
    assert got == model
    # the identical trio (when candidates) ranks contiguously for the
    # duplicate query, broken by id
    trio = sorted(
        r for (qid, vid), (_, r) in got.items()
        if qid == 97 and vid in (97, 130, 131)
    )
    assert trio and trio == list(range(trio[0], trio[0] + len(trio)))
    # the zero vector was assigned (did not vanish from the corpus side)
    assert 7 in ccell


def _model_assign_nbest(vecs, cents, *, n_best, two_level_min_nlist=64,
                        super_probes=4, iters=8):
    """n_best-general assignment model: flat (all cells scored) below
    the threshold, two-level (route to the widened super_probes best
    supers, score only their children) at or above it — including the
    engine's probe-widening formula, which the n_best=1 sweep never
    exercises. Returns {(id, cell)} — the with_vector=False surface."""
    import math

    import numpy as np

    nlist = len(cents)
    if nlist < two_level_min_nlist:
        out = set()
        for vid, v in vecs:
            ranked = sorted((-_cos6(v, cv), cell) for cell, cv in cents)
            out.update((vid, cell) for _, cell in ranked[:n_best])
        return out
    rows = sorted(cents, key=lambda t: t[0])
    cellids = [c for c, _ in rows]
    cmat = np.asarray([cv for _, cv in rows], dtype=np.float64)
    norms = np.linalg.norm(cmat, axis=1)
    norms[norms == 0.0] = 1.0
    unit = cmat / norms[:, None]
    nsuper0 = max(2, math.isqrt(len(rows) - 1) + 1)
    sup = unit[:nsuper0].copy()
    for _ in range(iters):
        assign = (unit @ sup.T).argmax(axis=1)
        for j in range(nsuper0):
            pts = unit[assign == j]
            if len(pts):
                sup[j] = pts.mean(axis=0)
    assign = (unit @ sup.T).argmax(axis=1)
    children: dict = {}
    for i, cell in enumerate(cellids):
        children.setdefault(int(assign[i]), []).append((cell, cmat[i]))
    supers = [
        (j, [float(x) for x in sup[j]]) for j in range(nsuper0) if j in children
    ]
    nsuper = len(supers)
    # the engine's multiprobe widening (ivf_assign): enough supers that
    # the probed cells comfortably exceed n_best, never past all
    probes = min(nsuper, max(super_probes, math.ceil(n_best * nsuper / nlist) + 1))
    out = set()
    for vid, v in vecs:
        routed = sorted(((-_cos6(v, sv), j) for j, sv in supers))[:probes]
        cands = []
        for _, j in routed:
            for cell, cv in children[j]:
                cands.append((-_cos6(v, list(cv)), cell))
        cands.sort()
        out.update((vid, cell) for _, cell in cands[:n_best])
    return out


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_assign_nbest_random_params_matches_model(spark, seed):
    """Randomized-params assignment sweep: nlist drawn to land on BOTH
    sides of the two-level threshold and n_best in 1..4 — covering the
    query-routing side (n_best=nprobe) of the two-level branch and its
    probe-widening formula, which the n_best=1 sweep and the flat
    fixtures never exercise together. Planted per trial: a duplicate
    centroid pair (tie cells must rank lowest-first into the top-n) and
    one vector equal to a centroid."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.similarity import ivf_assign

    rng = random.Random(seed)
    dim = 12

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    for trial in range(3):
        nlist = rng.choice([20, 40, 64, 80, 96])
        n_best = rng.randrange(1, 5)
        cents = [(c, unit(dim)) for c in range(nlist)]
        dup = rng.randrange(0, nlist - 1)
        cents[dup + 1] = (dup + 1, list(cents[dup][1]))  # duplicate pair
        vecs = [(i, unit(dim)) for i in range(30)]
        vecs[5] = (5, list(cents[dup][1]))  # sits exactly on the dup

        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        cdf = spark.createDataFrame(cents, "cell int, __cent array<double>")
        c = emb.select("vec_id", F.col("embedding").alias("__v"))
        got = {
            (r.vec_id, r.cell)
            for r in ivf_assign(
                c, cdf, id_col="vec_id", n_best=n_best, with_vector=False
            ).collect()
        }
        model = _model_assign_nbest(vecs, cents, n_best=n_best)
        assert got == model, (
            f"seed={seed} trial={trial} nlist={nlist} n_best={n_best}: "
            f"engine^model={sorted(got ^ model)[:6]}"
        )
        if n_best >= 2:
            # the duplicate-centroid tie: both cells score identically,
            # so whenever one is picked for vector 5 the other must be
            # the adjacent pick (cell-ascending tie order)
            picked = sorted(cell for vid, cell in got if vid == 5)
            if dup in picked or dup + 1 in picked:
                assert dup in picked and dup + 1 in picked


@pytest.mark.parametrize("seed", [61, 62])
def test_quantizer_rotation_retrains_residual_codebooks(
    spark, tmp_path, seed
):
    """Rotation sweep for the stale-model class the folded sidecar key
    exists for (VERDICT r12 #7): residual codebooks are trained AGAINST
    a specific coarse quantizer, so retraining the quantizer (a
    production rotation: nlist grows with the corpus) must (1) relocate
    the codebook sidecar via the folded ivfk_* key, (2) actually
    RE-TRAIN at the new path — never serve the codebooks fitted to the
    previous centroids — and (3) keep the search inside its recall
    envelope across the rotation. Exercises the exact interaction no
    prior test rotated: ADVICE r11's folded key under a live param bump.

    Corpus: near-dup regime (anchors x perturbed copies) — the regime
    the engine targets, where IVFADC recall is high and STALE codebooks
    would visibly corrupt ADC scores."""
    import os

    from pyspark.sql import functions as F

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext import corpus_queries as cq
    from etl_to_iceberg_spark.ext.similarity import (
        _to_double,
        ivf_kmeans_centroids,
        pq_adc_topk,
        pq_train_codebooks,
    )

    rng = random.Random(seed)
    m, dsub = cq._PQ_M, cq._PQ_DSUB
    dim = m * dsub

    def unit(v):
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / s for x in v]

    def gauss(n):
        return [rng.gauss(0, 1) for _ in range(n)]

    anchors = [unit(gauss(dim)) for _ in range(30)]
    vecs = []
    for i in range(300):
        a = anchors[i % 30]
        vecs.append(
            (i, unit([x + rng.gauss(0, 0.05) for x in a]))
        )

    sf = str(tmp_path / "sfrot")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    c = emb.select("vec_id", _to_double("embedding").alias("__v"))
    q = emb.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("__v")
    )
    queries = [(vid, v) for vid, v in vecs if vid % 37 == 0]
    vmap = dict(vecs)
    k = 10

    def exact_topk(qv):
        return [
            vid
            for _, vid in sorted(
                ((-_cos6(qv, vmap[vid]), vid) for vid in vmap)
            )[:k]
        ]

    truth = {qid: set(exact_topk(qv)) for qid, qv in queries}

    def generation(ivfk_params):
        """One quantizer generation, wired exactly like the registered
        ops: params-keyed centroid sidecar, residual codebook sidecar
        with the coarse params FOLDED IN, refine-less IVFADC search."""
        cent_path = sidecars.sidecar_path("ivfk_centroids", sf, ivfk_params)
        sidecars.ensure_sidecar(
            cent_path, sf, lambda: ivf_kmeans_centroids(emb, **ivfk_params)
        )
        cents = spark.read.parquet(cent_path).select("cell", "__cent")
        res_params = dict(
            cq._PQ_PARAMS, residual=True,
            **{f"ivfk_{kk}": v for kk, v in ivfk_params.items()},
        )
        cb_path = sidecars.sidecar_path("pq_codebooks", sf, res_params)
        builds = []

        def build():
            builds.append(1)
            return pq_train_codebooks(emb, **cq._PQ_PARAMS, centroids=cents)

        sidecars.ensure_sidecar(cb_path, sf, build)
        cbs = spark.read.parquet(cb_path).select("m", "code", "cent")
        got = pq_adc_topk(
            c, q, cents, cbs, k=k, nprobe=4, m=m, dsub=dsub, residual=True
        ).collect()
        hits = {}
        for r in got:
            hits.setdefault(r.query_id, set()).add(r.vec_id)
        recall = sum(
            len(hits.get(qid, set()) & truth[qid]) / k for qid, _ in queries
        ) / len(queries)
        cb_rows = {
            (r.m, r.code, tuple(round(x, 9) for x in r.cent))
            for r in cbs.collect()
        }
        return cent_path, cb_path, len(builds), cb_rows, recall

    gen_a = generation({"nlist": 8, "train_fraction": 0.5})
    # the rotation: production bumps nlist as the corpus grows
    gen_b = generation({"nlist": 16, "train_fraction": 0.5})

    cent_a, cb_a, builds_a, rows_a, recall_a = gen_a
    cent_b, cb_b, builds_b, rows_b, recall_b = gen_b
    assert builds_a == 1 and builds_b == 1, (
        "each generation must train its own codebooks — a 0 means the "
        "rotated params reused a stale directory"
    )
    assert cent_b != cent_a and cb_b != cb_a, (
        "the coarse-param bump must relocate BOTH sidecars (folded key)"
    )
    assert rows_b != rows_a, (
        "rotated-quantizer codebooks equal the previous generation's — "
        "residual training did not actually see the new centroids"
    )
    # recall envelope: the rotation must not degrade search (near-dup
    # regime; measured 1.000 for both generations on both seeds — the
    # 0.8 floor leaves headroom for future param changes while still
    # catching the stale-codebook corruption this sweep exists for)
    assert recall_a >= 0.8 and recall_b >= 0.8, (recall_a, recall_b)
    assert recall_b >= recall_a - 0.1, (recall_a, recall_b)

    # re-running generation B is a pure read: the stored-model posture
    cent_path = sidecars.sidecar_path(
        "ivfk_centroids", sf, {"nlist": 16, "train_fraction": 0.5}
    )
    again = generation({"nlist": 16, "train_fraction": 0.5})
    assert again[2] == 0 and again[3] == rows_b and again[0] == cent_path


def _model_knn_label_vote(vecs, labels, *, k, nprobe, cents):
    """Pure re-derivation of similarity_knn_label_vote: flat assignment
    (rounded-6dp cosine desc, cell asc), shared-cell candidates, exact
    top-k (score desc, vec_id), majority (votes desc, label asc)."""
    def assign(v, n):
        return [
            c for _, c in sorted(
                ((-_cos6(v, cv), c) for c, cv in cents)
            )[:n]
        ]

    idx = [(vid, v) for vid, v in vecs if vid % 5 != 0]
    qry = [(vid, v) for vid, v in vecs if vid % 5 == 0]
    cell_of = {vid: assign(v, 1)[0] for vid, v in idx}
    out = {}
    for qid, qv in qry:
        probed = set(assign(qv, nprobe))
        cands = [(vid, v) for vid, v in idx if cell_of[vid] in probed]
        top = sorted(
            ((-_cos6(qv, v), vid) for vid, v in cands)
        )[:k]
        got = [vid for _, vid in top]
        votes: dict = {}
        for vid in got:
            votes[labels[vid]] = votes.get(labels[vid], 0) + 1
        pred, nv = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0]
        n_used = len(got)
        out[qid] = (pred, nv, n_used, round(nv / n_used, 6))
    return out


@pytest.mark.parametrize("seed", [41, 42])
def test_knn_label_vote_matches_model(spark, tmp_path, seed):
    """End-to-end sweep of the REGISTERED similarity_knn_label_vote op
    on a planted corpus, model rebuilt from THE QUANTIZER THE OP
    PERSISTED (sidecar read-back — the stale-model guard every
    quantizer consumer carries). Planted pathologies: an identical
    labeled trio straddling two labels next to a query duplicate (score
    ties break by vec_id, then the vote can TIE between labels and must
    break to the lower label id), and a zero-norm query (cosine −1.0
    convention everywhere — still collects k neighbors, never NaNs)."""
    import os

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext import corpus_queries as cq

    rng = random.Random(seed)
    dim = 16

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    n = 200
    vecs = [(i, unit(dim)) for i in range(n)]
    labels = {i: rng.randrange(4) for i in range(n)}
    # query 100 sits exactly on labeled duplicates 101/102/103 with
    # labels 1,1,2 — the trio ties pairwise at score 1.0
    dup = unit(dim)
    for vid, lab in ((100, 0), (101, 1), (102, 1), (103, 2)):
        vecs[vid] = (vid, list(dup))
        labels[vid] = lab
    vecs[55] = (55, [0.0] * dim)  # zero-norm query (55 % 5 == 0)

    sf = str(tmp_path / "sfknn")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(vid, v, labels[vid]) for vid, v in vecs],
        "vec_id long, embedding array<double>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    got = {
        r.query_id: (r.pred_label, r.votes, r.n_used, r.vote_frac)
        for r in cq.similarity_knn_label_vote(spark, sf).collect()
    }
    cents = [
        (r["cell"], list(r["__cent"]))
        for r in spark.read.parquet(
            sidecars.sidecar_path("ivfk_centroids", sf, cq._IVFK_PARAMS)
        ).collect()
    ]
    model = _model_knn_label_vote(
        vecs, labels, k=cq._KNN_VOTE["k"], nprobe=cq._KNN_VOTE["nprobe"],
        cents=cents,
    )
    assert got == model
    assert set(got) == {vid for vid, _ in vecs if vid % 5 == 0}
    assert 55 in got, "the zero-norm query must still be scored"


@pytest.mark.parametrize("seed", [43, 44])
def test_label_purity_matches_model(spark, tmp_path, seed):
    """corpus_label_purity vs a pure re-derivation from the op's own
    persisted quantizer: per-cell histogram, majority with the
    (count desc, label asc) tie-break, exact purity fraction. Planted:
    a forced label tie inside one cell (identical counts must pick the
    lower label)."""
    import os

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext import corpus_queries as cq

    rng = random.Random(seed)
    dim = 16

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    n = 200
    vecs = [(i, unit(dim)) for i in range(n)]
    labels = {i: rng.randrange(3) for i in range(n)}
    # a tight planted bundle with an exact 2-2 label split
    anchor = unit(dim)
    for vid, lab in ((10, 2), (11, 2), (12, 1), (13, 1)):
        vecs[vid] = (vid, [x + rng.gauss(0, 0.01) for x in anchor])
        labels[vid] = lab

    sf = str(tmp_path / "sfpur")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(vid, v, labels[vid]) for vid, v in vecs],
        "vec_id long, embedding array<double>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    got = {
        r.cell: (r.n_vectors, r.majority_label, r.majority_n, r.purity)
        for r in cq.corpus_label_purity(spark, sf).collect()
    }
    cents = [
        (r["cell"], list(r["__cent"]))
        for r in spark.read.parquet(
            sidecars.sidecar_path("ivfk_centroids", sf, cq._IVFK_PARAMS)
        ).collect()
    ]
    cell_of = {}
    for vid, v in vecs:
        cell_of[vid] = sorted(((-_cos6(v, cv), c) for c, cv in cents))[0][1]
    model = {}
    for cell in sorted(set(cell_of.values())):
        members = [vid for vid in cell_of if cell_of[vid] == cell]
        hist: dict = {}
        for vid in members:
            hist[labels[vid]] = hist.get(labels[vid], 0) + 1
        lab, cnt = sorted(hist.items(), key=lambda t: (-t[1], t[0]))[0]
        model[cell] = (len(members), lab, cnt, round(cnt / len(members), 6))
    assert got == model
    assert sum(nv for nv, *_ in got.values()) == n


def _model_semantic_decontaminate(vecs, *, thresh, nprobe, cents):
    """Pure re-derivation of corpus_semantic_decontaminate: flat
    assignment from the op's persisted quantizer (rounded-6dp cosine
    desc, cell asc), training n_best=1 / eval n_best=nprobe,
    shared-cell candidates, exact cosine >= thresh, best match per
    training vector with the (score desc, eval_id) tie-break."""
    def assign(v, n):
        return [
            c for _, c in sorted(
                ((-_cos6(v, cv), c) for c, cv in cents)
            )[:n]
        ]

    tr = [(vid, v) for vid, v in vecs if vid % 97 != 0]
    ev = [(vid, v) for vid, v in vecs if vid % 97 == 0]
    cell_of = {vid: assign(v, 1)[0] for vid, v in tr}
    probed: dict = {}
    for eid, evv in ev:
        for c in assign(evv, nprobe):
            probed.setdefault(c, []).append((eid, evv))
    out = {}
    for vid, v in tr:
        hits = sorted(
            (-_cos6(v, evv), eid)
            for eid, evv in probed.get(cell_of[vid], [])
            if _cos6(v, evv) >= thresh
        )
        if hits:
            out[vid] = (hits[0][1], -hits[0][0])
    return out


@pytest.mark.parametrize("seed", [45, 46])
def test_semantic_decontaminate_flags_planted_paraphrases(spark, tmp_path, seed):
    """End-to-end sweep of the REGISTERED corpus_semantic_decontaminate
    op on a planted corpus, model rebuilt from THE QUANTIZER THE OP
    PERSISTED (the stale-model guard every quantizer consumer carries).
    Planted: three training vectors that are noise-perturbed copies of
    eval items (the paraphrase the n-gram decontaminators miss —
    cosine ~0.99, must be flagged with the right eval match), one decoy
    built just BELOW the threshold against its eval item (must not be
    flagged by that pair), and a zero-norm training vector (cosine -1.0
    convention — never flagged, never NaN)."""
    import os

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext import corpus_queries as cq

    rng = random.Random(seed)
    dim = 16
    thresh, nprobe = cq._SEMDECON["thresh"], cq._SEMDECON["nprobe"]

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    n = 300
    vecs = [(i, unit(dim)) for i in range(n)]
    eval_ids = [i for i in range(n) if i % 97 == 0]
    assert len(eval_ids) >= 3

    def mix(base, target_cos):
        # v = a*base + b*orth, unit by construction -> cos(v, base) = a
        orth = unit(dim)
        d = sum(x * y for x, y in zip(orth, base))
        o = [x - d * y for x, y in zip(orth, base)]
        s = math.sqrt(sum(x * x for x in o))
        o = [x / s for x in o]
        b = math.sqrt(1 - target_cos * target_cos)
        return [target_cos * x + b * y for x, y in zip(base, o)]

    planted = {}
    for off, eid in zip((1, 2, 3), eval_ids[:3]):
        vid = eid + off  # adjacent ids are training ids (not % 97 == 0)
        assert vid % 97 != 0
        vecs[vid] = (vid, mix(vecs[eid][1], 0.99))
        planted[vid] = eid
    # decoy: just under the threshold vs eval_ids[0]
    decoy = eval_ids[0] + 10
    assert decoy % 97 != 0
    vecs[decoy] = (decoy, mix(vecs[eval_ids[0]][1], thresh - 0.02))
    zero = eval_ids[0] + 11
    vecs[zero] = (zero, [0.0] * dim)

    sf = str(tmp_path / "sfdecon")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(vid, v) for vid, v in vecs], "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    got = {
        r.vec_id: (r.matched_eval_id, r.score)
        for r in cq.corpus_semantic_decontaminate(spark, sf).collect()
    }
    cents = [
        (r["cell"], list(r["__cent"]))
        for r in spark.read.parquet(
            sidecars.sidecar_path("ivfk_centroids", sf, cq._IVFK_PARAMS)
        ).collect()
    ]
    model = _model_semantic_decontaminate(
        vecs, thresh=thresh, nprobe=nprobe, cents=cents
    )
    assert got == model
    # every planted paraphrase is flagged with its own eval item (the
    # ~0.99 twin shares the eval item's cell, which eval always probes
    # at rank 1) — the capability the n-gram decontaminators lack
    for vid, eid in planted.items():
        assert vid in got and got[vid][0] == eid, (vid, got.get(vid))
        assert got[vid][1] >= 0.98
    # the decoy's planted pair sits at thresh-0.02 — strictly under the
    # threshold — so the report must never carry (decoy -> eval_ids[0])
    # at ANY score; being flagged via some other (genuinely
    # above-threshold) eval item is the only way decoy may appear. The
    # pair-level form is asserted directly: the previous
    # `... or score >= thresh` disjunct was vacuously true for any row
    # that survived the op's own threshold filter (ADVICE r14).
    assert got.get(decoy, (None, None))[0] != eval_ids[0], got.get(decoy)
    assert zero not in got, "zero-norm vector must never be flagged"


def test_semantic_decontaminate_drop_variant(spark, tmp_path):
    """Execute the docstring's drop form (VERDICT r14 #5) —
    ``corpus.join(F.broadcast(report), "vec_id", "left_anti")`` —
    against a planted fixture: the flagged vec_ids are gone, every
    other vector survives, and the plan is the claimed one broadcast
    anti-join on the hit-sized report (BroadcastHashJoin LeftAnti; the
    corpus side never shuffles on vec_id and there is no
    SortMergeJoin/Cartesian). The hint is what this test attests:
    writing this test against the previously-documented UN-hinted form
    produced a static SortMergeJoin — Catalyst estimates the report
    from its corpus-sized scan inputs, so at scale the un-hinted drop
    would shuffle the whole corpus on vec_id."""
    import os

    from etl_to_iceberg_spark.ext import corpus_queries as cq
    from etl_to_iceberg_spark.plans import explain_str
    from etl_to_iceberg_spark.sources.tables import load_table

    rng = random.Random(66)
    dim = 16

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    n = 300
    vecs = [(i, unit(dim)) for i in range(n)]
    eval_ids = [i for i in range(n) if i % 97 == 0]
    # plant near-copies of three eval items (cosine ~0.995 via a tiny
    # perturbation of the eval vector itself — comfortably > thresh)
    planted = []
    for off, eid in zip((1, 2, 3), eval_ids[:3]):
        vid = eid + off
        assert vid % 97 != 0
        base = vecs[eid][1]
        near = [x + 0.01 * y for x, y in zip(base, unit(dim))]
        s = math.sqrt(sum(x * x for x in near))
        vecs[vid] = (vid, [x / s for x in near])
        planted.append(vid)

    sf = str(tmp_path / "sfdrop")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(vid, v) for vid, v in vecs], "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    report = cq.corpus_semantic_decontaminate(spark, sf)
    flagged = {r.vec_id for r in report.collect()}
    assert set(planted) <= flagged, (planted, flagged)
    assert not any(e in flagged for e in eval_ids), "report is training-side only"

    from pyspark.sql import functions as F

    corpus = load_table(spark, sf, "embeddings")
    dropped = corpus.join(F.broadcast(report), "vec_id", "left_anti")
    survivors = {r.vec_id for r in dropped.select("vec_id").collect()}
    assert survivors == {vid for vid, _ in vecs} - flagged

    plan = explain_str(dropped, "formatted")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_semantic_decontaminate_incremental_matches_batch_restriction(
    spark, tmp_path
):
    """The tick's correctness argument, pinned end-to-end: on the same
    planted corpus, ``corpus_semantic_decontaminate_incremental``
    (batch = vec_id % 5 == 4, scored against the STORED eval index)
    must agree row-for-row with the full batch decontaminator
    restricted to the batch slice — same assignment (flat n_best=1),
    same candidates (an eval item's probed cells are identical whether
    read from the index or re-derived), same threshold and best-pick.
    Planted: one paraphrase INSIDE the batch slice (must be flagged by
    the tick with its eval item) and one OUTSIDE it (the full op flags
    it; the tick must NOT — a tick scores only its batch)."""
    import os

    from etl_to_iceberg_spark.ext import corpus_queries as cq

    rng = random.Random(67)
    dim = 16

    def unit(n):
        v = [rng.gauss(0, 1) for _ in range(n)]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    def near(base):
        v = [x + 0.01 * y for x, y in zip(base, unit(dim))]
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    n = 300
    vecs = [(i, unit(dim)) for i in range(n)]
    eval_ids = [i for i in range(n) if i % 97 == 0]
    assert len(eval_ids) >= 3
    in_batch, out_batch = 99, 98  # 99 % 5 == 4 (batch); 98 % 5 == 3
    assert in_batch % 5 == 4 and in_batch % 97 != 0
    assert out_batch % 5 != 4 and out_batch % 97 != 0
    vecs[in_batch] = (in_batch, near(vecs[97][1]))
    vecs[out_batch] = (out_batch, near(vecs[97][1]))

    sf = str(tmp_path / "sfinc")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(vid, v) for vid, v in vecs], "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    full = {
        r.vec_id: (r.matched_eval_id, r.score)
        for r in cq.corpus_semantic_decontaminate(spark, sf).collect()
    }
    tick = {
        r.vec_id: (r.matched_eval_id, r.score)
        for r in cq.corpus_semantic_decontaminate_incremental(
            spark, sf
        ).collect()
    }
    assert tick == {k: v for k, v in full.items() if k % 5 == 4}
    assert tick[in_batch][0] == 97 and tick[in_batch][1] >= 0.98
    assert out_batch in full and out_batch not in tick


@pytest.mark.parametrize("seed", [63, 64])
def test_quantizer_rotation_rebuilds_label_vote_index(
    spark, tmp_path, monkeypatch, seed
):
    """Rotation sweep for the label-vote STORED INDEX (VERDICT r13 #6):
    knn_vote_index folds the quantizer params + split into its sidecar
    key (_KNN_IDX_PARAMS) but — unlike the two-level assignment sidecar
    — carries no routing-version token, because flat assignment is
    routing-version-independent today. This sweep pins the half the key
    IS responsible for: retraining/bumping the quantizer must (1)
    relocate the index sidecar via the folded key, (2) actually REBUILD
    the stored (vec_id, label, cell) rows against the NEW centroids —
    never serve the assignment fitted to the previous quantizer — and
    (3) leave predictions equal to a pure re-derivation under the new
    quantizer. Runs the REGISTERED op end-to-end with the module params
    monkeypatched, the same wiring a production rotation would change.

    Corpus: label-clustered geometry (labels agree with anchors), so a
    stale index would visibly corrupt the vote."""
    import os

    from etl_to_iceberg_spark import sidecars
    from etl_to_iceberg_spark.ext import corpus_queries as cq

    rng = random.Random(seed)
    dim = 16

    def unit(v):
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / s for x in v]

    anchors = [unit([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(4)]
    vecs = []
    labels = {}
    for i in range(240):
        lab = i % 4
        vecs.append(
            (i, unit([x + rng.gauss(0, 0.15) for x in anchors[lab]]))
        )
        labels[i] = lab

    sf = str(tmp_path / "sfvrot")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(vid, v, labels[vid]) for vid, v in vecs],
        "vec_id long, embedding array<double>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )

    def generation(ivfk_params):
        monkeypatch.setattr(cq, "_IVFK_PARAMS", ivfk_params)
        monkeypatch.setattr(
            cq, "_KNN_IDX_PARAMS", dict(ivfk_params, split=5)
        )
        out = {
            r.query_id: (r.pred_label, r.votes, r.n_used, r.vote_frac)
            for r in cq.similarity_knn_label_vote(spark, sf).collect()
        }
        idx_path = sidecars.sidecar_path(
            "knn_vote_index", sf, dict(ivfk_params, split=5)
        )
        idx = {
            (r.vec_id, r.label, r.cell)
            for r in spark.read.parquet(idx_path).collect()
        }
        return out, idx_path, idx

    params_a = {"nlist": 8, "train_fraction": 0.5}
    params_b = {"nlist": 16, "train_fraction": 0.5}
    out_a, path_a, idx_a = generation(params_a)
    out_b, path_b, idx_b = generation(params_b)

    # (1) the folded key relocates the index with the quantizer
    assert path_a != path_b
    assert idx_a != idx_b, "rotation must change the stored assignment"

    # (2) the stored rows at the new path are a fresh flat assignment
    # against the NEW quantizer — re-derived independently here
    cents_b = [
        (r["cell"], list(r["__cent"]))
        for r in spark.read.parquet(
            sidecars.sidecar_path("ivfk_centroids", sf, params_b)
        ).collect()
    ]
    expect_idx = {
        (vid, labels[vid],
         sorted(((-_cos6(v, cv), c) for c, cv in cents_b))[0][1])
        for vid, v in vecs
        if vid % 5 != 0
    }
    assert idx_b == expect_idx

    # (3) predictions under the new quantizer match the pure model
    model_b = _model_knn_label_vote(
        vecs, labels,
        k=cq._KNN_VOTE["k"], nprobe=cq._KNN_VOTE["nprobe"], cents=cents_b,
    )
    assert out_b == model_b

    # re-running generation B is a pure read: no file rewritten
    def mtimes(p):
        return sorted(
            (f, os.stat(os.path.join(p, f)).st_mtime_ns)
            for f in os.listdir(p)
        )

    before = mtimes(path_b)
    out_b2, _, _ = generation(params_b)
    assert out_b2 == out_b and mtimes(path_b) == before
