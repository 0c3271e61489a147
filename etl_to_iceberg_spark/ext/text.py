"""Text analysis for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — all as pure
Catalyst column expressions (no Python in the hot path), so a 100 TB
documents table is processed entirely inside whole-stage codegen with
nothing but a scan.

Determinism: every function is a per-row expression over the input string —
no RNG, no wall clock — so results are engine-reproducible and each has an
ANSI-SQL mirror in ``ext/queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Word tokens: runs of alphanumerics.
WORD_RE = r"[A-Za-z0-9]+"
# BPE-ish tokens: letter runs, digit runs, or single punctuation marks —
# the common pre-tokenization shape (whitespace-split + symbol isolation).
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "dans", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    """Array of word tokens."""
    return F.regexp_extract_all(_c(col), F.lit(WORD_RE), 0)


def word_count(col: Column | str) -> Column:
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """BPE-ish token count (whitespace split + punctuation isolation)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_RE), 0))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-space characters that are punctuation/symbols."""
    c = _c(col)
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    alnum = F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", ""))
    return F.when(nonspace > 0, (nonspace - alnum).cast("double") / nonspace).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of word tokens that are (English) stopwords. Token array
    let-bound (:func:`_let`) so the text tokenizes once, not once per
    reference."""
    sw = stopwords or LANG_MARKERS["en"]
    lit = F.array(*[F.lit(w) for w in sw])

    def body(toks: Column) -> Column:
        hits = F.size(F.filter(toks, lambda x: F.array_contains(lit, x)))
        n = F.size(toks)
        return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))

    return _let(words(F.lower(_c(col))), body)


def avg_word_len(col: Column | str) -> Column:
    def body(toks: Column) -> Column:
        n = F.size(toks)
        total = F.length(F.concat_ws("", toks))
        return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))

    return _let(words(_c(col)), body)


def _let(bound: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``bound`` ONCE per row
    and hand the result to ``body`` as a lambda variable.

    ``transform(array(bound), v -> body(v))[1]`` — the single-element
    higher-order function is the only Catalyst construct that binds a
    computed value to a name: inside the lambda, ``v`` is a
    NamedLambdaVariable (a slot read), not a subtree, so however many
    times ``body`` references it, the bound expression is computed once.
    Why it matters (guide §1.2 per-task work / §7.2 duplicated
    subtrees): composite scorers like :func:`lang_id` referenced their
    shared token array in ~30 places, and each Python-side ``words(col)``
    call built a FRESH ``regexp_extract_all`` subtree — Catalyst's
    subexpression elimination only de-duplicates inside codegen, while
    these higher-order expressions are CodegenFallback (interpreted), so
    every reference re-tokenized the text. The binding also shrinks the
    expression tree itself ~30×, which is what the optimizer and the
    analyzer walk on every plan pass (measured: the corpus_curate_v2
    pushed-down filter was a multi-page expression)."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic (length / punctuation / stopword
    mix), the standard cheap pre-filter before expensive dedup/model
    scoring in a training-data pipeline. Fixed, documented formula:

    0.4 * min(word_count, 100)/100
    + 0.3 * (1 - punct_ratio)
    + 0.3 * min(stopword_ratio * 4, 1)

    Arithmetic is unchanged from the formula above; the token arrays and
    regex-stripped lengths are let-bound (:func:`_let`) so each is
    computed once per row instead of once per reference."""
    c = _c(col)
    sw_lit = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    bound = F.struct(
        words(c).alias("t"),
        words(F.lower(c)).alias("lt"),
        F.length(F.regexp_replace(c, r"\s", "")).alias("ns"),
        F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", "")).alias("an"),
    )

    def body(s: Column) -> Column:
        wc = F.size(s["t"])
        length_term = F.least(wc, F.lit(100)).cast("double") / 100
        punct = F.when(
            s["ns"] > 0, (s["ns"] - s["an"]).cast("double") / s["ns"]
        ).otherwise(F.lit(0.0))
        punct_term = F.lit(1.0) - punct
        hits = F.size(F.filter(s["lt"], lambda x: F.array_contains(sw_lit, x)))
        n = F.size(s["lt"])
        swr = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
        sw_term = F.least(swr * 4, F.lit(1.0))
        return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * sw_term, 6)

    return _let(bound, body)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts over lower-cased word tokens."""
    toks = words(F.lower(_c(col)))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        lit = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda x: F.array_contains(lit, x)))
    return out


def lang_id(col: Column | str, min_hits: int = 1) -> Column:
    """Argmax language by marker hits; ties broken by fixed lexicon order
    (en, es, fr, de); below ``min_hits`` → 'unknown'.

    Same argmax/tie-break arithmetic as always, with two let-bindings
    (:func:`_let`): the lower-cased token array is computed once per row
    (not once per marker-scan), and the four marker-hit counts plus
    their max are computed once (not once per CASE branch — the unbound
    form re-counted every score ~7× through the tie-break chain)."""
    langs = list(LANG_MARKERS)

    def body(toks: Column) -> Column:
        scores = {}
        for lang, markers in LANG_MARKERS.items():
            lit = F.array(*[F.lit(w) for w in markers])
            scores[lang] = F.size(
                F.filter(toks, lambda x: F.array_contains(lit, x))
            )
        best = scores[langs[0]]
        for lang in langs[1:]:
            best = F.greatest(best, scores[lang])
        bound = F.struct(
            *[scores[lang].alias(f"s_{lang}") for lang in langs],
            best.alias("best"),
        )

        def pick(s: Column) -> Column:
            expr = F.lit("unknown")
            for lang in reversed(langs):  # earlier langs win ties
                expr = F.when(
                    (s[f"s_{lang}"] == s["best"]) & (s["best"] >= min_hits),
                    F.lit(lang),
                ).otherwise(expr)
            return expr

        return _let(bound, pick)

    return _let(words(F.lower(_c(col))), body)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup: lower-case, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text
    (content-addressing for exact dedup and lineage)."""
    return F.md5(normalize_text(col))


def chunk_documents(
    col: Column | str, *, chunk_tokens: int = 128, overlap: int = 32
) -> Column:
    """Array of overlapping token-bounded chunks — the context-window
    prep dual of pack_sequences (short docs pack UP to the window, long
    docs chunk DOWN into it). Chunk i covers word tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk_tokens −
    overlap; the last chunk may be short; a doc at or under one window
    yields exactly one chunk. Pure Catalyst (sequence/transform/slice
    over the token array — one scan, no explode until the caller, no
    Python), so at 100 TB chunking rides whole-stage codegen.

    Returns array<struct<chunk_id int, chunk_text string, n_tokens
    int>> — posexplode at the call site for one row per chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    # NULL text coalesces to '' BEFORE tokenizing: size(NULL)=NULL makes
    # greatest/least SKIP the null operand (not propagate it), so an
    # unguarded NULL doc would yield one chunk claiming n_tokens =
    # chunk_tokens — corrupting downstream token accounting. '' yields
    # one empty chunk with n_tokens=0 (same convention as the dedup
    # index builders: NULL and empty text both carry no content).
    #
    # The token array is let-bound (:func:`_let`): the unbound form
    # referenced the tokenizer from inside the per-chunk transform
    # lambda, and interpreted HOF evaluation re-tokenized the text once
    # per CHUNK (same r18 finding as dedup.word_shingles).
    def body(toks: Column) -> Column:
        n = F.size(toks)
        n_chunks = F.greatest(
            F.lit(1),
            F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"),
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.concat_ws(
                    " ", F.slice(toks, i * stride + 1, chunk_tokens)
                ).alias("chunk_text"),
                F.least(F.lit(chunk_tokens), n - i * stride)
                .cast("int")
                .alias("n_tokens"),
            ),
        )

    return _let(words(normalize_text(F.coalesce(_c(col), F.lit("")))), body)
