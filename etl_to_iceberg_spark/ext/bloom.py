"""Bloom-filter membership for broadcast-scale decontamination.

`corpus_decontaminate` broadcasts the eval set's DISTINCT shingle strings
and equi-joins the exploded corpus against them — correct, but the
broadcast grows with the eval suite's raw text and the corpus side still
explodes one row per shingle into a join. The Bloom shape replaces both:
the eval shingles collapse to a fixed-size BITSET (2^20 bits per hash
seed ≈ 128 KB per seed packed as 64-bit words, independent of shingle
count), and the corpus side tests membership with pure column
expressions inside its scan — no explode into a join, no shuffle, the
100 TB text never leaves its partition. The price is a quantified
false-positive rate (a shingle whose k bit positions are all set by
other shingles), which for decontamination only over-drops: acceptable
and standard (CCNet/Dolma ship exactly this trade).

Portability is what earns the op a full DuckDB oracle: bit positions are
HEX SLICES of md5 — seed ``i`` reads 5 hex digits at offset ``1+5*i``,
so each position is an integer in [0, 16^5) = [0, 2^20) with no modulo,
and the partitioned filter (seed i owns its own 2^20-bit region) keeps
the oracle a plain (seed, idx) equi-join. Spark converts the slice with
``conv(hex, 16, 10)``; DuckDB lacks ``conv`` so the oracle does the
base-16 arithmetic digit-by-digit (see :func:`hex5_duck_sql`) — same
integer, bit-identical decisions, including the false positives.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

# 5 hex digits per seed slice: positions in [0, 16^5) = [0, 2^20), so the
# per-seed region is exactly 2^20 bits (128 KB) with no modulo step.
_HEX_DIGITS_PER_SEED = 5
BLOOM_M = 16**_HEX_DIGITS_PER_SEED  # 1,048,576 bits per seed
BLOOM_K = 3  # md5's 32 hex digits allow up to 6 independent 5-digit slices


def _seed_offsets(k: int) -> list[int]:
    if k * _HEX_DIGITS_PER_SEED > 32:
        raise ValueError(f"k={k}: md5 has 32 hex digits, need {k * 5}")
    return [1 + _HEX_DIGITS_PER_SEED * i for i in range(k)]


def _idx_sql(h: str, offset: int) -> str:
    """Spark SQL: the 5-hex-digit slice of ``h`` at 1-based ``offset`` as
    a BIGINT in [0, 2^20)."""
    return f"CAST(conv(substring({h}, {offset}, {_HEX_DIGITS_PER_SEED}), 16, 10) AS BIGINT)"


def hex5_duck_sql(h: str, offset: int) -> str:
    """DuckDB SQL for the same 5-hex-digit slice as :func:`_idx_sql` —
    digit-by-digit base-16 arithmetic, since DuckDB has no ``conv``."""
    terms = [
        f"(strpos('0123456789abcdef', substr({h}, {offset + j}, 1)) - 1)"
        f" * {16 ** (_HEX_DIGITS_PER_SEED - 1 - j)}"
        for j in range(_HEX_DIGITS_PER_SEED)
    ]
    return "(" + " + ".join(terms) + ")"


def bloom_bitmap(shingles: DataFrame, *, k: int = BLOOM_K) -> DataFrame:
    """ONE-ROW DataFrame ``(bm: map<bigint, bigint>)`` — the partitioned
    Bloom bitset over the distinct values of ``shingles``'s single string
    column ``s``, packed 64 bits per map word (global bit g = seed*M +
    idx; word g>>6, bit g&63). Built fully in-engine: explode the k
    positions per shingle, distinct (tiny — bounded by k * 2^20 bits),
    bit_or the packed words, collect into a map in a single-row agg.
    The map is position-set-sized (≤ k * |shingles| entries), not
    corpus-sized — the broadcast-scalar shape."""
    h = F.md5(F.col("s").cast("binary"))
    gs = [
        F.expr(_idx_sql("__h", off)) + F.lit(i * BLOOM_M)
        for i, off in enumerate(_seed_offsets(k))
    ]
    return (
        shingles.select(h.alias("__h"))
        .select(F.explode(F.array(*gs)).alias("g"))
        .distinct()
        .select(
            F.shiftright("g", 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(g & 63 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("word"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bm"))
    )


def bloom_probe_expr(h_col: str, *, bm_col: str = "bm", k: int = BLOOM_K) -> str:
    """Spark SQL boolean: does the md5-hex column ``h_col`` test
    Bloom-positive against the bitmap map column ``bm_col``?  Pure
    substring/conv/shift/mask arithmetic over an already-materialized
    hash — codegen-friendly scalar work, no join, no lambda."""
    conds = []
    for i, off in enumerate(_seed_offsets(k)):
        g = f"({_idx_sql(h_col, off)} + {i * BLOOM_M})"
        word = f"coalesce(element_at({bm_col}, shiftright({g}, 6)), CAST(0 AS BIGINT))"
        conds.append(f"((shiftright({word}, CAST({g} & 63 AS INT)) & 1) = 1)")
    return "(" + " AND ".join(conds) + ")"


def bloom_contains_expr(shingles_col: str, *, bm_col: str = "bm", k: int = BLOOM_K) -> str:
    """Spark SQL boolean: does ANY shingle in the array column
    ``shingles_col`` test Bloom-positive against the bitmap map column
    ``bm_col``?  The md5 per shingle is materialized once via an inner
    ``transform`` (not re-derived per seed), then each hash is probed
    with :func:`bloom_probe_expr`. NOTE: higher-order lambdas evaluate
    interpreted (outside codegen) — fine for the model-sweep tests and
    small relations this serves, but the corpus-scale path in
    `corpus_bloom_decontaminate` explodes hashes and filters with the
    scalar probe instead (measured ~10x at sf0.1)."""
    return (
        f"exists(transform({shingles_col}, s -> md5(cast(s AS BINARY))), "
        f"h -> {bloom_probe_expr('h', bm_col=bm_col, k=k)})"
    )


def model_positions(shingle: str, *, k: int = BLOOM_K) -> list[tuple[int, int]]:
    """Pure-Python reference: the (seed, idx) positions of one shingle —
    for the model-sweep tests, independent of both engines."""
    h = hashlib.md5(shingle.encode()).hexdigest()
    return [
        (i, int(h[off - 1 : off - 1 + _HEX_DIGITS_PER_SEED], 16))
        for i, off in enumerate(_seed_offsets(k))
    ]
