"""Deterministic sampling & dataset splitting for training-data pipelines.

A training corpus needs reproducible, content-addressed assignment:
re-running the pipeline on the same data — at any parallelism, on any
cluster — must produce the same split, and adding documents must never
move an existing document between splits. Random sampling (`rand()`,
`df.sample`) violates both; the idiomatic shape is a hash of a stable key.

Here the hash is md5 of the normalized text (the same content fingerprint
exact dedup uses — see ext/text.fingerprint), bucketed by hex digits:
16 equal buckets per digit, pure column expressions, portable across
engines (which is what makes these oracle-checkable). Production splits
at finer granularity use more digits (16^k buckets) — same pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from etl_to_iceberg_spark.ext.text import fingerprint

TRAIN_BUCKETS = list("0123456789ab")  # 12/16 = 75%
VALID_BUCKETS = list("cd")  # 2/16 = 12.5%
TEST_BUCKETS = list("ef")  # 2/16 = 12.5%


def hash_bucket(text_col: Column | str, digit: int = 1) -> Column:
    """One hex digit (16 buckets) of the content fingerprint. ``digit``
    selects independent bucketings (digit 1 for splits, 2 for sampling …)."""
    return F.substring(fingerprint(text_col), digit, 1)


def assign_split(text_col: Column | str) -> Column:
    """'train' | 'valid' | 'test' by content-hash bucket (75/12.5/12.5)."""
    b = hash_bucket(text_col, 1)
    return (
        F.when(b.isin(TRAIN_BUCKETS), F.lit("train"))
        .when(b.isin(VALID_BUCKETS), F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def split_dataset(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, valid, test) DataFrames — disjoint, exhaustive, stable."""
    tagged = df.withColumn("__split", assign_split(text_col))
    return (
        tagged.where(F.col("__split") == "train").drop("__split"),
        tagged.where(F.col("__split") == "valid").drop("__split"),
        tagged.where(F.col("__split") == "test").drop("__split"),
    )


def stratified_sample(
    df: DataFrame,
    *,
    text_col: str = "text",
    buckets: list[str] | None = None,
    digit: int = 2,
) -> DataFrame:
    """Deterministic ~|buckets|/16 sample, uniform within every stratum
    because the hash is independent of any grouping column. Unlike
    ``df.sample`` this is reproducible and stable under appends; unlike
    ``sampleBy`` it needs no per-key fraction map or RNG seed."""
    keep = buckets if buckets is not None else list("0123")  # 4/16 = 25%
    return df.where(hash_bucket(text_col, digit).isin(keep))


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    group_col: str | None = None,
    budget: int = 2048,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    CONTIGUOUS greedy packing: within each group (e.g. source shard), docs
    in id order accumulate into a sequence until the budget would
    overflow, then a new sequence starts.

    Output: (id, group?, n_tokens, seq_id, seq_offset) — seq_id is the
    sequence containing the doc's FIRST token, seq_offset the position of
    that token inside the sequence.

    This is concatenate-then-chunk packing (the standard causal-LM
    pretraining shape): the group's docs form one token stream, cut every
    ``budget`` tokens; docs may straddle a cut, and downstream chunking
    splits them. Scale shape: ONE window (cumulative sum over the group's
    id order) — no driver loop, no UDF, order-stable and parallel per
    group; exact first-fit bin packing is a sequential recurrence and
    does not distribute."""
    keys = [group_col] if group_col else []
    w = Window.partitionBy(*keys).orderBy(id_col) if keys else Window.orderBy(id_col)
    cum = F.sum(tokens_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq_local = F.floor((cum - F.col(tokens_col)) / F.lit(budget))
    return df.select(
        id_col,
        *keys,
        F.col(tokens_col),
        seq_local.cast("long").alias("seq_id"),
        ((cum - F.col(tokens_col)) % F.lit(budget)).cast("long").alias("seq_offset"),
    )
