"""Deterministic split/sample semantics (ext/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_to_iceberg_spark.ext.sampling import (
    assign_split,
    hash_bucket,
    split_dataset,
    stratified_sample,
)
from etl_to_iceberg_spark.sources.tables import load_table


def test_split_disjoint_and_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train, valid, test = split_dataset(docs)
    n = docs.count()
    nt, nv, ns = train.count(), valid.count(), test.count()
    assert nt + nv + ns == n
    # disjoint by construction; verify via ids
    ids = (
        train.select("doc_id")
        .intersect(valid.select("doc_id"))
        .union(train.select("doc_id").intersect(test.select("doc_id")))
        .union(valid.select("doc_id").intersect(test.select("doc_id")))
    )
    assert ids.count() == 0
    # roughly 75/12.5/12.5 (loose bounds; small corpus)
    assert nt > nv and nt > ns


def test_split_stable_under_rerun_and_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select("doc_id", assign_split("text").alias("s"))
    b = docs.repartition(7).select("doc_id", assign_split("text").alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_stable_under_append(spark, sf_dir):
    """Adding documents must not move existing ones between splits."""
    docs = load_table(spark, sf_dir, "documents")
    subset = docs.where(F.col("doc_id") % 2 == 0)
    full_assign = docs.select("doc_id", assign_split("text").alias("s"))
    sub_assign = subset.select("doc_id", assign_split("text").alias("s"))
    joined = sub_assign.alias("a").join(
        full_assign.alias("b"), on="doc_id"
    ).where(F.col("a.s") != F.col("b.s"))
    assert joined.count() == 0


def test_stratified_sample_independent_of_split_digit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(docs)
    assert 0 < sampled.count() < docs.count()
    # sample digit (2) differs from split digit (1): the sample must hit
    # every split, not align with one
    splits = (
        sampled.select(assign_split("text").alias("s")).distinct().count()
    )
    assert splits >= 2


def test_hash_bucket_is_hex_digit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bad = docs.select(hash_bucket("text").alias("b")).where(
        ~F.col("b").rlike("^[0-9a-f]$")
    )
    assert bad.count() == 0
