"""Semi-structured ingestion formats: JSONL and typed CSV.

A crawl/training corpus lands as JSONL far more often than parquet, and
operational exports land as CSV; the reference ingests only via JDBC and
HDFS file copy (``hdfs_to_iceberg hooks.py:86-112``). Both scans follow
the schema-on-read discipline that survives 100 TB: an EXPLICIT schema —
never ``inferSchema``, which triggers a full extra pass over the data —
and PERMISSIVE corrupt-record capture so one malformed line quarantines
instead of failing the job.

Queries here register last (after ``table_evolution``) so they queue at
the tail of the driver-check rotation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from etl_to_iceberg_spark.registry import register
from etl_to_iceberg_spark.sources.tables import load_table
from etl_to_iceberg_spark.scratch import scratch_dir

_layout_cache: dict[tuple[str, str], str] = {}

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register(
    "scan_jsonl_docs",
    sql="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def scan_jsonl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus ingestion with explicit schema and corrupt-line
    quarantine: the documents table round-trips through JSON-lines files,
    plus one planted malformed line that PERMISSIVE mode captures into
    ``_corrupt_record`` — it is filtered out (in production: routed to a
    quarantine sink), so the clean output equals the source table.

    Scale shape: explicit schema means ONE pass (``inferSchema`` would
    scan the corpus twice); JSONL splits by line so a 100 TB directory
    parallelizes to normal file-split tasks."""
    key = ("jsonl", os.path.abspath(sf_dir))
    if key not in _layout_cache:
        # one materialization per (process, sf_dir) — a per-call write
        # would make bench loops time the round-trip WRITE and leak a
        # corpus copy per run (same per-process cache as relational._events_as)
        work = scratch_dir(prefix="e2is_jsonl_")
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        docs.write.mode("overwrite").json(work)
        with open(os.path.join(work, "part-corrupt.json"), "w") as f:
            f.write('{"doc_id": "not-a-number", "text": 17 oops}\n')
        _layout_cache[key] = work
    work = _layout_cache[key]
    schema = T.StructType(
        _DOCS_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(work)
    )
    return raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


@register(
    "scan_csv_typed",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
)
def scan_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed CSV ingestion: orders round-trips through headered CSV and is
    read back with an explicit schema — longs, doubles, and timestamps
    land typed (the reference's CSV path string-types everything and
    recasts downstream). Doubles survive exactly (shortest-round-trip
    formatting both ways); timestamps parse from the written ISO form.

    Scale shape: one pass, explicit schema, line-splittable files."""
    key = ("csv", os.path.abspath(sf_dir))
    if key not in _layout_cache:
        work = scratch_dir(prefix="e2is_csv_")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        )
        orders.write.mode("overwrite").option("header", True).csv(work)
        _layout_cache[key] = work
    work = _layout_cache[key]
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(work)
