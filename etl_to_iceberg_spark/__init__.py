"""etl_to_iceberg_spark — a PySpark-native analytics/ETL engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference ``taengkim/etl-to-iceberg``
(an Airflow plugin suite moving Oracle/HDFS-ORC data into Apache Iceberg
with CDC, upsert, and table maintenance), re-expressed Spark-first:

- All relational work is declared with the DataFrame/SQL API so Catalyst
  handles projection/filter pushdown, join strategy, and partial aggregation.
- The managed-table surface (append / overwrite / MERGE upsert / time travel
  / rollback / snapshot expiry / compaction) is provided by
  :mod:`etl_to_iceberg_spark.tables` — a snapshot-log-over-Parquet format
  that uses the real Iceberg runtime when its jar is on the classpath and a
  built-in Spark-native implementation otherwise.
- CDC is an incremental-batch/Structured-Streaming surface
  (:mod:`etl_to_iceberg_spark.operators.cdc`,
  :mod:`etl_to_iceberg_spark.streaming`).
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) live in :mod:`etl_to_iceberg_spark.ext`.

Layout::

    session.py     SparkSession builder               (ref: utils/spark_builder.py)
    types.py       source->Spark type mapping         (ref: utils/type_converter.py)
    normalize.py   name/null/timestamp normalization  (ref: utils/dataframe_utils.py)
    sources/       parquet/orc/csv/json/jdbc scans    (ref: */hooks.py)
    tables/        managed tables: snapshots, merge, maintenance
    operators/     relational ops + CDC               (ref: *_operator.py)
    functions/     scalar function library
    streaming/     Structured Streaming ingest
    ext/           dedup / similarity / text / multimodal
"""

from etl_to_iceberg_spark.session import get_spark, SessionConfig

__version__ = "0.1.0"

__all__ = ["get_spark", "SessionConfig", "__version__"]
