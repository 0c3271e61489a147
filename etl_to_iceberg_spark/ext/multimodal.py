"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the media is an opaque
``binary`` column (or a reference to object storage) with a typed metadata
struct beside it; decode/feature-extraction runs as Arrow-batched Pandas
UDFs over ``mapInPandas`` so each task processes a columnar batch without
JVM→Python row churn.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
the decode step is stubbed behind ``MediaCodecUnavailable`` with a
deterministic fake used by tests — but everything Spark-side (schema,
batch iteration, UDF signatures, partitioning) is real and exercised.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


class MediaCodecUnavailable(NotImplementedError):
    """Raised where a real image/audio codec would be invoked."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def byte_segments(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    seg: int = 128,
) -> DataFrame:
    """Fixed-size byte segmentation of a binary column — the
    chunked-upload / windowed-decode prep step (segment a blob BEFORE
    shipping it to a Pandas-UDF decoder so one 4 GB video never pins one
    task). Pure Catalyst: sequence+posexplode for segment numbers, SQL
    substring on the binary column for the slice; seg_len is measured
    from the sliced bytes, not inferred. A zero-byte payload produces NO
    segment rows: sequence(0, -1) is the DESCENDING [0, -1], not empty,
    so the count expression is guarded to an empty array (posexplode
    then emits nothing) — unguarded it emitted two phantom segments."""
    blen = F.length(content_col)
    n_segs = F.ceil(blen.cast("double") / seg).cast("int")
    return df.select(
        id_col,
        content_col,
        F.posexplode(
            F.when(n_segs > 0, F.sequence(F.lit(0), n_segs - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("seg_no", "_"),
    ).select(
        id_col,
        F.col("seg_no").cast("int").alias("seg_no"),
        (F.col("seg_no").cast("bigint") * seg).alias("seg_offset"),
        # typed column API, not an interpolated SQL string, so names that
        # would break SQL parsing (keywords, dashes) work; dotted names
        # still mean nested-field access, as everywhere F.col is used
        F.length(
            F.substring(
                F.col(content_col), F.col("seg_no") * seg + 1, F.lit(seg)
            )
        ).cast("int").alias("seg_len"),
    )


def attach_media_metadata(
    df: DataFrame, content_col: str = "content", mime: str = "application/octet-stream"
) -> DataFrame:
    """Build the typed metadata struct next to a binary column."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(content_col)).cast("long").alias("duration_ms"),
        ),
    )


def decode_image(content: bytes) -> object:
    """STUB: decode an image payload. Requires a codec library (PIL etc.)
    absent from this environment."""
    raise MediaCodecUnavailable(
        "image decode requires an imaging library (e.g. PIL); "
        "install one and replace this stub"
    )


def fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: dim floats in [0,1)
    derived from sha256(content). Replace with a real encoder in prod."""
    h = hashlib.sha256(content or b"").digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    dim: int = 8,
    batch_note: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas.

    Output: (media_id, byte_len, feature: array<double>). The UDF receives
    pandas batches (Arrow transfer) — the real pattern for plugging a model
    into the scan; swap ``fake_features`` for the model call."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("byte_len", T.LongType(), True),
            T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "byte_len": content.map(lambda b: len(b) if b is not None else 0),
                    "feature": content.map(lambda b: fake_features(b, dim)),
                }
            )

    from etl_to_iceberg_spark.plans import ensure_parallelism

    # Python-side work scales with partitions: one Arrow stream per task.
    src = ensure_parallelism(df.select(id_col, content_col))
    return src.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
    every_ms: int = 25,
) -> DataFrame:
    """Frame sampling plan for video-like payloads: one row per sampled
    frame timestamp — pure Catalyst (sequence + posexplode), the decode of
    each frame being the pluggable (stubbed) step."""
    frames = F.sequence(
        F.lit(0).cast("long"),
        (F.col(duration_col) - 1).cast("long"),
        F.lit(every_ms).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(frames).alias("frame_no", "frame_ts_ms"),
    )


def resize_plan(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize is decode → transform → encode; without a codec this records
    the target geometry in metadata (the Spark-side plumbing), leaving the
    pixel work to the stubbed codec."""
    return df.withColumn(
        "meta",
        F.col("meta").withField("width", F.lit(width)).withField(
            "height", F.lit(height)
        ),
    )
