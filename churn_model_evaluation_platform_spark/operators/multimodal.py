"""Multimodal columns (north-star extension): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked); everything Spark-side —
schema, partitioning, UDF signatures, Arrow batch shapes — is real and
tested. Swap ``_decode_stub`` for a real decoder (PIL/librosa/ffmpeg) in
an environment that has them; nothing else changes.

Scale notes: binary payloads ride the shuffle only when explicitly
repartitioned; feature extraction is mapInPandas (no shuffle at all);
batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch so
executor memory is bounded regardless of blob size skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried beside every blob.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_entropy", DoubleType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _decode_stub(content: bytes, media_type: str) -> list[float]:
    """STUB decoder — deterministic fake features from the raw bytes.

    Real implementation would be e.g. PIL.Image.open(BytesIO(content))
    → resize → pixel stats; the container has no codec libraries, so we
    emit a 8-bucket byte histogram (deterministic, schema-identical).
    Raise NotImplementedError here if silent fakes are unacceptable.
    """
    if content is None:
        return []
    counts = [0] * 8
    for b in content:
        counts[b >> 5] += 1
    n = max(len(content), 1)
    return [c / n for c in counts]


def _entropy(content: bytes) -> float:
    import math

    if not content:
        return 0.0
    counts: dict[int, int] = {}
    for b in content:
        counts[b] = counts.get(b, 0) + 1
    n = len(content)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media rows (mapInPandas —
    zero shuffle; each executor streams its partitions' blobs).

    NOTE: ``_decode_stub``/``_entropy`` are module-level, so cloudpickle
    ships them BY REFERENCE — Python workers must be able to import this
    package. ``sources.testdata.ensure_package_shipped`` (called by every
    registry query via load_table) addPyFiles a zip of the package so
    this holds regardless of the driver's cwd/sys.path."""
    decode = _decode_stub
    entropy = _entropy

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "byte_entropy": [
                        entropy(c) if c is not None else 0.0
                        for c in pdf["content"]
                    ],
                    "features": [
                        decode(c, t)
                        for c, t in zip(pdf["content"], pdf["media_type"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes blobs through the Arrow boundary and
    restamps metadata. The pixel work is a STUB (no codecs here) — the
    content is passed through unchanged; a real impl replaces the
    identity in ``run``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, df.schema)


def sample_frames(
    df: DataFrame, every_ms: int, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode each video into
    (media_id, frame_idx, ts_ms) rows from its duration metadata — pure
    Catalyst (sequence + explode); the frame DECODE would hang off this
    skeleton via mapInPandas."""
    n_frames = (F.col("duration_ms") / F.lit(every_ms)).cast("int")
    return (
        df.where(F.col("media_type") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))
    )
