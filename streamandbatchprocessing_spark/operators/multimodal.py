"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas functions over ``mapInPandas``.

North-star requirement (BASELINE.json): treat image/audio/video as
``binary`` columns with typed metadata; implement decode /
feature-extract / resize / frame-sample as vectorized pandas stages.
The actual codec step is STUBBED — this container has no image/audio
libraries — behind ``_decode_payload``: when Pillow/soundfile exist
they are used, otherwise a clearly-marked deterministic fake decoder
parses the payload header we synthesize. Everything Spark-side —
schema, partitioning, UDF signatures, Arrow batch shapes — is real and
tested (tests/test_multimodal.py).

Scale notes:
  * mapInPandas streams Arrow record batches; peak executor memory is
    one batch of payloads, tuned via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set low for media:
    a 10 MB payload × 10k default batch rows would OOM — we default to
    64 rows/batch in ``media_conf``).
  * Payload columns are pruned unless referenced: metadata-only queries
    never read bytes (columnar parquet), which is why metadata lives in
    typed top-level columns, not inside the blob.
  * Repartition by ``media_id`` before decode so a hot key can't pin a
    partition; decode is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media table schema: opaque payload + typed, promoted metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256_head", StringType(), False),
        StructField("byte_mean", DoubleType(), False),
        StructField("byte_entropy_proxy", DoubleType(), False),
        StructField("decoded_width", IntegerType(), True),
        StructField("decoded_height", IntegerType(), True),
    ]
)

_MAGIC = b"SBPM"  # header of the synthesized fake media format


def synthesize_media(spark: SparkSession, n: int = 200, seed: int = 11) -> DataFrame:
    """Deterministic fake media rows: payload = 4-byte magic + packed
    (width, height, duration_ms) header + seeded pseudo-random body.
    Stands in for real jpeg/wav/mp4 bytes so the binary-column plumbing
    is exercised end-to-end."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = kinds[i % 3]
        width = 64 + digest[0] % 192 if kind != "audio" else 0
        height = 64 + digest[1] % 192 if kind != "audio" else 0
        duration = 1000 + digest[2] * 37 if kind != "image" else 0
        body = (digest * (8 + digest[3] % 8))[: 256 + digest[4]]
        payload = _MAGIC + struct.pack("<iii", width, height, duration) + body
        rows.append(
            (
                i,
                kind,
                {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind],
                width or None,
                height or None,
                duration or None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_payload(payload: bytes) -> tuple[int, int]:
    """Decode step — STUB. Real deployments plug Pillow/ffmpeg in here;
    this container has neither, so payloads in the synthesized format
    decode via their header, and anything else raises to make the stub
    boundary explicit."""
    try:  # pragma: no cover — codec libs absent in this environment
        from PIL import Image  # noqa: F401
        import io

        with Image.open(io.BytesIO(payload)) as img:
            return img.width, img.height
    except ImportError:
        pass
    if payload[:4] == _MAGIC:
        width, height, _ = struct.unpack("<iii", payload[4:16])
        return width, height
    raise NotImplementedError(
        "real media decoding requires Pillow/ffmpeg; payload is not in the "
        "synthesized SBPM format"
    )


def extract_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                arr = memoryview(payload)
                n = len(arr)
                total = sum(arr)
                distinct = len(set(arr))
                try:
                    width, height = _decode_payload(payload)
                except NotImplementedError:
                    width = height = None
                out.append(
                    (
                        row.media_id,
                        row.kind,
                        n,
                        hashlib.sha256(payload).hexdigest()[:16],
                        total / n if n else 0.0,
                        distinct / 256.0,
                        width,
                        height,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    return media.repartition("media_id").mapInPandas(_extract, FEATURES_SCHEMA)


def resize_metadata(media: DataFrame, max_dim: int = 128) -> DataFrame:
    """Resize planning: compute target dims preserving aspect ratio —
    pure column arithmetic (no bytes touched; payload column pruned)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.when(
            F.col("width").isNotNull(), F.ceil(F.col("width") * scale).cast("int")
        ).alias("target_width"),
        F.when(
            F.col("height").isNotNull(), F.ceil(F.col("height") * scale).cast("int")
        ).alias("target_height"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp via sequence+explode — the Spark-side shape of
    frame extraction (the decode of each frame is the stubbed step)."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        "duration_ms",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    ).withColumn("frame_index", (F.col("frame_ts_ms") / every_ms).cast("int"))
