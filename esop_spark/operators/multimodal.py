"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata columns alongside; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only place Python touches the data, amortized per batch,
never per row).

The actual codec libraries (PIL/ffmpeg/...) are NOT available in this
container, so the decode step is STUBBED: ``decode_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder derives metadata purely from the byte content. The Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested.

Scale notes: binary payloads should be size-bucketed before ``mapInPandas``
(`spark.sql.files.maxPartitionBytes` governs scan-side splits; use
``repartitionByRange(n_bytes)`` if payload sizes are skewed) so Arrow batches
stay within executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum", LongType()),
    ]
)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize a media table (binary payload + metadata) from documents —
    stands in for an image/audio ingest until a real binary source exists."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(F.col("text")).cast("bigint").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image decode: metadata derived from
    byte content only (so the DuckDB oracle can mirror it)."""
    n = len(payload)
    width = n % 317
    height = n // 317
    checksum = sum(payload[:64]) if n else 0
    return width, height, checksum


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract binary payloads via Arrow-batched mapInPandas.

    With ``fake=False`` this is where PIL/librosa/ffmpeg decode would run —
    unavailable in this environment, so it raises ``NotImplementedError``
    (clearly-marked stub; the distributed plumbing around it is real).
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires codec libraries (PIL/ffmpeg) not "
            "present in this environment; use fake=True for the "
            "deterministic stand-in decoder"
        )

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            decoded = pdf["payload"].map(_fake_decode)
            pdf["width"] = decoded.map(lambda t: t[0])
            pdf["height"] = decoded.map(lambda t: t[1])
            pdf["checksum"] = decoded.map(lambda t: t[2])
            yield pdf[["media_id", "media_type", "n_bytes", "width", "height", "checksum"]]

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """Frame-sampling analog: emit one row per sampled offset of each payload
    (what video frame extraction becomes once codecs exist). Pure JVM-side —
    sequence + explode, no Python."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("n_bytes") - 1) / every_n_bytes, F.lit(0)).cast("bigint"))
        ).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
