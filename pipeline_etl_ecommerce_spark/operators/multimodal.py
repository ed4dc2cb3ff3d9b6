"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (the image/audio libraries are not
in this environment — ``decode_image`` raises NotImplementedError, and
``fake_decode`` is the deterministic stand-in used by tests) — but the
Spark-side plumbing is real and load-bearing: schema contract, Arrow batch
iteration, partition sizing. Swapping a real PIL/ffmpeg kernel into
``_batch_features`` changes nothing structural.

Scale notes: binary payloads ride the shuffle only if you shuffle them —
keep decode/feature-extract as the FIRST map stage after the scan, project
the bytes away, and only the small feature columns move afterwards.
``spark.sql.files.maxPartitionBytes`` bounds the per-task batch footprint.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media row: opaque payload + typed metadata (mime drives the kernel choice)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("decode_status", StringType()),
    ]
)


def decode_image(payload: bytes) -> dict:
    """Real image decode — requires an imaging library not present here.
    STUB: replace with PIL/torchvision in a full environment."""
    raise NotImplementedError("image decode requires an imaging library (PIL); not available in this environment")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in kernel: byte length + md5. Exercises the same
    batch path a real decoder would."""
    return {
        "n_bytes": len(payload),
        "content_hash": hashlib.md5(payload).hexdigest(),
        "decode_status": "ok",
    }


def _batch_features(batches: Iterator[pd.DataFrame], kernel) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            try:
                f = kernel(bytes(payload) if payload is not None else b"")
            except NotImplementedError:
                f = {"n_bytes": None, "content_hash": None, "decode_status": "decoder_unavailable"}
            f["media_id"] = media_id
            feats.append(f)
        yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_features(media: DataFrame, kernel=fake_decode) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the bytes into Python in columnar batches (never row-at-a-
    time pickling); output carries only small feature columns."""
    return media.select("media_id", "payload").mapInPandas(
        lambda it: _batch_features(it, kernel), schema=FEATURE_SCHEMA
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests/benchmarks: treat document text bytes as an opaque
    payload so the multimodal path has real data to chew on."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("mime_type"),
        F.col("text").cast("binary").alias("payload"),
    )
