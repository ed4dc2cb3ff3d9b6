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


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("resize_status", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", LongType()),
        StructField("n_bytes", LongType()),
        StructField("frame_hash", StringType()),
        StructField("sample_status", StringType()),
    ]
)


def resize_image(payload: bytes, width: int, height: int) -> dict:
    """Real image resize — requires PIL/torchvision. STUB."""
    raise NotImplementedError("image resize requires an imaging library (PIL); not available in this environment")


def fake_resize(payload: bytes, width: int, height: int) -> dict:
    """Deterministic stand-in: 'resize' = truncate the payload to the target
    pixel budget. Same batch path, schema, and output size profile as a real
    resampler."""
    out = payload[: width * height]
    return {
        "n_bytes": len(out),
        "content_hash": hashlib.md5(out).hexdigest(),
        "resize_status": "ok",
    }


def resize_media(media: DataFrame, *, width: int, height: int, kernel=fake_resize) -> DataFrame:
    """mapInPandas resize over binary payloads: one output row per input,
    carrying the resized payload's size/hash instead of the bytes (project
    the heavy column away before anything shuffles)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    r = kernel(bytes(payload) if payload is not None else b"", width, height)
                except NotImplementedError:
                    r = {"n_bytes": None, "content_hash": None, "resize_status": "decoder_unavailable"}
                r.update(media_id=media_id, width=width, height=height)
                rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_video_frames(payload: bytes, n_frames: int) -> list[dict]:
    """Real frame sampling — requires ffmpeg/av. STUB."""
    raise NotImplementedError("frame sampling requires a video library (ffmpeg/av); not available in this environment")


def fake_frame_sample(payload: bytes, n_frames: int) -> list[dict]:
    """Deterministic stand-in: split the payload into n_frames contiguous
    chunks (integer-division boundaries) and emit one row per 'frame'."""
    size = len(payload)
    frames = []
    for i in range(n_frames):
        chunk = payload[i * size // n_frames : (i + 1) * size // n_frames]
        frames.append(
            {
                "frame_index": i,
                "n_bytes": len(chunk),
                "frame_hash": hashlib.md5(chunk).hexdigest(),
                "sample_status": "ok",
            }
        )
    return frames


def sample_frames(media: DataFrame, *, n_frames: int = 4, kernel=fake_frame_sample) -> DataFrame:
    """One-to-MANY mapInPandas: each media row yields ``n_frames`` frame rows
    (the UDTF-ish shape a video pipeline needs — batch in, bigger batch out).
    Frame payload bytes never leave the stage; only index + hash + size do."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = kernel(bytes(payload) if payload is not None else b"", n_frames)
                except NotImplementedError:
                    frames = [
                        {"frame_index": None, "n_bytes": None, "frame_hash": None, "sample_status": "decoder_unavailable"}
                    ]
                for f in frames:
                    f["media_id"] = media_id
                    rows.append(f)
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests/benchmarks: treat document text bytes as an opaque
    payload so the multimodal path has real data to chew on."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("mime_type"),
        F.col("text").cast("binary").alias("payload"),
    )
