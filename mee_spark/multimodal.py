"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media payloads are opaque ``binary`` columns + typed metadata structs;
all Spark-side machinery — schema, partitioning, Arrow batch shape,
mapInPandas signatures, size accounting — is real and tested. The actual
codec work (JPEG decode, resampling, frame extraction) is STUBBED: the
image/audio libraries are not in this container, so ``decode_image`` &
co. raise NotImplementedError unless the deterministic fake is selected.
The fake parses our synthetic header format so the full pipeline runs
end-to-end deterministically in tests.

Design notes for 100 TB of media:
  * binary columns ride in Parquet row groups; ``maxPartitionBytes``
    governs scan parallelism — metadata-only queries never touch the
    bytes thanks to Parquet column pruning (tested via ReadSchema).
  * decode/extract runs in ``mapInPandas`` (Arrow batches of binary),
    with ``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so a
    batch of decoded frames fits executor memory.
  * derived features (embeddings, thumbnails) are written as separate
    narrow tables keyed by content hash — never widen the media table.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("mime", StringType(), False),
    StructField("payload", BinaryType(), False),     # opaque bytes
    StructField("width", IntegerType(), True),       # typed metadata
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

_MAGIC = b"MEEFAKE1"


def make_fake_payload(media_id: int, kind: str, w: int = 0, h: int = 0,
                      duration_ms: int = 0) -> bytes:
    """Deterministic synthetic payload: header + seeded noise bytes."""
    rng = np.random.default_rng(media_id * 7919 + 17)
    body = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    head = _MAGIC + struct.pack("<qiii", media_id, w, h, duration_ms) + kind.encode().ljust(8)
    return head + body


def _parse_fake(payload: bytes) -> tuple[int, int, int, int, str]:
    if not payload.startswith(_MAGIC):
        raise ValueError("not a MEEFAKE payload")
    mid, w, h, dur = struct.unpack("<qiii", payload[8:28])
    kind = payload[28:36].rstrip(b" ").decode()
    return mid, w, h, dur, kind


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """payload -> HxWx3 uint8 array. REAL decode is stubbed (no PIL/cv2
    in this container); the deterministic fake synthesizes pixels from
    the payload header so downstream shape logic is fully exercised."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg — not available here; "
            "pass fake=True for the deterministic synthetic decoder")
    mid, w, h, _, _ = _parse_fake(payload)
    rng = np.random.default_rng(mid)
    return rng.integers(0, 256, (max(h, 1), max(w, 1), 3), dtype=np.uint8)


def image_features(media: DataFrame, fake: bool = True,
                   batch_hint: int = 64) -> DataFrame:
    """(media_id, width, height, mean_r, mean_g, mean_b, phash) via
    mapInPandas over Arrow batches of binary payloads — the real
    decode/feature-extract execution shape."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload), fake=fake)
                means = img.reshape(-1, 3).mean(axis=0)
                phash = int(np.abs(img.astype(np.int64)).sum() % (1 << 60))
                rows.append((int(mid), img.shape[1], img.shape[0],
                             float(means[0]), float(means[1]), float(means[2]), phash))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "mean_r", "mean_g", "mean_b", "phash"])

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        extract,
        "media_id long, width int, height int, mean_r double, mean_g double, "
        "mean_b double, phash long",
    )


def audio_frames(media: DataFrame, frame_ms: int = 1000, fake: bool = True) -> DataFrame:
    """(media_id, frame_idx, rms) — frame sampling shape for audio: one
    output row per fixed-size frame; decode stubbed behind the fake."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                if not fake:
                    raise NotImplementedError("real audio decode unavailable here")
                mid_, _, _, dur_, _ = _parse_fake(bytes(payload))
                n_frames = max(1, int(dur or dur_) // frame_ms)
                rng = np.random.default_rng(mid_ * 31 + 7)
                for i in range(n_frames):
                    rows.append((int(mid), i, float(np.round(rng.random(), 6))))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "rms"])

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(sample, "media_id long, frame_idx int, rms double")


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read payload bytes (column
    pruning; asserted in tests via the scan's ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.length("mime")).cast("long").alias("mime_bytes"),
        F.max("width").alias("max_width"),
    )
