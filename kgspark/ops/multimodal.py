"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_image_stub` produces a deterministic fake (dimensions derived from
the payload hash) and `decode_image_real` raises NotImplementedError with
the intended real implementation documented. Everything Spark-side — the
schema contract, batch shape, partitioning, and the UDF signatures — is
real and tested, so swapping in PIL/libvips/ffmpeg later touches only the
stub body.

Scale: decode is map-only (no shuffle); binary payloads ride Arrow buffers
zero-copy. For very large payloads set spark.sql.files.maxPartitionBytes
down so one task's Arrow batch fits executor memory, and prefer
`spark.sql.execution.arrow.maxRecordsPerBatch` tuning over repartitioning.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "meta map<string,string>"
)

DECODED_IMAGE_SCHEMA = (
    "media_id string, width int, height int, n_channels int, "
    "mean_luma double, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_ts double, frame_hash string"


def decode_image_real(payload: bytes):
    """Real decode — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libvips (not installed); "
        "replace decode_image_stub with e.g. PIL.Image.open(io.BytesIO(payload))"
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int, float, bool]:
    """Deterministic fake decode: dims/luma derived from payload sha256."""
    if payload is None:
        return (0, 0, 0, 0.0, False)
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] * 8
    height = 64 + h[1] * 8
    channels = 1 + (h[2] % 3)
    mean_luma = round(h[3] / 255.0, 6)
    return (width, height, channels, mean_luma, True)


def decode_images(media: DataFrame) -> DataFrame:
    """media(media_id, payload, ...) -> typed image metadata rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            decoded = [decode_image_stub(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "mean_luma": [d[3] for d in decoded],
                    "decode_ok": [d[4] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, DECODED_IMAGE_SCHEMA)


def sample_frames(media: DataFrame, every_n_seconds: float = 1.0, duration_key: str = "duration_s") -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame.

    Frame extraction is stubbed (hash of payload+idx stands in for pixel
    data); the fan-out shape — binary blob -> N typed rows — is the real
    contract (UDTF-shaped, SURVEY.md §2.12)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts": [], "frame_hash": []}
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                dur = float((meta or {}).get(duration_key, "0") or 0)
                n = max(int(dur / every_n_seconds), 1) if payload is not None else 0
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts"].append(round(i * every_n_seconds, 6))
                    rows["frame_hash"].append(
                        hashlib.sha256((payload or b"") + str(i).encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload", "meta").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def gen_media_fixture(spark, n: int = 50) -> DataFrame:
    """Deterministic binary-payload fixture (images + videos)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        kind = "image" if i % 3 else "video"
        meta = {"duration_s": str(2 + i % 5)} if kind == "video" else {}
        rows.append((f"m{i:04d}", kind, payload, f"application/x-{kind}", meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
