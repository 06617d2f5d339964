"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

Image METADATA decode is REAL: width/height/channels are byte-parsed from
the container headers (PNG IHDR, GIF logical-screen descriptor, JPEG SOFn,
BMP info header) with the stdlib only — no PIL/libvips needed. Full pixel
decode (decompression) is the one part that still needs an image library;
`mean_luma` is therefore a deterministic proxy (mean payload byte) and a
real luma only requires swapping `_payload_luma` for a PIL call. Everything
Spark-side — the schema contract, batch shape, partitioning, and the UDF
signatures — is real and tested.

Scale: decode is map-only (no shuffle); binary payloads ride Arrow buffers
zero-copy. For very large payloads set spark.sql.files.maxPartitionBytes
down so one task's Arrow batch fits executor memory, and prefer
`spark.sql.execution.arrow.maxRecordsPerBatch` tuning over repartitioning.
"""

from __future__ import annotations

import hashlib
import struct
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

# PNG color type -> sample channels (grayscale, rgb, palette, gray+alpha, rgba)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_channels) from PNG/GIF/JPEG/BMP container bytes.

    Pure-stdlib byte slicing — the header formats are public and fixed:
    PNG IHDR (big-endian u32 dims at offset 16, color type at 25), GIF
    logical screen (little-endian u16 at 6), JPEG SOFn segment walk, BMP
    BITMAPINFOHEADER (little-endian i32 at 18). Returns None when the
    payload is not a recognized image container."""
    if payload is None or len(payload) < 24:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        color_type = b[25] if len(b) > 25 else 2
        return (w, h, _PNG_CHANNELS.get(color_type, 3))
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return (w, h, 3)
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn frame header
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return None
            # 0xFF is also a legal fill/padding byte before a marker —
            # skip the run instead of misreading a bogus segment length
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 9 >= len(b):
                return None
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xDA, 0xD9):
                # SOS starts entropy-coded data (no segment table past it)
                # and EOI ends the stream: no SOFn was seen — stop cleanly
                return None
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                n_comp = b[i + 9]
                return (w, h, n_comp)
            i += 2 + seg_len
        return None
    if b[:2] == b"BM" and len(b) >= 30:
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        return (w, abs(h), max(bpp // 8, 1))
    return None


def _payload_luma(b: bytes) -> float:
    """Deterministic luma proxy: mean payload byte / 255 (a real luma needs
    pixel decompression — the one step that still requires an image lib)."""
    if not b:
        return 0.0
    return round(sum(b) / len(b) / 255.0, 6)


def decode_image_header(payload: bytes) -> tuple[int, int, int, float, bool]:
    """Header-parse decode: real dims/channels, proxy luma, ok flag."""
    parsed = parse_image_header(payload)
    if parsed is None:
        return (0, 0, 0, 0.0, False)
    w, h, ch = parsed
    return (w, h, ch, _payload_luma(bytes(payload)), True)


def decode_images(media: DataFrame) -> DataFrame:
    """media(media_id, payload, ...) -> typed image metadata rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            decoded = [decode_image_header(p) for p in b["payload"]]
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


def make_image_bytes(fmt: str, width: int, height: int, filler: bytes = b"") -> bytes:
    """Minimal valid-header image bytes for tests (PNG/GIF/JPEG/BMP)."""
    if fmt == "png":
        ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + filler
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + filler
    if fmt == "jpeg":
        sof0 = b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + bytes([8]) + struct.pack(
            ">HH", height, width
        ) + bytes([3])
        return b"\xff\xd8" + sof0 + filler
    if fmt == "bmp":
        info = struct.pack("<I", 40) + struct.pack("<ii", width, height) + struct.pack(
            "<HH", 1, 24
        )
        return b"BM" + b"\x00" * 12 + info + filler
    raise ValueError(fmt)


def gen_media_fixture(spark, n: int = 50) -> DataFrame:
    """Deterministic binary-payload fixture: real image headers + videos."""
    fmts = ["png", "gif", "jpeg", "bmp"]
    rows = []
    for i in range(n):
        kind = "image" if i % 3 else "video"
        filler = hashlib.sha256(f"media{i}".encode()).digest() * 4
        if kind == "image":
            fmt = fmts[i % 4]
            payload = make_image_bytes(fmt, 64 + 8 * (i % 50), 64 + 8 * ((i * 7) % 50), filler)
            mime = f"image/{fmt}"
            meta = {"fmt": fmt}
        else:
            payload = filler
            mime = "application/x-video"
            meta = {"duration_s": str(2 + i % 5)}
        rows.append((f"m{i:04d}", kind, payload, mime, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
