"""Multimodal-column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side contract — schema, partition-parallel
Arrow batching via ``mapInPandas``, deterministic output shape — is real
and tested. Decode tiers: ``parse_image_header`` is REAL (stdlib-only
PNG/GIF/BMP/JPEG dimension extraction from actual bytes — the
resolution-filter stage needs no pixel library; ``decode_stub=
"headers"`` runs it inside the batch contract); PIXEL decode is STUBBED
(no image/audio libs in this container): ``decode_stub="fake"`` produces
deterministic fake features from the bytes, ``decode_stub="error"``
raises NotImplementedError exactly where a real decoder
(PIL/torchaudio/ffmpeg) would plug in.

At 100 TB: binary payloads dominate I/O, so the metadata struct lives in
its own (small) columns — predicates on media_type/byte_len prune row
groups without ever reading payload bytes; mapInPandas batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor
memory stays flat regardless of payload size distribution.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL (format, width, height) extraction from actual image bytes —
    stdlib-only, no PIL: PNG IHDR, GIF logical-screen descriptor, BMP
    info header, and a JPEG SOF-marker scan. Returns None when the magic
    bytes match no known format.

    This is the one media stage that needs no pixel library, and at
    100 TB it is also the one worth running FIRST: resolution/format
    predicates (drop icons, keep ≥ 224×224) prune payloads before any
    real decoder spends CPU on them — the same role the metadata struct
    plays for row-group pruning, one level deeper into the bytes.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return ("bmp", w, abs(h))  # negative height = top-down DIB
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
                continue
            if i + 4 > len(payload):
                break
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3) and i + 9 <= len(payload):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seglen
    return None

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, width int, height int, n_frames int, checksum string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary column + typed metadata from text
    (stands in for real media bytes; encoding is deterministic)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.length(payload).alias("byte_len"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("media_meta"),
    )


def decode_features(df: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Per-payload feature extraction via Arrow-batched mapInPandas.

    The generator signature (iterator of pandas batches in/out) is the
    real production shape — a decoder swap touches only ``_decode_one``.
    """

    def _decode_one(payload: bytes) -> tuple[int, int, int]:
        if decode_stub == "error":
            raise NotImplementedError(
                "media decode requires an image/audio library not present in this "
                "container; plug PIL/torchaudio here"
            )
        if decode_stub == "headers":
            # REAL header parse (PNG/GIF/BMP/JPEG, stdlib-only); payloads
            # whose magic matches no format fall through to the fake path
            # so mixed corpora still produce a full frame.
            parsed = parse_image_header(bytes(payload))
            if parsed is not None:
                _, w, h = parsed
                return w, h, 1
        # Deterministic fake: derive pseudo-dimensions from the byte length
        # and first bytes so tests have stable expectations.
        n = len(payload)
        w = 16 + (n % 1024)
        h = 16 + ((payload[0] if n else 0) % 512)
        frames = 1 + (n % 7)
        return w, h, frames

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "byte_len": [m["byte_len"] for m in pdf["media_meta"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "checksum": [m["checksum"] for m in pdf["media_meta"]],
                }
            )

    return df.mapInPandas(_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, width int, height int, payload binary"
FRAMES_SCHEMA = "doc_id bigint, frame_index int, frame_payload binary"


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stub over the same Arrow-batched contract. The fake resize
    is a deterministic byte-slice/pad to a size proportional to the
    target area — a real implementation swaps `_resize_one` for
    PIL.Image.resize; the batching, schema, and memory profile stay."""

    def _resize_one(payload: bytes) -> bytes:
        target = max(1, (target_w * target_h) // 1024)
        if not payload:
            payload = b"\x00"
        return (payload * (target // len(payload) + 1))[:target]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [_resize_one(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(_batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub: one output row per sampled frame (1→N row
    expansion inside mapInPandas — the shape a video pipeline needs).
    Fake frames are deterministic byte windows; a real decoder would
    seek keyframes instead."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_index": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(max(len(payload) // every_n, 1), max_frames)
                for i in range(n_frames):
                    start = i * every_n
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_payload"].append(bytes(payload[start : start + every_n]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=FRAMES_SCHEMA)
