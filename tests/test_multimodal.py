from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from token_etl_spark.operators.multimodal import attach_binary_payload, decode_features


def _docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine"), (2, "")], ["doc_id", "text"]
    )


def test_payload_schema_and_metadata(spark):
    out = attach_binary_payload(_docs(spark))
    assert dict(out.dtypes)["payload"] == "binary"
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row["media_meta"]["byte_len"] == len(b"hello world")
    assert row["media_meta"]["media_type"] == "image/fake"


def test_decode_fake_is_deterministic(spark):
    payloads = attach_binary_payload(_docs(spark))
    a = {r["doc_id"]: (r["width"], r["height"], r["n_frames"]) for r in decode_features(payloads).collect()}
    b = {r["doc_id"]: (r["width"], r["height"], r["n_frames"]) for r in decode_features(payloads).collect()}
    assert a == b
    assert a[0] == (16 + 11, 16 + (b"h"[0] % 512), 1 + (11 % 7))


def test_resize_shapes(spark):
    from token_etl_spark.operators.multimodal import resize_images

    payloads = attach_binary_payload(_docs(spark))
    rows = resize_images(payloads, 224, 224).collect()
    assert len(rows) == 3
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert all(len(r["payload"]) == (224 * 224) // 1024 for r in rows)


def test_sample_frames_expands_rows(spark):
    from token_etl_spark.operators.multimodal import sample_frames

    payloads = attach_binary_payload(_docs(spark)).filter(F.col("doc_id") < 2)
    rows = sample_frames(payloads, every_n=4, max_frames=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1}
    for frames in by_doc.values():
        assert [f["frame_index"] for f in sorted(frames, key=lambda x: x["frame_index"])] == list(
            range(len(frames))
        )
        assert all(len(f["frame_payload"]) <= 4 for f in frames)


def test_decode_error_stub_raises(spark):
    payloads = attach_binary_payload(_docs(spark))
    with pytest.raises(Exception) as exc:
        decode_features(payloads, decode_stub="error").collect()
    assert "NotImplementedError" in str(exc.value) or "media decode" in str(exc.value)


def _png(w, h):
    import struct
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"


def _gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w, h, topdown=False):
    import struct
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, -h if topdown else h) + b"\x00" * 8


def _jpeg(w, h):
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_real_formats():
    """Stdlib-only header parsing reads true dimensions from real
    format bytes — PNG IHDR, GIF screen descriptor, BMP info header
    (incl. top-down negative height), JPEG SOF scan past APP0."""
    from token_etl_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200)
    assert parse_image_header(_bmp(1024, 768)) == ("bmp", 1024, 768)
    assert parse_image_header(_bmp(1024, 768, topdown=True)) == ("bmp", 1024, 768)
    assert parse_image_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert parse_image_header(b"plain text bytes") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n tru") is None  # truncated


def test_decode_headers_mode_mixed_corpus(spark):
    """decode_stub='headers' extracts true dims for real image payloads
    inside the Arrow batch contract; non-image payloads fall back to the
    deterministic fake path."""
    from token_etl_spark.operators.multimodal import decode_features

    rows = [
        (1, _png(640, 480), {"media_type": "image/png", "byte_len": 0, "checksum": "a"}),
        (2, _jpeg(32, 64), {"media_type": "image/jpeg", "byte_len": 0, "checksum": "b"}),
        (3, b"not an image", {"media_type": "text/plain", "byte_len": 0, "checksum": "c"}),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, media_meta struct<media_type:string,byte_len:int,checksum:string>",
    )
    got = {r.doc_id: r for r in decode_features(df, decode_stub="headers").collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (640, 480, 1)
    assert (got[2].width, got[2].height, got[2].n_frames) == (32, 64, 1)
    n = len(b"not an image")
    assert got[3].width == 16 + (n % 1024)  # fake-path fallback
