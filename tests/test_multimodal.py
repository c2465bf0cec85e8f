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
