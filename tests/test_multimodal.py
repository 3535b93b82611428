"""Multimodal binary-column plumbing (ocr_spark/functions/multimodal.py).

The decode step is a documented stub (no codec libs in-sandbox); these
tests pin the REAL parts: schema, Arrow binary transport, batch shapes,
determinism, magic sniffing, and empty-payload handling.
"""

import pandas as pd
import pytest

from ocr_spark.functions.multimodal import (
    _decode_batch,
    decode_media_features,
    decode_media_real,
    with_binary_payload,
)


def test_decode_real_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_media_real(b"\x89PNG....", "image")


def test_decode_batch_pure():
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "media_type": ["image", "audio", "video", "image"],
            "payload": [
                b"\x89PNG\r\n\x1a\n" + b"x" * 100,
                b"RIFF....WAVE",
                b"",
                b"\xff\xd8\xff\xe0jpegdata",
            ],
        }
    )
    out = _decode_batch(pdf)
    assert list(out.columns) == [
        "doc_id", "media_type", "n_bytes", "magic",
        "fake_width", "fake_height", "fake_duration_ms", "checksum",
    ]
    assert out.magic.tolist() == ["png", "riff", "unknown", "jpeg"]
    assert out.n_bytes.tolist() == [108, 12, 0, 12]
    # image rows get dims, non-image rows get duration
    assert out.fake_width[0] > 0 and out.fake_duration_ms[0] == 0
    assert out.fake_width[1] == 0 and out.fake_duration_ms[1] > 0
    # empty payload is a row, not an error (G26 isolation analogue)
    assert out.checksum[2] == 0
    # deterministic
    pd.testing.assert_frame_equal(out, _decode_batch(pdf))


def test_spark_multimodal_roundtrip(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(50), "text": [f"doc {i} body" for i in range(50)]})
    )
    feats = decode_media_features(with_binary_payload(df))
    rows = feats.collect()
    assert len(rows) == 50
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].media_type == "image" and by_id[0].fake_width > 0
    assert by_id[1].media_type == "audio" and by_id[1].fake_duration_ms > 0
    assert by_id[2].media_type == "video"
    # n_bytes == utf-8 length of the text payload
    assert by_id[3].n_bytes == len("doc 3 body".encode())
    # schema stable under repartition (distribution-agnostic plumbing)
    feats2 = decode_media_features(with_binary_payload(df.repartition(7)))
    assert feats2.schema == feats.schema
    assert sorted(r.checksum for r in feats2.collect()) == sorted(
        r.checksum for r in rows
    )
