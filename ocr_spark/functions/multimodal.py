"""Multimodal (image/audio/video) column plumbing (training-data ops).

Media payloads are opaque `binary` columns with typed metadata, processed
with Arrow-vectorized `mapInPandas` — the same distribution pattern as
the text extractor (ocr_spark/operators/extract_op.py).  The sandbox has
no codec libraries, so the DECODE step is a STUB: `decode_media_features`
computes real byte-level features (length, checksum, magic-byte sniff)
plus a deterministic fake decode (pseudo width/height/duration derived
from header bytes); `decode_media_real` raises NotImplementedError and
marks where PIL/librosa/pyav would plug in.  Everything Spark-side —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA_DDL = (
    "doc_id bigint, media_type string, n_bytes int, magic string, "
    "fake_width int, fake_height int, fake_duration_ms int, checksum bigint"
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"\x1aE\xdf\xa3": "mkv",
}


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal table from a (doc_id, text)
    DataFrame: payload = utf-8 bytes of the text (stand-in for real media
    bytes), media_type cycled by doc_id.  Pure built-in expressions."""
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return df.select(
        "doc_id",
        media_type.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.col("text")).alias("n_chars"),
            F.lit("fixture").alias("origin"),
        ).alias("meta"),
    )


def decode_media_real(payload: bytes, media_type: str):
    """Real decode hook — NOT available in this sandbox (no PIL/librosa/
    pyav).  Kept as the single marked seam where codec libraries plug in;
    the distributed plumbing around it is identical either way."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "decode_media_features provides the deterministic stub path"
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    payloads = pdf["payload"]
    n_bytes = payloads.map(len).astype("int32")
    magic = payloads.map(_sniff_magic)
    # Deterministic fake decode from header bytes (stub for real codecs;
    # keeps batch shapes/types exactly as a real decoder would produce).
    b0 = payloads.map(lambda b: b[0] if len(b) > 0 else 0).astype("int64")
    b1 = payloads.map(lambda b: b[1] if len(b) > 1 else 0).astype("int64")
    checksum = payloads.map(_checksum).astype("int64")
    is_img = (pdf["media_type"] == "image").to_numpy()
    width = np.where(is_img, (b0 % 64 + 1) * 16, 0).astype("int32")
    height = np.where(is_img, (b1 % 64 + 1) * 16, 0).astype("int32")
    duration = np.where(is_img, 0, (checksum % 10_000) + 1).astype("int32")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes,
            "magic": magic,
            "fake_width": width,
            "fake_height": height,
            "fake_duration_ms": duration,
            "checksum": checksum,
        }
    )


def _sniff_magic(b: bytes) -> str:
    for prefix, name in _MAGIC.items():
        if b.startswith(prefix):
            return name
    return "unknown"


def _checksum(b: bytes) -> int:
    if len(b) == 0:
        return 0
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    # positional rolling checksum, exact in int64 for payloads << 2^44
    return int((arr * (np.arange(len(arr)) % 1009 + 1)).sum())


def decode_media_features(df: DataFrame) -> DataFrame:
    """Distributed media feature extraction: mapInPandas over Arrow
    batches of (doc_id, media_type, payload).  Narrow op — partitioning
    is the caller's concern, same contract as extract_turns."""
    pruned = df.select("doc_id", "media_type", "payload")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _decode_batch(pdf)

    return pruned.mapInPandas(gen, schema=MEDIA_SCHEMA_DDL)
