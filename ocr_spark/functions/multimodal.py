"""Multimodal (image/audio/video) column plumbing (training-data ops).

Media payloads are opaque `binary` columns with typed metadata, processed
with Arrow-vectorized `mapInPandas` — the same distribution pattern as
the text extractor (ocr_spark/operators/extract_op.py).

Decode tiers (the sandbox has no PIL/librosa/pyav):
  - REAL decode for uncompressed raster formats, implemented here in
    pure NumPy: 24-bit BMP (BITMAPINFOHEADER, bottom-up or top-down,
    4-byte row padding) and binary PPM (P6).  `decode_media_real` routes
    by magic bytes and returns an (H, W, 3) uint8 array — exercised
    end-to-end by the oracle-checked q_image_decode query.
  - STUBBED decode for compressed codecs (png/jpeg/audio/video):
    `decode_media_real` raises NotImplementedError at the single marked
    seam where PIL/librosa/pyav would plug in; `decode_media_features`
    provides deterministic byte-level features for those payloads so the
    distributed plumbing stays real and tested (tests/test_multimodal.py).
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


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) — the fixture
    writer for the real-decode path."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2:6] = (54 + img_size).to_bytes(4, "little")
    header[10:14] = (54).to_bytes(4, "little")       # pixel-data offset
    header[14:18] = (40).to_bytes(4, "little")       # BITMAPINFOHEADER
    header[18:22] = int(w).to_bytes(4, "little", signed=True)
    header[22:26] = int(h).to_bytes(4, "little", signed=True)  # bottom-up
    header[26:28] = (1).to_bytes(2, "little")        # planes
    header[28:30] = (24).to_bytes(2, "little")       # bpp
    header[30:34] = (0).to_bytes(4, "little")        # BI_RGB
    header[34:38] = img_size.to_bytes(4, "little")
    body = bytearray()
    bgr = arr[:, :, ::-1]                            # BMP stores BGR
    zeros = bytes(pad)
    for y in range(h - 1, -1, -1):                   # bottom-up
        body += bgr[y].tobytes() + zeros
    return bytes(header) + bytes(body)


def _decode_bmp(b: bytes) -> np.ndarray:
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    data = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()                   # BGR -> RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + zlib.crc32(tag + body).to_bytes(4, "big")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a pixel row."""
    l_ = left.astype(np.int32)
    u = up.astype(np.int32)
    ul = upleft.astype(np.int32)
    p = l_ + u - ul
    pa, pb, pc = np.abs(p - l_), np.abs(p - u), np.abs(p - ul)
    out = np.where((pa <= pb) & (pa <= pc), l_, np.where(pb <= pc, u, ul))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filters: str = "cycle") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG
    (stdlib zlib deflate, no codec libraries).  `filters` picks the
    per-row filter type: 'cycle' walks 0..4 by row index so a round-trip
    exercises every unfilter path (None/Sub/Up/Average/Paeth); an
    integer string like '0' pins one type."""
    import zlib

    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    bpp = 3
    raw = arr.reshape(h, w * bpp).astype(np.uint8)
    out = bytearray()
    prior = np.zeros(w * bpp, dtype=np.uint8)
    for r in range(h):
        row = raw[r]
        ft = r % 5 if filters == "cycle" else int(filters)
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prior
        elif ft == 3:
            filt = row - (
                (left.astype(np.int32) + prior.astype(np.int32)) // 2
            ).astype(np.uint8)
        else:
            filt = row - _paeth(left, prior, upleft)
        out += bytes([ft]) + filt.astype(np.uint8).tobytes()
        prior = row
    ihdr = (
        int(w).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bitdepth 8, truecolor, no interlace
    )
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(b: bytes) -> np.ndarray:
    """Pure-NumPy PNG decode for 8-bit truecolor, non-interlaced images:
    stdlib zlib inflate + per-row unfiltering (None/Sub/Up/Average/
    Paeth).  Sub/Average/Paeth reconstruction is sequential in the left
    neighbor, so those rows loop over pixels — fine for the metadata-
    sized fixtures this seam decodes; a production decoder for large
    rasters plugs in here (same signature)."""
    import zlib

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            bitdepth, colortype, _, _, interlace = body[8:13]
            if bitdepth != 8 or colortype != 2 or interlace != 0:
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG supported"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln  # len + tag + body + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    bpp = 3
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:            # poison-payload hardening: a
        # corrupt deflate stream is a malformed payload, not a crash
        raise ValueError(f"PNG IDAT inflate failed: {ex}") from ex
    data = np.frombuffer(raw, dtype=np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    data = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = int(data[r, 0])
        row = data[r, 1:].copy()
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = row + prior
        elif ft == 1:
            rec = row
            for i in range(bpp, stride):
                rec[i] = (int(rec[i]) + int(rec[i - bpp])) & 0xFF
        elif ft == 3:
            rec = row
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(rec[i]) + (left + int(prior[i])) // 2) & 0xFF
        elif ft == 4:
            rec = row
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                upleft = int(prior[i - bpp]) if i >= bpp else 0
                rec[i] = (
                    int(rec[i])
                    + int(_paeth(
                        np.uint8(left), prior[i], np.uint8(upleft)
                    ))
                ) & 0xFF
            rec = rec.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = rec
        prior = out[r]
    return out.reshape(h, w, 3).copy()


def _decode_ppm(b: bytes) -> np.ndarray:
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments unsupported — fixture-grade parser), then one
    # whitespace byte, then raw RGB
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1                                         # single ws after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    data = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_samples, n_channels) int16 array as a RIFF/WAVE
    PCM16 file — the fixture writer for the real audio-decode path."""
    assert samples.dtype == np.int16 and samples.ndim == 2
    n, ch = samples.shape
    data = samples.tobytes()            # interleaved little-endian PCM16
    byte_rate = sample_rate * ch * 2
    fmt = (
        (1).to_bytes(2, "little")       # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")    # bits/sample
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _riff_wave(fmt_code: int, ch: int, sample_rate: int, block_align: int,
               bits: int, fmt_extra: bytes, data: bytes) -> bytes:
    byte_rate = sample_rate * block_align
    fmt = (
        fmt_code.to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + fmt_extra
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def encode_wav_g711(samples: np.ndarray, sample_rate: int, law: str) -> bytes:
    """Encode an (n, ch) int16 array as a G.711-companded RIFF/WAVE
    file (fmt 7 = mu-law, fmt 6 = A-law) — the fixture twin for the
    compressed-audio decode path."""
    from ocr_spark.functions.audio import g711_encode

    assert samples.dtype == np.int16 and samples.ndim == 2
    n, ch = samples.shape
    codes = g711_encode(samples.reshape(-1), law)
    fmt_code = 7 if law == "ulaw" else 6
    # cbSize=0 extension field, as real telephony WAVs carry
    return _riff_wave(fmt_code, ch, sample_rate, ch, 8,
                      (0).to_bytes(2, "little"), codes.tobytes())


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int,
                     samples_per_block: int) -> bytes:
    """Encode an (n, ch) int16 array as an IMA-ADPCM RIFF/WAVE file
    (fmt 0x11).  n must be an exact multiple of samples_per_block and
    samples_per_block = 1 + 8k; each block carries its own
    predictor/index header and is independently decodable — the
    intra-payload parallel unit."""
    from ocr_spark.functions.audio import ima_adpcm_encode_block

    assert samples.dtype == np.int16 and samples.ndim == 2
    n, ch = samples.shape
    if n % samples_per_block != 0:
        raise ValueError("sample count must be a multiple of samples_per_block")
    block_align = 4 * ch + ((samples_per_block - 1) // 2) * ch
    data = b"".join(
        ima_adpcm_encode_block(samples[p : p + samples_per_block])
        for p in range(0, n, samples_per_block)
    )
    extra = (2).to_bytes(2, "little") + samples_per_block.to_bytes(2, "little")
    return _riff_wave(0x11, ch, sample_rate, block_align, 4, extra, data)


def _decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """Pure-NumPy RIFF/WAVE decode: walk the chunk list (skipping
    unknown chunks by their declared size, with word alignment), parse
    fmt, return (samples (n, ch) int16, sample_rate).  Supported
    codecs: PCM16 (fmt 1), G.711 mu-law (fmt 7) / A-law (fmt 6), and
    IMA/DVI ADPCM (fmt 0x11) — see ocr_spark/functions/audio.py.
    Float/24-bit/perceptual (mp3/ogg) streams raise
    NotImplementedError — the same honest-seam convention as the image
    decoders."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = n_channels = fmt_code = bits = None
    block_align = 0
    data = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        ln = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt_code = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)        # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if n_channels < 1:
        raise ValueError("WAV declares zero channels")
    if fmt_code == 1 and bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2",
            count=(len(data) // (2 * n_channels)) * n_channels,
        ).reshape(-1, n_channels)
        return samples, sample_rate
    if fmt_code in (6, 7) and bits == 8:
        from ocr_spark.functions.audio import g711_decode

        law = "ulaw" if fmt_code == 7 else "alaw"
        codes = np.frombuffer(
            data, dtype=np.uint8,
            count=(len(data) // n_channels) * n_channels,
        )
        return g711_decode(codes, law).reshape(-1, n_channels), sample_rate
    if fmt_code == 0x11 and bits == 4:
        from ocr_spark.functions.audio import ima_adpcm_decode_block

        if block_align <= 4 * n_channels:
            raise ValueError("ADPCM block_align too small for header")
        chunks = [
            ima_adpcm_decode_block(data[p : p + block_align], n_channels)
            for p in range(0, len(data), block_align)
        ]
        return np.concatenate(chunks, axis=0), sample_rate
    raise NotImplementedError(
        f"unsupported WAV codec (fmt={fmt_code}, bits={bits}); "
        "PCM16, G.711 ulaw/alaw, and IMA ADPCM are implemented — "
        "perceptual codecs (mp3/ogg) need a codec library"
    )


def decode_media_real(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode for raster images (pure NumPy, no codec libraries):
    24-bit BMP, binary PPM, 8-bit truecolor PNG (stdlib zlib inflate +
    NumPy unfiltering), and JPEG — baseline sequential DCT (grayscale,
    4:4:4 as in the reference's own test_image.jpg, 4:2:0, 4:2:2) AND
    progressive SOF2 (spectral selection + successive approximation;
    see ocr_spark/functions/jpeg.py) — routed by magic bytes.
    Compressed audio and inter-coded video remain the single marked
    seam where librosa/pyav would plug in — the distributed plumbing
    around this function is identical either way."""
    if media_type == "image":
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:8] == _PNG_MAGIC:
            return _decode_png(payload)
        if payload[:4] == b"GIF8":
            from ocr_spark.functions.gif import decode_gif

            return decode_gif(payload)
        if payload[:4] == b"II*\x00":
            from ocr_spark.functions.tiff import decode_tiff

            return decode_tiff(payload)
        if payload[:3] == b"\xff\xd8\xff":
            from ocr_spark.functions.jpeg import decode_baseline

            arr = decode_baseline(payload)
            if arr.ndim == 2:           # grayscale -> (H, W, 3) contract
                arr = np.repeat(arr[:, :, None], 3, axis=2)
            return arr
    if media_type == "audio" and payload[:4] == b"RIFF":
        return _decode_wav(payload)[0]
    if (
        media_type == "video"
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    ):
        return _decode_mjpeg_avi(payload)
    raise NotImplementedError(
        f"no in-sandbox codec for media_type={media_type!r} "
        f"magic={payload[:4]!r}; compressed audio and inter-coded "
        "video decode needs librosa/pyav "
        "(deterministic stub path: decode_media_features)"
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


IMAGE_DECODE_SCHEMA_DDL = (
    "doc_id bigint, width bigint, height bigint, n_px bigint, px_sum bigint"
)


def synthesize_bmp_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic BMP fixture per doc_id: width = 8 + doc_id % 16,
    height = 4 + doc_id % 8, uniform gray fill = doc_id % 256.  Closed
    form by construction, so a SQL oracle can verify the decoded
    geometry AND the full pixel payload (px_sum)."""
    payloads = []
    for doc_id in pdf["doc_id"]:
        w = 8 + int(doc_id) % 16
        h = 4 + int(doc_id) % 8
        fill = int(doc_id) % 256
        arr = np.full((h, w, 3), fill, dtype=np.uint8)
        payloads.append(encode_bmp(arr))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_images_real(df: DataFrame) -> DataFrame:
    """Distributed REAL image decode: mapInPandas over (doc_id) rows —
    synthesize the BMP payload, then decode it with the pure-NumPy BMP
    decoder and emit measured geometry + pixel sum.  Narrow op; the
    encode half stands in for a binary scan column at production scale.
    """
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_bmp_payloads(pdf)
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "n_px", "px_sum")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                arr = decode_media_real(payload, "image")
                h, w, _ = arr.shape
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=IMAGE_DECODE_SCHEMA_DDL)


def synthesize_png_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic PNG fixture per doc_id: width = 8 + doc_id % 16,
    height = 4 + doc_id % 8, per-channel pixel value = (doc_id % 200) + x
    (a horizontal gradient — base + x <= 221, no uint8 wrap), row filter
    type cycling 0..4 so every unfilter path runs.  px_sum has the
    closed form 3 * h * (w*base + w*(w-1)/2) a SQL oracle can verify."""
    payloads = []
    for doc_id in pdf["doc_id"]:
        w = 8 + int(doc_id) % 16
        h = 4 + int(doc_id) % 8
        base = int(doc_id) % 200
        row = (base + np.arange(w, dtype=np.int64)) % 256
        arr = np.repeat(row[None, :, None], h, axis=0).repeat(3, axis=2)
        payloads.append(encode_png(arr.astype(np.uint8), filters="cycle"))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_pngs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL PNG decode (the compressed-codec twin of
    decode_images_real): synthesize the gradient PNG per doc_id inside
    mapInPandas, decode it with the pure-NumPy PNG decoder, emit
    measured geometry + pixel sum.  Narrow op."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_png_payloads(pdf)
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "n_px", "px_sum")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                arr = decode_media_real(payload, "image")
                h, w, _ = arr.shape
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=IMAGE_DECODE_SCHEMA_DDL)


GIF_DECODE_SCHEMA_DDL = (
    "doc_id bigint, width bigint, height bigint, n_px bigint, "
    "px_sum bigint, pos_sum bigint"
)

_GIF_PALETTE = None


def _gif_palette() -> np.ndarray:
    global _GIF_PALETTE
    if _GIF_PALETTE is None:
        _GIF_PALETTE = (
            np.arange(64, dtype=np.uint8)[:, None].repeat(3, 1) * 4
        )
    return _GIF_PALETTE


def synthesize_gif_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic GIF fixture per doc_id: w = 8 + doc_id % 16,
    h = 4 + doc_id % 8, 64-entry grayscale palette (4i,4i,4i), pixel
    index (base + x + 7*y) % 64 with base = doc_id % 64 — the 7*y term
    makes rows DIFFER so the position-weighted sum catches interlace
    reordering bugs.  Odd doc_ids are written INTERLACED; doc_id % 3
    == 0 uses a 128-entry dictionary cap so the LZW clear-code reset
    path runs on a third of the corpus."""
    payloads = []
    from ocr_spark.functions.gif import encode_gif

    pal = _gif_palette()
    for doc_id in pdf["doc_id"]:
        d = int(doc_id)
        w = 8 + d % 16
        h = 4 + d % 8
        base = d % 64
        idx = ((base + np.arange(w)[None, :] + 7 * np.arange(h)[:, None])
               % 64).astype(np.uint8)
        payloads.append(
            encode_gif(idx, pal, interlace=bool(d % 2),
                       dict_cap=128 if d % 3 == 0 else 4096)
        )
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_gifs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL GIF decode (LZW + interlace twin of
    decode_pngs_real): synthesize the gradient GIF per doc_id inside
    mapInPandas, decode via the pure-Python LZW codec, emit measured
    geometry + plain and position-weighted pixel sums (the weighted sum
    is row-order-sensitive, so a deinterlace bug cannot hash-match).
    Narrow op."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_gif_payloads(pdf)
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "n_px", "px_sum",
                     "pos_sum")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                arr = decode_media_real(payload, "image")
                h, w, _ = arr.shape
                weights = np.arange(h * w, dtype=np.int64).reshape(h, w)
                px = arr.astype(np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(int(px.sum()))
                rows["pos_sum"].append(int((px.sum(axis=2) * weights).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=GIF_DECODE_SCHEMA_DDL)


def synthesize_tiff_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic TIFF fixture per doc_id: w = 8 + doc_id % 16,
    h = 4 + doc_id % 8, channel value (base + x + 7*y + 50*c) % 256 —
    row- AND channel-varying so the position-weighted oracle catches
    strip-assembly and predictor bugs.  Compression cycles by doc_id:
    %3==0 uncompressed, %3==1 PackBits, %3==2 LZW; LZW rows with
    doc_id %6==5 additionally use the horizontal-differencing
    predictor.  Strip height 4 forces multi-strip assembly."""
    from ocr_spark.functions.tiff import encode_tiff

    payloads = []
    for doc_id in pdf["doc_id"]:
        d = int(doc_id)
        w = 8 + d % 16
        h = 4 + d % 8
        base = d % 200
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        arr = ((base + x + 7 * y + 50 * c) % 256).astype(np.uint8)
        comp = {0: 1, 1: 32773, 2: 5}[d % 3]
        pred = 2 if (comp == 5 and d % 6 == 5) else 1
        payloads.append(
            encode_tiff(arr, compression=comp, predictor=pred,
                        rows_per_strip=4)
        )
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_tiffs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL TIFF decode: synthesize the per-doc TIFF inside
    mapInPandas (uncompressed / PackBits / TIFF-LZW with early change /
    LZW+predictor-2), decode via the pure-NumPy codec, emit measured
    geometry plus plain and position-weighted pixel sums.  Narrow op."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_tiff_payloads(pdf)
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "n_px", "px_sum",
                     "pos_sum")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                arr = decode_media_real(payload, "image")
                h, w, _ = arr.shape
                weights = np.arange(h * w, dtype=np.int64).reshape(h, w)
                px = arr.astype(np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(int(px.sum()))
                rows["pos_sum"].append(int((px.sum(axis=2) * weights).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=GIF_DECODE_SCHEMA_DDL)


def synthesize_jpeg_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic baseline-JPEG fixture per doc_id: a grid of flat
    8x8 tiles, TX = 1 + doc_id % 3 tiles across, TY = 1 + doc_id % 2
    down, tile (bx, by) value = base + 5*bx + 11*by with
    base = doc_id % 151 (max 171, no uint8 wrap).  With all-ones quant
    tables a flat block round-trips EXACTLY through FDCT->quantize->
    Huffman->dequantize->IDCT (the DC coefficient 8*(v-128) is integral
    and every AC is 0), so px_sum has the closed form
    3 * 64 * sum(tiles) a SQL oracle can verify — while the stream
    itself is a genuine Huffman-coded JPEG exercising DC prediction
    across blocks, EOB, byte stuffing, and marker parsing."""
    from ocr_spark.functions.jpeg import encode_baseline

    payloads = []
    for doc_id in pdf["doc_id"]:
        tx = 1 + int(doc_id) % 3
        ty = 1 + int(doc_id) % 2
        base = int(doc_id) % 151
        bx = np.arange(tx, dtype=np.int64)
        by = np.arange(ty, dtype=np.int64)
        tiles = base + 5 * bx[None, :] + 11 * by[:, None]
        arr = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        payloads.append(encode_baseline(arr))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_jpegs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL baseline-JPEG decode (the lossy-codec twin of
    decode_pngs_real): synthesize the flat-tile JPEG per doc_id inside
    mapInPandas, decode it with the pure-NumPy baseline decoder, emit
    measured geometry + pixel sum (gray replicated to 3 channels by the
    decode_media_real contract).  Narrow op."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_jpeg_payloads(pdf)
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "n_px", "px_sum")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                arr = decode_media_real(payload, "image")
                h, w, _ = arr.shape
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=IMAGE_DECODE_SCHEMA_DDL)


def synthesize_progressive_jpeg_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic PROGRESSIVE (SOF2) JPEG fixture per doc_id, with a
    closed-form pixel payload that is exact through the multi-scan
    pipeline.  Tile grid: TX = 1 + doc_id % 4 across, TY = 1 + doc_id % 3
    down; tile (bx, by) carries flat value v = base + 5*bx + 11*by
    (base = 20 + doc_id % 170) PLUS amp * pattern where
    pattern = [1,-1,-1,1,1,-1,-1,1] along columns (amp = 1 + doc_id % 17).
    The pattern is the sign layout of the (u=0, v=4) DCT basis, whose
    rows/columns all have |A| = sqrt(2)/4, so the FDCT of one tile is
    EXACTLY two integer coefficients — DC = 8*(v-128) and AC 8*amp at
    zigzag position 14 — making the successive-approximation +
    spectral-selection round-trip lossless and px_sum independent of
    amp (the pattern sums to zero per row):
    px_sum = 3 * 64 * sum(tiles).  Unlike the flat-tile baseline
    fixture, every payload exercises nonzero-AC band scans, EOB runs,
    and both refinement scan kinds."""
    from ocr_spark.functions.jpeg import encode_progressive

    pattern = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    payloads = []
    for doc_id in pdf["doc_id"]:
        tx = 1 + int(doc_id) % 4
        ty = 1 + int(doc_id) % 3
        base = 20 + int(doc_id) % 170
        amp = 1 + int(doc_id) % 17
        bx = np.arange(tx, dtype=np.int64)
        by = np.arange(ty, dtype=np.int64)
        tiles = base + 5 * bx[None, :] + 11 * by[:, None]
        arr = np.kron(tiles, np.ones((8, 8), dtype=np.int64))
        arr = arr + amp * np.tile(pattern, tx)[None, :]
        payloads.append(encode_progressive(arr.astype(np.uint8)))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_progressive_jpegs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL progressive-JPEG decode (the SOF2 twin of
    decode_jpegs_real): synthesize the checker-basis progressive JPEG
    per doc_id inside mapInPandas, decode its DC/AC/refinement scans
    with the pure-NumPy decoder, emit measured geometry + pixel sum.
    Narrow op, zero shuffle."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_progressive_jpeg_payloads(pdf)
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "n_px", "px_sum")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                arr = decode_media_real(payload, "image")
                h, w, _ = arr.shape
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=IMAGE_DECODE_SCHEMA_DDL)


def _avi_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + len(body).to_bytes(4, "little") + body + (b"\x00" * (len(body) & 1))


def _avi_list(list_type: bytes, body: bytes) -> bytes:
    return _avi_chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(frames: list[bytes], fps: int, w: int, h: int) -> bytes:
    """Encode JPEG frame payloads as an MJPEG AVI (RIFF 'AVI ' with
    hdrl/movi/idx1 — the public AVI 1.0 layout): avih + one 'vids'
    stream with MJPG handler, frames as 00dc chunks.  The fixture
    writer for the real video-decode path."""
    n = len(frames)
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in [
            1_000_000 // max(fps, 1),   # dwMicroSecPerFrame
            0, 0, 0x10,                 # maxbytes, padding, AVIF_HASINDEX
            n, 0, 1,                    # totalframes, initial, streams
            0, w, h, 0, 0, 0, 0,        # sugbuf, width, height, reserved
        ]
    )
    strh = (
        b"vids" + b"MJPG"
        + b"".join(
            v.to_bytes(4, "little")
            for v in [0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0]
        )                               # flags, prio, init, scale, rate,
                                        # start, length, sugbuf, quality, ssize
        + b"\x00" * 8                   # rcFrame
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + (w * h * 3).to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", avih)
        + _avi_list(b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)),
    )
    movi_body = b"".join(_avi_chunk(b"00dc", f) for f in frames)
    movi = _avi_list(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to start of movi data
    idx = bytearray()
    off = 4                             # past the 'movi' list-type fourcc
    for f in frames:
        idx += b"00dc" + (0x10).to_bytes(4, "little")
        idx += off.to_bytes(4, "little") + len(f).to_bytes(4, "little")
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + _avi_chunk(b"idx1", bytes(idx))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _decode_mjpeg_avi(b: bytes) -> np.ndarray:
    """Pure-NumPy MJPEG AVI decode: walk the RIFF tree to the movi
    LIST, decode every 00dc/00db frame with the baseline JPEG decoder
    (ocr_spark/functions/jpeg.py), return frames stacked as
    (n_frames, H, W, 3) uint8.  Non-MJPEG streams inside an AVI fall
    through to the JPEG decoder's own errors; other containers are the
    codec seam."""
    from ocr_spark.functions.jpeg import decode_baseline

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    frames: list[np.ndarray] = []

    def walk(data: bytes) -> None:
        pos = 0
        while pos + 8 <= len(data):
            tag = data[pos : pos + 4]
            ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
            body = data[pos + 8 : pos + 8 + ln]
            if tag == b"LIST":
                if body[:4] in (b"movi", b"hdrl", b"strl", b"rec "):
                    walk(body[4:])
            elif tag[2:4] in (b"dc", b"db") and body[:3] == b"\xff\xd8\xff":
                arr = decode_baseline(body)
                if arr.ndim == 2:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                frames.append(arr)
            pos += 8 + ln + (ln & 1)

    walk(b[12:])
    if not frames:
        raise ValueError("AVI contains no decodable MJPEG frames")
    return np.stack(frames)


AUDIO_DECODE_SCHEMA_DDL = (
    "doc_id bigint, n_samples bigint, sample_rate bigint, "
    "n_channels bigint, amp_sum bigint, amp_max bigint"
)


def synthesize_wav_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic PCM16 WAV fixture per doc_id: n = 400 + doc_id %
    100 samples, ch = 1 + doc_id % 2 channels, sample_rate = 8000 +
    (doc_id % 5) * 1000, channel-c sample value
    s(t, c) = ((doc_id*13 + 7*t + 31*c) % 201) - 100.  Integer
    arithmetic end to end, so sum(|s|) and max(|s|) have exact SQL twins
    (a lateral range join in the oracle)."""
    payloads = []
    for doc_id in pdf["doc_id"]:
        d = int(doc_id)
        n = 400 + d % 100
        ch = 1 + d % 2
        rate = 8000 + (d % 5) * 1000
        t = np.arange(n, dtype=np.int64)[:, None]
        c = np.arange(ch, dtype=np.int64)[None, :]
        s = ((d * 13 + 7 * t + 31 * c) % 201) - 100
        payloads.append(encode_wav(s.astype(np.int16), rate))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_wavs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL audio decode: synthesize the PCM16 WAV per
    doc_id inside mapInPandas, decode it with the pure-NumPy RIFF
    parser, emit measured stream geometry + amplitude stats.  Narrow
    op, same distribution contract as the image decoders."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_wav_payloads(pdf)
            rows = {k: [] for k in ("doc_id", "n_samples", "sample_rate",
                                    "n_channels", "amp_sum", "amp_max")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                samples, rate = _decode_wav(payload)
                a = np.abs(samples.astype(np.int64))
                rows["doc_id"].append(int(doc_id))
                rows["n_samples"].append(samples.shape[0])
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(samples.shape[1])
                rows["amp_sum"].append(int(a.sum()))
                rows["amp_max"].append(int(a.max()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=AUDIO_DECODE_SCHEMA_DDL)


G711_DECODE_SCHEMA_DDL = (
    "doc_id bigint, fmt_code bigint, n_samples bigint, sample_rate bigint, "
    "n_channels bigint, val_sum bigint, amp_sum bigint, amp_max bigint"
)


def _wav_fmt_code(b: bytes) -> int:
    """Measured codec tag from the payload's own fmt chunk."""
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        ln = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if tag == b"fmt ":
            return int.from_bytes(b[pos + 8 : pos + 10], "little")
        pos += 8 + ln + (ln & 1)
    raise ValueError("WAV missing fmt chunk")


def synthesize_g711_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic G.711 WAV fixture per doc_id (even doc_id mu-law
    fmt 7, odd A-law fmt 6; mono 8 kHz; n = 300 + doc_id % 50).  Every
    sample value is an EXACT G.711 codeword — the decode-table image at
    mantissa m = (13*doc_id + 7t) % 16, segment e = (5*doc_id + 3t) % 8,
    sign (doc_id + t) % 2 — so companding round-trips losslessly and the
    decoded stream has a closed-form SQL twin (ulaw value
    ((8m+132)<<e)-132; alaw 16m+8 at e=0 else (16m+264)<<(e-1))."""
    payloads = []
    for doc_id in pdf["doc_id"]:
        d = int(doc_id)
        n = 300 + d % 50
        t = np.arange(n, dtype=np.int64)
        m = (13 * d + 7 * t) % 16
        e = (5 * d + 3 * t) % 8
        sgn = np.where((d + t) % 2 == 0, 1, -1)
        if d % 2 == 0:
            law = "ulaw"
            val = ((m * 8 + 132) << e) - 132
        else:
            law = "alaw"
            val = np.where(e == 0, m * 16 + 8,
                           (m * 16 + 264) << np.maximum(e - 1, 0))
        s = (sgn * val).astype(np.int16).reshape(-1, 1)
        payloads.append(encode_wav_g711(s, 8000, law))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def synthesize_adpcm_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic IMA-ADPCM WAV fixture per doc_id: ch = 1 +
    doc_id % 2 channels, 1 + doc_id % 3 blocks of 65 samples at
    11025 Hz.  Channel-c starts at ((29*doc_id + 41c) % 201) - 100 and
    steps by a delta drawn from {-4,-3,-1,0,1,3,4} via
    (13*doc_id + 7t + 31c) % 7 — exactly the magnitudes representable
    at step-table index 0 (step=7: 0/1/3/4 plus sign), whose codes all
    carry index delta -1 (clamped at 0), so the adaptive predictor
    tracks the waveform EXACTLY and the decode has a closed-form SQL
    twin (base + running delta sum)."""
    payloads = []
    deltas = np.array([-4, -3, -1, 0, 1, 3, 4], dtype=np.int64)
    for doc_id in pdf["doc_id"]:
        d = int(doc_id)
        ch = 1 + d % 2
        n = 65 * (1 + d % 3)
        t = np.arange(n, dtype=np.int64)[:, None]
        c = np.arange(ch, dtype=np.int64)[None, :]
        dl = deltas[(13 * d + 7 * t + 31 * c) % 7]
        dl[0, :] = 0                    # t=0 is the base sample
        base = ((29 * d + 41 * c) % 201) - 100
        s = (base + dl.cumsum(axis=0)).astype(np.int16)
        payloads.append(encode_wav_adpcm(s, 11025, 65))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def _decode_audio_batch(withp: pd.DataFrame) -> pd.DataFrame:
    rows = {k: [] for k in ("doc_id", "fmt_code", "n_samples", "sample_rate",
                            "n_channels", "val_sum", "amp_sum", "amp_max")}
    for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
        samples, rate = _decode_wav(payload)
        s64 = samples.astype(np.int64)
        rows["doc_id"].append(int(doc_id))
        rows["fmt_code"].append(_wav_fmt_code(payload))
        rows["n_samples"].append(samples.shape[0])
        rows["sample_rate"].append(rate)
        rows["n_channels"].append(samples.shape[1])
        rows["val_sum"].append(int(s64.sum()))
        rows["amp_sum"].append(int(np.abs(s64).sum()))
        rows["amp_max"].append(int(np.abs(s64).max()))
    return pd.DataFrame(rows).astype("int64")


def decode_g711_wavs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL G.711 decode (mu-law + A-law WAV): synthesize
    the companded payload per doc_id inside mapInPandas, decode through
    the full RIFF walk + 256-entry expansion LUTs, emit measured
    geometry + signed/absolute amplitude stats (val_sum catches sign
    bugs the abs stats would mask)."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _decode_audio_batch(synthesize_g711_payloads(pdf))

    return pruned.mapInPandas(gen, schema=G711_DECODE_SCHEMA_DDL)


def decode_adpcm_wavs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL IMA-ADPCM decode: synthesize the block-coded
    payload per doc_id inside mapInPandas, decode the sequential
    adaptive predictor per independently-headered block, emit measured
    geometry + amplitude stats."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _decode_audio_batch(synthesize_adpcm_payloads(pdf))

    return pruned.mapInPandas(gen, schema=G711_DECODE_SCHEMA_DDL)


MP3_DECODE_SCHEMA_DDL = (
    "doc_id bigint, n_frames bigint, sample_rate bigint, "
    "bitrate_kbps_sum bigint, n_samples bigint, crc_frames bigint, "
    "resv_sum bigint, scf_sum bigint, pcm_abs_q bigint"
)


def decode_mp3s_real(df: DataFrame) -> DataFrame:
    """Distributed REAL MPEG-1 Layer III bitstream decode (round 5,
    narrowing the perceptual-audio seam): synthesize the framed mp3 per
    doc_id inside mapInPandas (ocr_spark/functions/mp3.py — silent
    long-block granules, VBR frame sizes, CRC-protected side info on
    even docs, a REAL bit-reservoir layout), then walk/validate/decode
    it: sync + header fields, CRC-16 check, side info, reservoir
    reconstruction, fixed-width scalefactor fields, part2_3_length
    bit-exact accounting, requantize -> alias-reduce -> IMDCT ->
    overlap-add -> matrixing on the (exactly-zero) spectrum.  Emits
    measured geometry + scalefactor/reservoir sums + quantized PCM
    energy (exactly 0 for the silent fixtures — computed, not assumed).
    Spectral Huffman tables and the synthesis D-window remain the
    documented seams (mp3.py module docstring)."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_spark.functions.mp3 import decode_mp3, encode_mp3_silence

        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "n_frames", "sample_rate", "bitrate_kbps_sum",
                "n_samples", "crc_frames", "resv_sum", "scf_sum",
                "pcm_abs_q",
            )}
            for doc_id in pdf["doc_id"]:
                r = decode_mp3(encode_mp3_silence(int(doc_id)))
                rows["doc_id"].append(int(doc_id))
                for k in ("n_frames", "sample_rate", "bitrate_kbps_sum",
                          "n_samples", "crc_frames", "resv_sum", "scf_sum"):
                    rows[k].append(int(r[k]))
                rows["pcm_abs_q"].append(
                    int(round(float(np.abs(r["pcm"]).sum()) * 1e6))
                )
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=MP3_DECODE_SCHEMA_DDL)


OGG_DECODE_SCHEMA_DDL = (
    "doc_id bigint, n_pages bigint, n_packets bigint, "
    "spanning_packets bigint, serial bigint, channels bigint, "
    "sample_rate bigint, bitrate_nominal bigint, vendor_len bigint, "
    "n_comments bigint, comment_bytes bigint, setup_bytes bigint, "
    "n_audio_packets bigint, audio_bytes_sum bigint, granule_last bigint"
)


def decode_oggs_real(df: DataFrame) -> DataFrame:
    """Distributed REAL Ogg container decode (round 5, narrowing the
    remaining perceptual-audio seam to Vorbis spectral tables):
    synthesize the Vorbis-framed ogg stream per doc_id inside
    mapInPandas (ocr_spark/functions/ogg.py — cross-page packets forced
    by a small lacing cap), then walk it for real: per-page RFC 3533
    CRC-32 validation, sequence-continuity and continuation-flag
    handshakes, lacing-value packet reassembly (255 runs, 0-lacing
    terminators, page-spanning packets), Vorbis ident + comment header
    parse, and byte-exact opaque accounting of the seam packets.  The
    Vorbis codebook/floor/residue path is the documented seam
    (ogg.py:decode_vorbis_audio)."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_spark.functions.ogg import (
            decode_ogg_stream, encode_ogg_vorbis_fixture)

        cols = ("n_pages", "n_packets", "spanning_packets", "serial",
                "channels", "sample_rate", "bitrate_nominal",
                "vendor_len", "n_comments", "comment_bytes",
                "setup_bytes", "n_audio_packets", "audio_bytes_sum",
                "granule_last")
        for pdf in it:
            rows = {k: [] for k in ("doc_id",) + cols}
            for doc_id in pdf["doc_id"]:
                r = decode_ogg_stream(encode_ogg_vorbis_fixture(int(doc_id)))
                rows["doc_id"].append(int(doc_id))
                for k in cols:
                    rows[k].append(int(r[k]))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=OGG_DECODE_SCHEMA_DDL)


VIDEO_DECODE_SCHEMA_DDL = (
    "doc_id bigint, n_frames bigint, width bigint, height bigint, "
    "px_sum_all bigint"
)


def synthesize_avi_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic MJPEG-AVI fixture per doc_id: F = 1 + doc_id % 4
    flat-tile JPEG frames (same tile grid as the JPEG fixture but
    base = doc_id % 100 and frame f shifts every tile by 17*f; max
    pixel value 99+10+11+51 = 171, no wrap), wrapped in a real AVI
    container with hdrl/movi/idx1.  Each frame round-trips exactly
    (flat blocks + unit quant tables), so the total pixel sum has a
    closed form over (tiles x frames) a SQL oracle can verify."""
    from ocr_spark.functions.jpeg import encode_baseline

    payloads = []
    for doc_id in pdf["doc_id"]:
        d = int(doc_id)
        tx, ty = 1 + d % 3, 1 + d % 2
        base = d % 100
        nf = 1 + d % 4
        frames = []
        for f in range(nf):
            bx = np.arange(tx, dtype=np.int64)
            by = np.arange(ty, dtype=np.int64)
            tiles = base + 5 * bx[None, :] + 11 * by[:, None] + 17 * f
            arr = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
            frames.append(encode_baseline(arr))
        payloads.append(encode_mjpeg_avi(frames, fps=10, w=8 * tx, h=8 * ty))
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


def decode_videos_real(df: DataFrame) -> DataFrame:
    """Distributed REAL video decode (MJPEG AVI): synthesize the
    container per doc_id inside mapInPandas, walk the RIFF tree and
    decode every frame with the pure-NumPy baseline JPEG decoder, emit
    frame count + geometry + total pixel sum.  Narrow op."""
    pruned = df.select("doc_id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            withp = synthesize_avi_payloads(pdf)
            rows = {k: [] for k in ("doc_id", "n_frames", "width",
                                    "height", "px_sum_all")}
            for doc_id, payload in zip(withp["doc_id"], withp["payload"]):
                vid = decode_media_real(payload, "video")
                nf, h, w, _ = vid.shape
                rows["doc_id"].append(int(doc_id))
                rows["n_frames"].append(nf)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["px_sum_all"].append(int(vid.astype(np.int64).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return pruned.mapInPandas(gen, schema=VIDEO_DECODE_SCHEMA_DDL)


def synthesize_mixed_payloads(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mixed-format, partially-POISONED payload fixture: per doc_id the
    format cycles BMP / PNG / JPEG (each with the same closed-form
    geometry as its dedicated fixture), and every doc_id % 10 == 7
    payload is truncated to 25 bytes — guaranteed mid-marker, so decode
    MUST yield an error row, never a crash.  Half the JPEG rows
    (doc_id % 6 == 5) are encoded PROGRESSIVE (SOF2) instead of
    baseline: flat tiles decode identically under both modes, so the
    closed-form oracle is unchanged while the envelope also covers
    multi-scan streams — including truncated-progressive poison
    (doc_id % 30 == 17)."""
    from ocr_spark.functions.jpeg import encode_baseline, encode_progressive

    payloads = []
    for doc_id in pdf["doc_id"]:
        d = int(doc_id)
        kind = d % 3
        if kind == 0:
            w, h, fill = 8 + d % 16, 4 + d % 8, d % 256
            arr = np.full((h, w, 3), fill, dtype=np.uint8)
            p = encode_bmp(arr)
        elif kind == 1:
            w, h, base = 8 + d % 16, 4 + d % 8, d % 200
            row = (base + np.arange(w, dtype=np.int64)) % 256
            arr = np.repeat(row[None, :, None], h, axis=0).repeat(3, axis=2)
            p = encode_png(arr.astype(np.uint8), filters="cycle")
        else:
            tx, ty, base = 1 + d % 3, 1 + d % 2, d % 151
            bx = np.arange(tx, dtype=np.int64)
            by = np.arange(ty, dtype=np.int64)
            tiles = base + 5 * bx[None, :] + 11 * by[:, None]
            arr = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
            p = encode_progressive(arr) if d % 6 == 5 else encode_baseline(arr)
        if d % 10 == 7:
            p = p[:25]
        payloads.append(p)
    return pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                         "payload": payloads})


BINARY_DECODE_SCHEMA_DDL = (
    "doc_id bigint, status string, err string, width bigint, "
    "height bigint, n_px bigint, px_sum bigint"
)


def decode_binary_images(df: DataFrame) -> DataFrame:
    """PRODUCTION-contract image decode over a real (doc_id, payload)
    binary column: every payload decodes independently inside
    mapInPandas, and a malformed payload yields a status='error' row
    with the error class — one poison byte stream can NEVER fail the
    stage (the same error-envelope contract as the text extractor's
    status column; decoder exception classes are pinned to
    ValueError/NotImplementedError by the mutation fuzz in
    tests/test_jpeg.py).  Narrow op, zero shuffle."""
    pruned = df.select("doc_id", "payload")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "status", "err", "width",
                                    "height", "n_px", "px_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(int(doc_id))
                try:
                    arr = decode_media_real(bytes(payload), "image")
                    h, w = arr.shape[:2]
                    rows["status"].append("ok")
                    rows["err"].append(None)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_px"].append(w * h)
                    rows["px_sum"].append(int(arr.astype(np.int64).sum()))
                except (ValueError, NotImplementedError) as ex:
                    rows["status"].append("error")
                    rows["err"].append(f"{type(ex).__name__}: {ex}"[:200])
                    for k in ("width", "height", "n_px", "px_sum"):
                        rows[k].append(0)
            out = pd.DataFrame(rows)
            for k in ("doc_id", "width", "height", "n_px", "px_sum"):
                out[k] = out[k].astype("int64")
            yield out

    return pruned.mapInPandas(gen, schema=BINARY_DECODE_SCHEMA_DDL)


def decode_media_features(df: DataFrame) -> DataFrame:
    """Distributed media feature extraction: mapInPandas over Arrow
    batches of (doc_id, media_type, payload).  Narrow op — partitioning
    is the caller's concern, same contract as extract_turns."""
    pruned = df.select("doc_id", "media_type", "payload")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _decode_batch(pdf)

    return pruned.mapInPandas(gen, schema=MEDIA_SCHEMA_DDL)
