"""Baseline JPEG codec tests (ocr_spark/functions/jpeg.py).

Parity target: the reference decodes baseline JPEGs via PIL
(reference handwriting/api.py:20, test_image.jpg — SOF0, 3 components,
all 1x1 sampling); this codec must decode that stream class with zero
codec libraries.  The oracle-facing closed-form path is pinned by
q_jpeg_decode; these tests pin round-trips, exact Huffman integrity,
the honest NotImplementedError seams, and real-world interop against
the reference's own image.
"""

import os

import numpy as np
import pytest

from ocr_spark.functions.jpeg import (
    _fdct_quant,
    decode_baseline,
    decode_coefficients,
    encode_baseline,
    encode_progressive,
)

REF_JPEG = "/root/reference/test_image.jpg"


def _flat_tile_image(tiles: np.ndarray) -> np.ndarray:
    return np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_flat_tiles_gray_roundtrip_exact():
    # flat 8x8 blocks + all-ones quant tables: DC = 8*(v-128) integral,
    # every AC zero -> the lossy pipeline is exactly lossless
    rng = np.random.RandomState(7)
    img = _flat_tile_image(rng.randint(0, 256, size=(3, 4)))
    out = decode_baseline(encode_baseline(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_random_gray_roundtrip_near_lossless():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    out = decode_baseline(encode_baseline(img))
    # all-ones quant tables: error is pure DCT-coefficient rounding,
    # bounded well under +-2 per pixel
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_coefficient_level_huffman_integrity():
    # float-free check: the quantized coefficients the encoder wrote
    # must come back EXACTLY from the entropy decoder (Huffman codes,
    # zigzag order, DC prediction, EOB/ZRL, byte stuffing)
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    expect = _fdct_quant(img.astype(np.uint8), np.ones((8, 8), dtype=np.int64))
    _, coefs = decode_coefficients(encode_baseline(img))
    assert np.array_equal(coefs[0], expect)


def test_color_444_gray_content_exact():
    # Cb = Cr = 128 exactly for gray content; inverse transform returns
    # R = G = B = Y, so flat gray tiles stay exact through color mode
    rng = np.random.RandomState(17)
    img = np.repeat(
        _flat_tile_image(rng.randint(0, 256, size=(2, 3)))[:, :, None], 3, axis=2
    )
    out = decode_baseline(encode_baseline(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_color_444_random_near_lossless():
    rng = np.random.RandomState(19)
    img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    out = decode_baseline(encode_baseline(img))
    # color adds YCbCr forward+inverse rounding on top of DCT rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_non_multiple_of_8_dims():
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, size=(13, 21)).astype(np.uint8)
    out = decode_baseline(encode_baseline(img))
    assert out.shape == (13, 21)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_lossy_quant_tables_still_decode():
    # a real (non-identity) quant table: decode must apply dequant;
    # smooth content survives within a loose bound
    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    x = np.arange(32)
    img = np.clip(100 + x[None, :] * 2 + x[:, None], 0, 255).astype(np.uint8)
    out = decode_baseline(encode_baseline(img, qtab_luma=q))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24
    assert abs(float(out.mean()) - float(img.mean())) < 4


def test_sequential_scan_under_sof2_rejected():
    # a baseline stream whose SOF marker is rewritten to SOF2 is
    # malformed: its single full-band scan header (Ss=0, Se=63) is
    # invalid for progressive mode -> ValueError, not a wrong decode
    b = bytearray(encode_baseline(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2                     # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive scan header"):
        decode_coefficients(bytes(b))


def test_progressive_coefficient_integrity_gray():
    # float-free: the multi-scan progressive stream (spectral bands +
    # DC/AC successive-approximation refinements) must reassemble the
    # EXACT quantized coefficients the encoder started from
    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    expect = _fdct_quant(img, np.ones((8, 8), dtype=np.int64))
    meta, coefs = decode_coefficients(encode_progressive(img))
    assert meta["progressive"] is True
    assert np.array_equal(coefs[0], expect)


def test_progressive_pixels_match_baseline():
    # same coefficients -> same pixels: the SOF2 path must agree with
    # the sequential path bit-for-bit after IDCT
    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, size=(16, 24, 3)).astype(np.uint8)
    out_p = decode_baseline(encode_progressive(img))
    out_b = decode_baseline(encode_baseline(img))
    assert np.array_equal(out_p, out_b)


def test_progressive_420_non_multiple_dims():
    # 4:2:0 exercises interleaved DC MCUs vs NON-interleaved AC scans
    # whose per-component grids differ from the MCU-padded grid when
    # dims aren't multiples of 16
    rng = np.random.RandomState(37)
    img = rng.randint(0, 256, size=(21, 37, 3)).astype(np.uint8)
    out_p = decode_baseline(encode_progressive(img, subsampling="420"))
    out_b = decode_baseline(encode_baseline(img, subsampling="420"))
    assert out_p.shape == (21, 37, 3)
    assert np.array_equal(out_p, out_b)


def test_progressive_deep_successive_approximation():
    # 3-bit DC / 2-bit AC approximation chains: multiple refinement
    # scans per coefficient, finer spectral bands
    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, size=(24, 24)).astype(np.uint8)
    expect = _fdct_quant(img, np.ones((8, 8), dtype=np.int64))
    b = encode_progressive(img, dc_al=3, ac_al=2,
                           bands=((1, 2), (3, 8), (9, 63)))
    _, coefs = decode_coefficients(b)
    assert np.array_equal(coefs[0], expect)


def test_progressive_flat_image_eobrun():
    # a flat image makes every AC band empty -> the encoder must emit
    # accumulated EOBn runs (absent from sequential streams) and the
    # decoder must walk them; round-trip stays exact
    flat = np.full((64, 64), 130, dtype=np.uint8)
    assert np.array_equal(decode_baseline(encode_progressive(flat)), flat)


def test_restart_interval_baseline_roundtrip():
    # DRI + RSTn markers: DC predictions reset per segment, readers
    # re-align at every marker; pixels must match the no-restart stream
    rng = np.random.RandomState(43)
    img = rng.randint(0, 256, size=(40, 56)).astype(np.uint8)
    ref = decode_baseline(encode_baseline(img))
    for ri in (1, 3, 8):
        b = encode_baseline(img, restart_interval=ri)
        n_rst = sum(b.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
        assert n_rst == (35 + ri - 1) // ri - 1     # 5x7 = 35 MCUs
        assert np.array_equal(decode_baseline(b), ref)


def test_restart_interval_420_color():
    rng = np.random.RandomState(47)
    img = rng.randint(0, 256, size=(33, 49, 3)).astype(np.uint8)
    b = encode_baseline(img, subsampling="420", restart_interval=2)
    ref = decode_baseline(encode_baseline(img, subsampling="420"))
    assert np.array_equal(decode_baseline(b), ref)


def test_restart_interval_progressive_coefficient_exact():
    # restart boundaries interact with every progressive scan kind:
    # DC pred resets, EOB runs forced to flush at segment ends
    rng = np.random.RandomState(53)
    img = rng.randint(0, 256, size=(40, 56)).astype(np.uint8)
    expect = _fdct_quant(img, np.ones((8, 8), dtype=np.int64))
    for ri in (1, 4):
        _, coefs = decode_coefficients(
            encode_progressive(img, restart_interval=ri)
        )
        assert np.array_equal(coefs[0], expect)


def test_restart_marker_without_dri_rejected():
    img = np.full((24, 24), 90, dtype=np.uint8)
    b = bytearray(encode_baseline(img, restart_interval=2))
    i = bytes(b).find(b"\xff\xdd")
    del b[i : i + 6]                    # strip DRI, keep the RSTn markers
    with pytest.raises(ValueError, match="restart"):
        decode_coefficients(bytes(b))


def test_missing_restart_segment_raises():
    rng = np.random.RandomState(59)
    img = rng.randint(0, 256, size=(40, 56)).astype(np.uint8)
    b = encode_baseline(img, restart_interval=2)
    cut = b.find(b"\xff\xd1")           # truncate at the second RST
    assert cut > 0
    with pytest.raises(ValueError):
        decode_baseline(b[:cut] + b"\xff\xd9")


def test_progressive_truncated_raises():
    b = encode_progressive(np.full((16, 16), 77, dtype=np.uint8))
    for frac in (3, 2):
        with pytest.raises(ValueError):
            decode_baseline(b[: len(b) // frac])


def test_420_gray_content_exact():
    # flat gray tiles: chroma is a flat 128 plane, so the 2x2 box
    # average and replication upsample are both exact; luma blocks are
    # flat -> the whole 4:2:0 pipeline round-trips exactly
    rng = np.random.RandomState(41)
    img = np.repeat(
        _flat_tile_image(rng.randint(0, 256, size=(2, 4)))[:, :, None], 3, axis=2
    )
    out = decode_baseline(encode_baseline(img, subsampling="420"))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_420_random_color_bounded():
    rng = np.random.RandomState(43)
    img = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    out = decode_baseline(encode_baseline(img, subsampling="420"))
    # chroma lost to 2x2 averaging is real information loss; luma must
    # stay near-lossless.  Check per-channel mean drift instead of max.
    assert out.shape == img.shape
    assert abs(float(out.mean()) - float(img.mean())) < 3


def test_422_gray_content_exact():
    rng = np.random.RandomState(47)
    img = np.repeat(
        _flat_tile_image(rng.randint(0, 256, size=(3, 2)))[:, :, None], 3, axis=2
    )
    out = decode_baseline(encode_baseline(img, subsampling="422"))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_oversampled_jpeg_rejected():
    b = bytearray(encode_baseline(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = bytes(b).find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) ncomp(1), comp0 = id,samp,tq
    b[i + 2 + 2 + 5 + 1 + 1] = 0x33     # comp 0 sampling 1x1 -> 3x3
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_coefficients(bytes(b))


def test_truncated_entropy_segment_raises():
    b = encode_baseline(np.full((16, 16), 77, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_baseline(b[: len(b) // 2])


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_coefficients(b"PK\x03\x04 not a jpeg")


def test_reference_image_prefix_decodes():
    # real-world interop against the reference's own input: markers,
    # Annex-K-style Huffman tables from DHT, and the entropy stream all
    # parse.  Prefix decode (sequential stream -> a valid prefix proves
    # the decoder without paying ~10 s for all 29k MCUs; the full
    # decode runs under SPARK_GRAFT_SLOW_TESTS=1).
    if not os.path.exists(REF_JPEG):
        pytest.skip("reference image not present")
    b = open(REF_JPEG, "rb").read()
    meta, coefs = decode_coefficients(b, max_mcus=500)
    assert (meta["h"], meta["w"], meta["ncomp"]) == (1305, 1440, 3)
    # 500 MCUs of a real photo must produce nonzero luma coefficients
    assert int(np.abs(coefs[0][:500]).sum()) > 0


def test_mutation_fuzz_raises_only_value_errors():
    """Poison-payload contract: at 100 TB one malformed byte stream must
    not kill an executor stage with an unclassified exception.  Mutated
    valid files (bit flips, truncations, length-field corruption) may
    only raise ValueError / NotImplementedError from any decoder.
    (14,400-trial sweep at introduction found and fixed 17 crash
    classes: zlib.error passthrough, SOS StopIteration, Huffman-table
    KeyError, short-segment IndexError.)"""
    from ocr_spark.functions.multimodal import (
        decode_media_real,
        encode_bmp,
        encode_mjpeg_avi,
        encode_png,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 24, 3)).astype(np.uint8)
    gray = img[:, :, 0]
    samples = rng.randint(-1000, 1000, size=(64, 2)).astype(np.int16)
    valid = {
        "image": [encode_bmp(img), encode_png(img), encode_baseline(gray),
                  encode_baseline(img, subsampling="420"),
                  encode_progressive(gray),
                  encode_progressive(img, subsampling="420"),
                  encode_baseline(gray, restart_interval=2),
                  encode_progressive(gray, restart_interval=2),
                  b"P6 24 16 255\n" + img.tobytes()],
        "audio": [encode_wav(samples, 8000)],
        "video": [encode_mjpeg_avi([encode_baseline(gray)], 10, 24, 16)],
    }
    for mt, files in valid.items():
        for base in files:
            for trial in range(150):
                b = bytearray(base)
                kind = trial % 3
                if kind == 0:
                    i = rng.randint(0, len(b))
                    b[i] = rng.randint(0, 256)
                elif kind == 1:
                    b = b[: rng.randint(0, len(b))]
                else:
                    for _ in range(4):
                        i = rng.randint(0, len(b))
                        b[i] = rng.randint(0, 256)
                try:
                    decode_media_real(bytes(b), mt)
                except (ValueError, NotImplementedError):
                    pass
                # any other exception propagates -> test fails


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="full 1.9 MP pure-Python decode ~10 s; set SPARK_GRAFT_SLOW_TESTS=1",
)
def test_reference_image_full_decode():
    b = open(REF_JPEG, "rb").read()
    img = decode_baseline(b)
    assert img.shape == (1305, 1440, 3) and img.dtype == np.uint8
    gray = img.mean(axis=2)
    # handwriting on paper: mostly bright background, real dark strokes
    assert (gray > 180).mean() > 0.5
    assert (gray < 80).mean() > 0.05


def test_reference_progressive_images_interop():
    """The reference repo's OTHER two checked-in photos (test_image2.jpg,
    testimage.jpg) are PROGRESSIVE JPEGs (SOF2) — real-world multi-scan
    streams with camera-export Huffman tables and successive
    approximation, not our fixtures.  The round-4 progressive decoder
    must decode them; geometry and exact channel sums are pinned (the
    decoder is deterministic, so any entropy/refinement regression moves
    these integers).  testimage.jpg (same codec path) is gated behind
    OCR_SPARK_SLOW=1 to keep the default suite fast."""
    import os

    import numpy as np

    from ocr_spark.functions.jpeg import decode_baseline

    b = open("/root/reference/test_image2.jpg", "rb").read()
    assert b[2:4] != b"\xff\xc0"  # really not baseline
    arr = decode_baseline(b).astype(np.int64)
    assert arr.shape == (2560, 1440, 3)
    assert [int(arr[:, :, c].sum()) for c in range(3)] == [
        428279233, 406894227, 402871374]
    assert arr[1280, 720].tolist() == [150, 143, 139]
    if os.environ.get("OCR_SPARK_SLOW") == "1":
        arr2 = decode_baseline(
            open("/root/reference/testimage.jpg", "rb").read()
        )
        assert arr2.shape == (2560, 1440, 3)
