"""Pure-NumPy baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the last compressed-codec seam in decode_media_real: the
reference's actual inputs are baseline JPEGs (reference
handwriting/api.py:20 decodes test_image.jpg via PIL Image.open; that
file is SOF0, 3 components, all 1x1 sampling — i.e. 4:4:4, no chroma
subsampling), and this module decodes exactly that class without any
codec library:

  - decode_baseline: SOF0, 8-bit, grayscale or 3-component color with
    sampling factors up to 2x2 — covering 4:4:4 (the reference image),
    4:2:0 (the dominant real-world layout; chroma upsampled by pixel
    replication), and 4:2:2.  Progressive (SOF2), arithmetic-coded,
    restart-interval, and >2x sampling streams raise
    NotImplementedError at a single marked seam — the same
    honest-boundary convention as the PNG/BMP decoders in
    multimodal.py.
  - encode_baseline: the fixture-side twin (grayscale, 4:4:4, 4:2:0,
    or 4:2:2 color) writing real Huffman-coded entropy data with the
    spec's Annex K example tables, so decoder fixtures are genuine
    JPEG streams, not replayed private structures.

Design notes for the 100 TB setting: a JPEG payload decodes
independently of every other payload, so the distributed shape is the
same narrow mapInPandas op as BMP/PNG (multimodal.decode_jpegs_real) —
per-partition Python cost, zero shuffle.  Inside one payload the
entropy scan is inherently sequential (DC prediction + variable-length
codes), so the per-block Huffman loop is Python while everything after
it (dequantize, inverse zigzag, IDCT, level shift, color transform) is
vectorized over ALL blocks at once with einsum/NumPy.

Spec references (public): ITU-T T.81 — canonical Huffman code
generation Annex C, entropy decode F.2.2, zigzag Figure 5, example
tables Annex K.3; JFIF YCbCr<->RGB in ITU-T T.871.
"""

from __future__ import annotations

import numpy as np

# --- constant tables (ITU-T T.81 public spec) ---------------------------

# zigzag scan order: ZIGZAG[k] = raster index of the k-th scanned coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)           # raster index -> scan position

# Annex K.3.1 example Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthogonal 8x8 DCT-II basis: F = A @ S @ A.T per T.81 A.3.3
_x = np.arange(8)
_A = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
_A[0] *= 1 / np.sqrt(2)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code generation: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """16-bit-prefix lookup tables: peek 16 bits, read symbol + length
    in O(1) (the classic flat-LUT Huffman decoder; max JPEG code length
    is 16 so one table suffices).  Returned as plain Python lists —
    scalar lookups in the per-symbol hot loop beat NumPy indexing."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for v, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = v
        ln[lo:hi] = length
    return sym.tolist(), ln.tolist()


# --- bit IO -------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:               # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # pad with 1-bits per F.1.2.3
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader over destuffed bytes, with O(1)
    16-bit peeks via a precomputed 32-bit sliding-window array."""

    def __init__(self, data: bytes) -> None:
        arr = np.frombuffer(data + b"\x00\x00\x00\x00", dtype=np.uint8)
        # plain Python list: scalar indexing in the per-symbol hot loop
        # is ~3x faster than NumPy scalar indexing
        self._w32 = (
            (arr[:-3].astype(np.uint32) << 24)
            | (arr[1:-2].astype(np.uint32) << 16)
            | (arr[2:-1].astype(np.uint32) << 8)
            | arr[3:].astype(np.uint32)
        ).tolist()
        self.pos = 0                    # bit position
        self.limit = len(data) * 8

    def peek16(self) -> int:
        pos = self.pos
        if pos >= self.limit:
            raise ValueError("JPEG entropy segment exhausted")
        return (self._w32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF

    def take(self, n: int) -> int:
        pos = self.pos
        v = (
            ((self._w32[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (16 - n)
            if n
            else 0
        )
        self.pos = pos + n
        if self.pos > self.limit:
            raise ValueError("JPEG entropy segment exhausted")
        return v


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map `size` raw bits to the signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


# --- encoder ------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane -> (nblocks, 64) int32 quantized coefficients
    in zigzag order; blocks raster-ordered.  H and W must be multiples
    of 8 (the fixture writer pads before calling)."""
    h, w = plane.shape
    s = plane.astype(np.float64) - 128.0
    blocks = (
        s.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    return np.round(
        coef.reshape(-1, 64)[:, ZIGZAG] / qtab.reshape(64)[ZIGZAG][None, :]
    ).astype(np.int32)


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one zigzag coefficient block; returns new DC pred."""
    dc = int(zz[0])
    diff = dc - pred
    size = _csize(diff)
    code, ln = dc_codes[size]
    bw.put(code, ln)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]   # ZRL
            bw.put(code, ln)
            run -= 16
        size = _csize(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]       # EOB
        bw.put(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def encode_baseline(arr: np.ndarray, qtab_luma: np.ndarray | None = None,
                    qtab_chroma: np.ndarray | None = None,
                    subsampling: str = "444") -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as a baseline
    sequential JPEG.  `subsampling` picks the color layout: '444'
    (1x1 everywhere — the reference image's own layout), '420'
    (2x2 luma, 2x2-box-averaged chroma — the dominant real-world
    layout), or '422' (2x1 luma, horizontally averaged chroma).
    Quant tables default to all-ones (near-lossless) so
    fixture round-trips stay closed-form; pass real tables for lossy
    behavior.  Edge blocks are padded by edge replication."""
    if qtab_luma is None:
        qtab_luma = np.ones((8, 8), dtype=np.int64)
    if qtab_chroma is None:
        qtab_chroma = qtab_luma
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    sub420 = (not gray) and subsampling == "420"
    sub422 = (not gray) and subsampling == "422"
    ph = (-h) % (16 if sub420 else 8)
    pw = (-w) % (16 if (sub420 or sub422) else 8)
    if gray:
        planes = [np.pad(arr, ((0, ph), (0, pw)), mode="edge")]
        qtabs = [qtab_luma]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        planes = [
            np.pad(np.clip(np.round(p), 0, 255).astype(np.uint8),
                   ((0, ph), (0, pw)), mode="edge")
            for p in (y, cb, cr)
        ]
        qtabs = [qtab_luma, qtab_chroma, qtab_chroma]
        if sub420:
            # chroma = 2x2 box average with round-half-up in integers
            planes = [planes[0]] + [
                ((p[0::2, 0::2].astype(np.int64)
                  + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) // 4
                 ).astype(np.uint8)
                for p in planes[1:]
            ]
            samps = [(2, 2), (1, 1), (1, 1)]
        elif sub422:
            # chroma = horizontal pair average
            planes = [planes[0]] + [
                ((p[:, 0::2].astype(np.int64) + p[:, 1::2] + 1) // 2
                 ).astype(np.uint8)
                for p in planes[1:]
            ]
            samps = [(2, 1), (1, 1), (1, 1)]
        else:
            samps = [(1, 1)] * 3

    coefs = [_fdct_quant(p, q) for p, q in zip(planes, qtabs)]

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_c = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = planes[0].shape[1] // (8 * hmax)
    mcuy = planes[0].shape[0] // (8 * vmax)
    grid_ws = [planes[ci].shape[1] // 8 for ci in range(len(planes))]
    for n in range(mcux * mcuy):        # interleaved MCU order
        my, mx = divmod(n, mcux)
        for ci in range(len(planes)):
            hi, vi = samps[ci]
            dc_codes = dc_l if ci == 0 else dc_c
            ac_codes = ac_l if ci == 0 else ac_c
            for by in range(vi):
                for bx in range(hi):
                    idx = (my * vi + by) * grid_ws[ci] + (mx * hi + bx)
                    preds[ci] = _encode_block(bw, coefs[ci][idx], preds[ci],
                                              dc_codes, ac_codes)
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")        # SOI
    out += _seg(0xDB, bytes([0x00])
                + bytes(qtab_luma.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01])
                    + bytes(qtab_chroma.reshape(64)[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_LUM_BITS, DC_LUM_VALS))
    out += _seg(0xC4, _dht_body(1, 0, AC_LUM_BITS, AC_LUM_VALS))
    if not gray:
        out += _seg(0xC4, _dht_body(0, 1, DC_CHR_BITS, DC_CHR_VALS))
        out += _seg(0xC4, _dht_body(1, 1, AC_CHR_BITS, AC_CHR_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"                  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------


def _destuff(data: bytes) -> bytes:
    """Strip 0xFF00 byte stuffing, stopping at the first real marker
    (anything 0xFFxx with xx not in {0x00}).  Restart markers (RSTn)
    are rejected upstream via the DRI check."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = data.find(0xFF, i)
        if j < 0:
            out += data[i:]
            break
        out += data[i:j]
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            out.append(0xFF)
            i = j + 2
        else:
            break                       # real marker terminates the scan
    return bytes(out)


def decode_coefficients(b: bytes, max_mcus: int | None = None):
    """Parse a baseline JPEG and entropy-decode its quantized
    coefficients WITHOUT dequant/IDCT.  Returns (meta, coefs) where
    meta = dict(h, w, ncomp, qtabs per component) and coefs is a list
    of (nblocks, 64) int32 zigzag-order arrays per component.  Split
    out so tests can assert exact Huffman/zigzag integrity against the
    encoder's known coefficients (float-free comparison).  `max_mcus`
    stops the sequential entropy scan after that many MCUs (prefix
    decode — the stream is sequential, so a valid prefix proves marker
    parsing + Huffman tables + entropy decode without paying for the
    whole image; remaining blocks stay zero)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_luts: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    ac_luts: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    h = w = None
    comps: list[tuple[int, int]] = []   # (comp_id, qtab_id)
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_table, ac_table)
    entropy_at = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:              # EOI
            break
        ln = int.from_bytes(b[pos + 2 : pos + 4], "big")
        body = b[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:              # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit DQT unsupported")
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)      # zigzag order
                i += 65
        elif marker == 0xC4:            # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                if len(bits) < 16 or i + 17 + nv > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[i + 17 : i + 17 + nv])
                (dc_luts if tc == 0 else ac_luts)[th] = _decode_lut(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("truncated SOF segment")
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    # the honest seam: sampling factors beyond 2 need
                    # fractional upsampling kernels — not implemented
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} unsupported (1-2 only)"
                    )
                comps.append((cid, tq, hi, vi))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X} "
                "(progressive/arithmetic) unsupported"
            )
        elif marker == 0xDD:            # DRI
            if int.from_bytes(body[0:2], "big") != 0:
                raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:            # SOS
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(
                    (i for i, (c, _, _, _) in enumerate(comps) if c == cid),
                    None,
                )
                if idx is None:
                    raise ValueError(f"SOS references unknown component {cid}")
                scan.append((idx, tabs >> 4, tabs & 15))
            entropy_at = pos + 2 + ln
            break
        # APPn / COM / others: skip by length
        pos += 2 + ln
    if h is None or entropy_at is None:
        raise ValueError("JPEG missing SOF/SOS")
    # poison-payload hardening: every table id the scan references must
    # have been defined by a DQT/DHT segment (malformed -> ValueError,
    # never a KeyError escaping into an executor)
    for _, tq, _, _ in comps:
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
    for _, dct, act in scan:
        if dct not in dc_luts or act not in ac_luts:
            raise ValueError(f"missing Huffman table dc={dct}/ac={act}")

    br = _BitReader(_destuff(b[entropy_at:]))
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component block-grid dims (MCU-padded)
    grids = [(mcux * hi, mcuy * vi) for _, _, hi, vi in comps]
    coefs = [np.zeros((gw * gh, 64), dtype=np.int32) for gw, gh in grids]
    preds = [0] * len(comps)

    def read_sym(lut) -> int:
        sym_t, len_t = lut
        v = br.peek16()
        length = int(len_t[v])
        if length == 0:
            raise ValueError("invalid Huffman code in entropy segment")
        br.pos += length
        return int(sym_t[v])

    def read_block(blk, ci, dct, act) -> None:
        dc_lut, ac_lut = dc_luts[dct], ac_luts[act]
        size = read_sym(dc_lut)
        diff = _extend(br.take(size), size)
        preds[ci] += diff
        blk[0] = preds[ci]
        k = 1
        while k < 64:
            rs = read_sym(ac_lut)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:             # ZRL
                    k += 16
                    continue
                break                   # EOB
            k += r
            if k > 63:
                raise ValueError("AC run overflows block")
            blk[k] = _extend(br.take(s), s)
            k += 1

    n_mcus = mcux * mcuy
    n_scan = n_mcus if max_mcus is None else min(n_mcus, max_mcus)
    for n in range(n_scan):
        my, mx = divmod(n, mcux)
        for ci, dct, act in scan:
            _, _, hi, vi = comps[ci]
            gw = grids[ci][0]
            # Hi x Vi data units per MCU, raster order inside the MCU
            for by in range(vi):
                for bx in range(hi):
                    idx = (my * vi + by) * gw + (mx * hi + bx)
                    read_block(coefs[ci][idx], ci, dct, act)
    meta = {
        "h": h,
        "w": w,
        "ncomp": len(comps),
        "qtabs": [qtables[tq] for _, tq, _, _ in comps],
        "sampling": [(hi, vi) for _, _, hi, vi in comps],
        "grids": grids,
    }
    return meta, coefs


def decode_baseline(b: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4/grayscale JPEG to uint8 pixels:
    (H, W) for 1 component, (H, W, 3) RGB for 3 components.  Entropy
    decode is the sequential Python loop (inherent to Huffman+DC
    prediction); dequant + inverse zigzag + IDCT + level shift + color
    transform run vectorized over all blocks at once."""
    meta, coefs = decode_coefficients(b)
    h, w, ncomp = meta["h"], meta["w"], meta["ncomp"]
    hmax = max(hi for hi, _ in meta["sampling"])
    vmax = max(vi for _, vi in meta["sampling"])
    planes = []
    for zz, qt, (hi, vi), (gw, gh) in zip(
        coefs, meta["qtabs"], meta["sampling"], meta["grids"]
    ):
        deq = zz.astype(np.float64) * qt[None, :]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq         # inverse zigzag
        blocks = raster.reshape(-1, 8, 8)
        spatial = np.einsum("xu,nuv,yv->nxy", _A.T, blocks, _A.T)
        img = (
            spatial.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        if hi != hmax or vi != vmax:
            # subsampled chroma: pixel-replication upsample (box kernel
            # — the inverse of the encoder's 2x2 box average)
            img = np.repeat(np.repeat(img, vmax // vi, axis=0),
                            hmax // hi, axis=1)
        planes.append(img[:h, :w] + 128.0)
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
