"""Pure-NumPy/stdlib GIF89a codec — no codec libraries.

Decoder: header + logical screen descriptor walk, global/local color
tables, extension-block skipping, REAL LZW decompression (variable code
width 3..12 bits, LSB-first bit packing, clear-code dictionary resets,
the deferred +1 code-width growth rule), and 4-pass interlace
reordering.  Encoder twin emits genuinely compressed LZW streams
(greedy longest-match dictionary, configurable reset cap so fixtures
exercise the clear-code path) for deterministic fixtures; round-trips
are pixel-exact because GIF is lossless.

Reference parity note: the reference app decodes its uploads via PIL
(`handwriting/api.py:20`) which accepts GIF among PNG/JPEG; this module
is the in-sandbox stand-in for that codec surface, same as
ocr_spark/functions/jpeg.py for JPEG.  Format layout follows the public
GIF89a specification (CompuServe, 1990) and the LZW variant described
in it.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF89a"

# 4-pass interlace row schedule: (first row, stride) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_row_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(indices: np.ndarray, min_code_size: int,
               dict_cap: int = 4096) -> bytes:
    """GIF LZW: greedy longest-match over a prefix dictionary, codes
    LSB-first at a width that grows with the dictionary; a CLEAR code is
    emitted when the dictionary reaches `dict_cap` (fixtures use a small
    cap so decoders must exercise the reset path).

    Width growth follows the canonical giflib rule: the check runs after
    EVERY code written, against the next free slot BEFORE the insertion
    that follows — keying growth on insertions instead desyncs from the
    decoder at the END-code boundary (the decoder inserts an entry for
    the final data code; the encoder never does)."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()
    table: dict = {}
    next_code = 0
    width = 0

    def out(code: int) -> None:
        nonlocal width
        bw.write(code, width)
        if next_code >= (1 << width) and width < 12:
            width += 1

    def fresh() -> None:
        nonlocal table, next_code, width
        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        width = min_code_size + 1

    fresh()
    out(clear)
    seq: tuple = ()
    for v in indices.ravel().tolist():
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        out(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code >= min(dict_cap, 4096):
            out(clear)
            fresh()
        seq = (v,)
    if seq:
        out(table[seq])
    out(end)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of lzw_encode; raises ValueError on malformed streams
    (bad code, missing END, output overrun) — the poison-envelope
    contract (P26)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[tuple] = []
    width = min_code_size + 1
    prev: tuple | None = None
    counter = end + 1  # giflib RunningCode: counts code READS since reset

    def reset() -> None:
        nonlocal table, width, prev, counter
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1
        prev = None
        counter = end + 1

    reset()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream truncated before END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        # canonical giflib growth rule: keyed on codes READ, not on
        # table insertions (see the encoder twin's docstring)
        counter += 1
        if counter > (1 << width) and width < 12:
            width += 1
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF: first LZW code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} beyond table {len(table)}")
        out.extend(entry)
        if len(out) > n_expected:
            raise ValueError("GIF: LZW output exceeds image size")
        prev = entry
    if len(out) != n_expected:
        raise ValueError(
            f"GIF: LZW produced {len(out)} of {n_expected} pixels"
        )
    return np.asarray(out, dtype=np.uint8)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _sub_blocks(data: bytes) -> bytes:
    """Split a byte string into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False, dict_cap: int = 4096) -> bytes:
    """Single-frame GIF89a from an (H, W) uint8 index array and an
    (N, 3) uint8 palette (N a power of two, 2..256)."""
    h, w = indices.shape
    n_colors = len(palette)
    size_bits = max(1, int(n_colors - 1).bit_length())
    if 1 << size_bits != n_colors:
        raise ValueError("palette size must be a power of two")
    out = bytearray(GIF_MAGIC)
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((size_bits - 1) & 0x07))  # GCT present, size bits
    out += b"\x00\x00"                           # bg index, aspect
    out += palette.astype(np.uint8).tobytes()
    # a comment extension so decoders must walk extension blocks
    out += b"\x21\xfe" + _sub_blocks(b"ocr_spark fixture")
    out.append(0x2C)                             # image descriptor
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    rows = indices
    if interlace:
        rows = indices[_interlaced_row_order(h)]
    min_code = max(2, size_bits)
    out.append(min_code)
    out += _sub_blocks(lzw_encode(rows, min_code, dict_cap))
    out.append(0x3B)                             # trailer
    return bytes(out)


def decode_gif(b: bytes) -> np.ndarray:
    """First image frame of a GIF87a/89a stream -> (H, W, 3) uint8 RGB."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        raise ValueError("GIF: bad signature")
    sw, sh = struct.unpack_from("<HH", b, 6)
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("GIF: truncated global color table")
        gct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while True:
        if pos >= len(b):
            raise ValueError("GIF: missing trailer")
        block = b[pos]
        pos += 1
        if block == 0x3B:                        # trailer before any image
            raise ValueError("GIF: no image descriptor")
        if block == 0x21:                        # extension: skip sub-blocks
            pos += 1                             # label
            while True:
                if pos >= len(b):
                    raise ValueError("GIF: truncated extension")
                ln = b[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        break
    if pos + 9 > len(b):
        raise ValueError("GIF: truncated image descriptor")
    left, top, w, h = struct.unpack_from("<HHHH", b, pos)
    ipacked = b[pos + 8]
    pos += 9
    if w == 0 or h == 0 or left + w > sw or top + h > sh:
        raise ValueError("GIF: image geometry outside logical screen")
    table = gct
    if ipacked & 0x80:                           # local color table
        n = 2 << (ipacked & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("GIF: truncated local color table")
        table = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if table is None:
        raise ValueError("GIF: no color table")
    if pos >= len(b):
        raise ValueError("GIF: missing LZW code size")
    min_code = b[pos]
    pos += 1
    data = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("GIF: truncated image data")
        ln = b[pos]
        pos += 1
        if ln == 0:
            break
        data += b[pos:pos + ln]
        if len(data) != len(bytearray(data)):    # pragma: no cover
            raise ValueError("GIF: bad sub-block")
        pos += ln
        if pos > len(b):
            raise ValueError("GIF: truncated image sub-block")
    idx = lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
    if int(idx.max(initial=0)) >= len(table):
        raise ValueError("GIF: pixel index outside color table")
    if ipacked & 0x40:                           # deinterlace
        order = _interlaced_row_order(h)
        out = np.empty_like(idx)
        out[order] = idx
        idx = out
    return table[idx]
