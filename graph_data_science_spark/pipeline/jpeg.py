"""Baseline JPEG codec — pure numpy + stdlib, no PIL/libjpeg.

Closes the last stubbed compressed-image format in the multimodal
pipeline (``pipeline/multimodal.py`` carries real WAV/PPM/PNG codecs;
JPEG previously raised ``NotImplementedError``). Everything here is
from the public JPEG spec (ITU-T T.81 / ISO 10918-1) and the JFIF 1.02
note: Annex K quantization + Huffman tables, baseline sequential DCT.

Scope (honestly bounded):

- encode: 8-bit grayscale ``(h, w)`` and RGB ``(h, w, 3)``; 4:4:4 or
  4:2:0 chroma subsampling; IJG-style quality scaling of the Annex K
  tables; edge-replicated padding for non-multiple-of-8 dims.
- decode: baseline sequential (SOF0), 8-bit, 1 or 3 components with
  sampling factors in {1, 2}, restart markers (DRI/RSTn). Progressive
  (SOF2), arithmetic coding, 12-bit and hierarchical modes raise
  ``NotImplementedError`` loudly.

Execution shape: entropy coding is necessarily bit-serial Python (it
is a sequential prefix code), but every numeric stage — level shift,
8×8 DCT/IDCT (matrix sandwich ``C @ B @ C.T`` over ALL blocks at once
via ``einsum``), quantization, dequantization, upsampling, YCbCr
conversion — is vectorized numpy over the whole image. At Spark level
the codec runs inside ``mapInPandas`` over Arrow batches, one image
per row, like every other multimodal codec in this repo.

Exactness contract used by the DuckDB oracle row (``multimodal_jpeg``):
JPEG is lossy in general, but a grayscale image built from constant
8×8 tiles whose values are EVEN survives the full pipeline bit-exactly
at quality 50 (Annex K luma table has ``q[0,0] = 16``; a constant
block has DC = 8·(v−128) and zero AC, and 8·even/16 is an exact
integer), so the oracle can replay the decoded pixels in SQL.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec tables (ITU-T T.81 Annex K — public standard)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_INV_ZIGZAG = np.argsort(_ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) per Annex K.3 — canonical Huffman definitions
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward ``F = C @ B @ C.T``
    matches the T.81 FDCT exactly (constant block a → DC = 8a)."""
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → table unchanged, 100 → all ones."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _huffman_codes(bits, values) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_blocks(
    bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """Entropy-encode one block already in zigzag order; returns new DC
    predictor."""
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    c, ln = dc_codes[s]
    bw.put(c, ln)
    bw.put(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        s, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(bits, s)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.put(c, ln)
    return dc


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _plane_to_quantized_blocks(
    plane: np.ndarray, qtab: np.ndarray
) -> np.ndarray:
    """(H, W) float plane (already level-shifted) -> (nby, nbx, 64)
    quantized zigzag coefficients. DCT over every block in one einsum."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ux,ryxc,vc->ryuv", _C, b, _C, optimize=True)
    q = np.round(f / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(h // 8, w // 8, 64)[:, :, _ZIGZAG]


def _rgb_to_ycbcr(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = a[:, :, 0].astype(np.float64)
    g = a[:, :, 1].astype(np.float64)
    b = a[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 75, subsample: str = "444"
) -> bytes:
    """uint8 ``(h, w)`` grayscale or ``(h, w, 3)`` RGB -> baseline JFIF
    bytes. ``subsample``: ``"444"`` (one chroma block per luma block) or
    ``"420"`` (2×2 luma blocks per chroma block, area-mean downsample)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim not in (2, 3) or (a.ndim == 3 and a.shape[2] != 3):
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = a.shape[:2]
    gray = a.ndim == 2
    qt0 = _scaled_q(_Q_LUMA, quality)
    qt1 = _scaled_q(_Q_CHROMA, quality)
    dc0 = _huffman_codes(*_DC_LUMA)
    ac0 = _huffman_codes(*_AC_LUMA)
    dc1 = _huffman_codes(*_DC_CHROMA)
    ac1 = _huffman_codes(*_AC_CHROMA)

    if gray:
        comps = [(1, 1, 1, 0)]  # (id, hsamp, vsamp, qtab id)
        planes = [_pad_edge(a.astype(np.float64), 8) - 128.0]
    else:
        y, cb, cr = _rgb_to_ycbcr(a)
        if subsample == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [
                _pad_edge(y, 8) - 128.0,
                _pad_edge(cb, 8) - 128.0,
                _pad_edge(cr, 8) - 128.0,
            ]
        else:
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            yp = _pad_edge(y, 16)
            # area-mean 2×2 chroma downsample on the even-padded plane
            cbp = _pad_edge(cb, 2)
            crp = _pad_edge(cr, 2)
            cbd = cbp.reshape(
                cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            crd = crp.reshape(
                crp.shape[0] // 2, 2, crp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            planes = [
                yp - 128.0,
                _pad_edge(cbd, 8) - 128.0,
                _pad_edge(crd, 8) - 128.0,
            ]

    blocks = [
        _plane_to_quantized_blocks(p, qt0 if comps[i][3] == 0 else qt1)
        for i, p in enumerate(planes)
    ]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_cid, hs, vs, qid) in enumerate(comps):
                dcc = dc0 if qid == 0 else dc1
                acc = ac0 if qid == 0 else ac1
                for by in range(vs):
                    for bx in range(hs):
                        zz = blocks[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_blocks(
                            bw, zz, preds[ci], dcc, acc
                        )
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, tab in ((0, qt0),) + (() if gray else ((1, qt1),)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in tab[_ZIGZAG])
    ncomp = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hs, vs, qid in comps:
        out += bytes([cid, (hs << 4) | vs, qid])
    hts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        hts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tclass, (bits, vals) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tclass]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i, (cid, _hs, _vs, qid) in enumerate(comps):
        td_ta = 0x00 if qid == 0 else 0x11
        out += bytes([cid, td_ta])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical decode via T.81 F.2.2.3 (mincode/maxcode/valptr)."""

    def __init__(self, bits, values) -> None:
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """Reads the entropy-coded segment of one restart interval
    (stuffed 0xFF00 already collapsed by the caller)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                # past the end: T.81 lets the decoder supply 1-bits
                return 1
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _HuffTable) -> int:
        code = self.bit()
        ln = 1
        while code > table.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("corrupt JPEG: invalid Huffman code")
            code = (code << 1) | self.bit()
        return table.values[table.valptr[ln] + code - table.mincode[ln]]


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _split_scan(data: bytes) -> list[bytes]:
    """Split the entropy stream at RSTn markers and collapse 0xFF00
    stuffing; returns one bytes per restart interval."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF and i + 1 < n:
            m = data[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker terminates the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 ``(h, w)`` grayscale or
    ``(h, w, 3)`` RGB. See module docstring for supported scope."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps: list[tuple[int, int, int, int]] = []
    h = w = None
    restart_interval = 0
    scan_data = None
    scan_comps: list[tuple[int, int, int]] = []

    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them instead of misreading 0xFF as a code
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers with no length field
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(
                    seg[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = tab[_INV_ZIGZAG]
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    bits, vals
                )
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hs}x{vs}"
                    )
                comps.append((cid, hs, vs, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            ns = seg[0]
            for i in range(ns):
                cid, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tdta >> 4, tdta & 0x0F))
            scan_data = payload[pos:]
            break
        # APPn/COM/others: skipped via seglen

    if h is None or scan_data is None:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan_comps) != len(comps):
        raise NotImplementedError("multi-scan JPEG")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    order = {cid: i for i, (cid, *_rest) in enumerate(comps)}
    tables = [None] * len(comps)
    for cid, td, ta in scan_comps:
        tables[order[cid]] = (huff_dc[td], huff_ac[ta])

    # entropy-decode every MCU into per-component zigzag coefficients
    nblocks = [c[1] * c[2] * n_mcu for c in comps]
    coeffs = [np.zeros((nb, 64), dtype=np.int64) for nb in nblocks]
    segments = _split_scan(scan_data)
    seg_idx = 0
    br = _BitReader(segments[0])
    preds = [0] * len(comps)
    interval = restart_interval or n_mcu
    for mcu in range(n_mcu):
        if mcu and restart_interval and mcu % interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("corrupt JPEG: missing restart segment")
            br = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        for ci, (_cid, hs, vs, _tq) in enumerate(comps):
            dct, act = tables[ci]
            for blk in range(hs * vs):
                zz = coeffs[ci][mcu * hs * vs + blk]
                s = br.huff(dct)
                preds[ci] += _extend(br.bits(s), s)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = br.huff(act)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break
                    k += run
                    if k > 63:
                        raise ValueError("corrupt JPEG: AC overflow")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1

    # vectorized dequantize + IDCT + scatter per component
    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        deq = coeffs[ci] * qtabs[tq][_ZIGZAG][None, :]
        blocks = deq[:, _INV_ZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("xu,buv,vy->bxy", _C.T, blocks, _C, optimize=True)
        pix += 128.0
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        plane = np.zeros((ph, pw), dtype=np.float64)
        # block n (MCU-major, then row-major within the MCU) -> grid pos
        idx = np.arange(len(blocks))
        mcu_i = idx // (hs * vs)
        blk_i = idx % (hs * vs)
        brow = (mcu_i // mcux) * vs + blk_i // hs
        bcol = (mcu_i % mcux) * hs + blk_i % hs
        p4 = plane.reshape(ph // 8, 8, pw // 8, 8)
        p4[brow, :, bcol, :] = pix
        # upsample to full resolution (factor 1 or 2 per axis)
        fy, fx = vmax // vs, hmax // hs
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
