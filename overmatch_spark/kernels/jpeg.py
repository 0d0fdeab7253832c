"""Baseline JPEG (JFIF) encode/decode — pure numpy + stdlib.

This is NOT a stubbed codec: baseline sequential JPEG needs only an
8x8 DCT, scalar quantization, and canonical Huffman coding — all
implementable exactly from the public spec (ITU-T T.81 / ISO 10918-1)
with numpy. The tables below are the spec's Annex K examples (the
ones every camera and libjpeg build ships); quality scaling uses the
standard IJG formula.

Scope:
  - baseline DCT, 8-bit, 3 components (YCbCr per JFIF/BT.601)
  - encoder emits 4:4:4 (default — the fixture corpus is seeded
    noise, the worst case for any DCT codec, and the sink invariant
    is PSNR >= 40 dB) or 4:2:0 (``subsample=True`` — the canonical
    real-world JPEG shape: Y at 2x2, box-filtered chroma at 1x1, for
    smooth/natural content where chroma bandwidth is wasted)
  - the DECODER is general over sampling factors: it implements the
    spec's interleaved-MCU layout for arbitrary (Hi, Vi) grids, so it
    accepts any single-scan baseline JPEG (4:4:4, 4:2:0, 4:2:2, ...),
    with tables read from the stream (DQT/DHT), not assumed
  - no restart intervals, no progressive, no arithmetic coding

Non-multiple-of-MCU dimensions: encoder pads by edge replication (the
spec's recommended practice); SOF0 records the true size; decoder
crops.

Speed note: the DCT/quantization is vectorized across all blocks;
entropy coding is per-symbol Python (inherent to Huffman). Fine for
the Arrow-batched mapInPandas decode path over fixture-sized images;
a real deployment would swap in libjpeg-turbo behind the same
encode/decode signature.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K quantization tables (row-major) -------------------------------

QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table clamped to 1..255."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --- Annex K Huffman table specs (BITS per code length 1..16, then values) --

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

for _b, _v in (
    (DC_LUMA_BITS, DC_LUMA_VALS),
    (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS),
    (AC_CHROMA_BITS, AC_CHROMA_VALS),
):
    assert sum(_b) == len(_v), "Huffman table spec mismatch"


def build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment per T.81 C.2: symbol -> (len, code)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {lc: sym for sym, lc in build_codes(bits, vals).items()}


# --- zigzag -----------------------------------------------------------------


def _zigzag_pairs() -> list[tuple[int, int]]:
    seq = []
    for d in range(15):
        rs = range(max(0, d - 7), min(d, 7) + 1)
        for r in (rs if d % 2 == 1 else reversed(list(rs))):
            seq.append((r, d - r))
    return seq


_ZZ = _zigzag_pairs()
# flat index (r*8+c) visited in zigzag order
ZIGZAG = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)
# inverse: zigzag position of each flat index
UNZIGZAG = np.argsort(ZIGZAG)

# --- DCT --------------------------------------------------------------------

_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        c = np.sqrt(1.0 / 8.0) if _i == 0 else 0.5
        _T[_i, _j] = c * np.cos((2 * _j + 1) * _i * np.pi / 16.0)


def _dct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) orthonormal DCT-II coefficients."""
    return np.einsum("ij,njk,lk->nil", _T, blocks, _T)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _T, coefs, _T)


# --- color ------------------------------------------------------------------


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# --- bit I/O (with 0xFF byte stuffing) ---------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, ln: int, code: int) -> None:
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write(pad, (1 << pad) - 1)
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(received: int, s: int) -> int:
    if s == 0:
        return 0
    return received if received >= (1 << (s - 1)) else received - (1 << s) + 1


# --- encode ------------------------------------------------------------------

_S444 = ((1, 1), (1, 1), (1, 1))
_S420 = ((2, 2), (1, 1), (1, 1))


def _pad_edge_to(ch: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = ch.shape
    if th > h or tw > w:
        ch = np.pad(ch, ((0, th - h), (0, tw - w)), mode="edge")
    return ch


def _box_downsample(ch: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-filter decimation by (fy, fx) with edge padding to a multiple."""
    if fy == 1 and fx == 1:
        return ch
    h, w = ch.shape
    ch = _pad_edge_to(ch, -(-h // fy) * fy, -(-w // fx) * fx)
    hh, ww = ch.shape
    return ch.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


def jpeg_encode_rgb(
    px: np.ndarray, quality: int = 98, subsample: bool = False
) -> bytes:
    """Baseline JFIF bytes for an (h, w, 3) uint8 array.

    quality follows the IJG 1..100 convention. Default 98 with no
    chroma subsampling: the sink invariant is PSNR >= 40 dB and the
    fixture corpus is seeded NOISE — the adversarial worst case for a
    DCT codec (no energy compaction), so the default sits where even
    noise survives; on natural/smooth content the same setting is
    visually lossless.

    subsample=True emits 4:2:0 (Y 2x2, box-filtered chroma 1x1) — the
    canonical real-world JPEG shape; use for smooth/natural content
    where chroma detail is sparse (noise does NOT survive it).
    """
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) uint8 array")
    h, w = px.shape[:2]
    sampling = _S420 if subsample else _S444
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qt = [scaled_qt(QT_LUMA, quality), scaled_qt(QT_CHROMA, quality)]
    ycc = rgb_to_ycbcr(px)

    # per component: downsample, pad to the MCU grid, vectorized
    # DCT + quantization into a (by, bx, 64) zigzag grid
    comp_zz: list[np.ndarray] = []
    for ci, (hi, vi) in enumerate(sampling):
        ch = _box_downsample(ycc[..., ci], vmax // vi, hmax // hi)
        by, bx = mcuy * vi, mcux * hi
        ch = _pad_edge_to(ch, by * 8, bx * 8) - 128.0
        blocks = (
            ch.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = _dct_blocks(blocks)
        q = qt[0 if ci == 0 else 1].reshape(8, 8).astype(np.float64)
        quant = np.clip(np.round(coefs / q).astype(np.int64), -2047, 2047)
        zz = quant.reshape(-1, 64)[:, ZIGZAG]
        # Annex-K AC Huffman size ceiling is 10 bits
        zz[:, 1:] = np.clip(zz[:, 1:], -1023, 1023)
        comp_zz.append(zz.reshape(by, bx, 64))

    dc_codes = [
        build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = [
        build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    bw = _BitWriter()
    prev_dc = [0, 0, 0]

    def emit_block(blk: np.ndarray, ci: int) -> None:
        t = 0 if ci == 0 else 1
        diff = int(blk[0]) - prev_dc[ci]
        prev_dc[ci] = int(blk[0])
        s, bits_v = _magnitude(diff)
        ln, code = dc_codes[t][s]
        bw.write(ln, code)
        if s:
            bw.write(s, bits_v)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = (nz[-1] + 1) if nz.size else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[t][0xF0]
                bw.write(ln, code)
                run -= 16
            s, bits_v = _magnitude(v)
            ln, code = ac_codes[t][(run << 4) | s]
            bw.write(ln, code)
            bw.write(s, bits_v)
            run = 0
        if last < 63:
            ln, code = ac_codes[t][0x00]  # EOB
            bw.write(ln, code)

    # spec interleaved-MCU order: per MCU, per component, Vi x Hi
    # blocks raster order (T.81 A.2.3)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(sampling):
                for v in range(vi):
                    for u in range(hi):
                        emit_block(comp_zz[ci][my * vi + v, mx * hi + u], ci)
    entropy = bw.flush()

    # --- wire format ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0]
    ) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, tbl in enumerate(qt):
        payload = bytes([tid]) + bytes(
            int(x) for x in tbl.reshape(64)[ZIGZAG]
        )
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (cid, qid) in enumerate(((1, 0), (2, 1), (3, 1))):
        hi, vi = sampling[ci]
        sof += bytes([cid, (hi << 4) | vi, qid])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decode ------------------------------------------------------------------


def jpeg_decode_rgb(buf: bytes) -> np.ndarray:
    """Decode single-scan baseline JFIF bytes -> (h, w, 3) uint8.

    General over sampling factors (4:4:4, 4:2:0, 4:2:2, ...): the
    interleaved-MCU layout is implemented per T.81 A.2.3 for arbitrary
    (Hi, Vi); subsampled planes are box-replicated back to full
    resolution. Tables are read from the stream (DQT/DHT), not
    assumed."""
    data = bytes(buf)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, qid)
    scan_sel: list[tuple[int, int, int]] = []  # (cid, dc table, ac table)
    entropy = None
    # any out-of-range read below is a truncated/corrupt stream;
    # surface it as the documented ValueError, never IndexError
    try:
        while i < len(data):
            if data[i] != 0xFF:
                raise ValueError(f"marker expected at {i}")
            marker = data[i + 1]
            i += 2
            if marker in (0xD8, 0xD9):
                continue
            (seglen,) = struct.unpack_from(">H", data, i)
            payload = data[i + 2 : i + seglen]
            i += seglen
            if marker == 0xDB:  # DQT (possibly several tables)
                p = 0
                while p < len(payload):
                    pq, tq = payload[p] >> 4, payload[p] & 0xF
                    if pq != 0:
                        raise ValueError("16-bit quant tables unsupported")
                    zz = np.frombuffer(
                        payload[p + 1 : p + 65], dtype=np.uint8
                    ).astype(np.int32)
                    flat = np.empty(64, dtype=np.int32)
                    flat[ZIGZAG] = zz
                    qts[tq] = flat.reshape(8, 8)
                    p += 65
            elif marker == 0xC0:  # SOF0 baseline
                if payload[0] != 8:
                    raise ValueError("only 8-bit precision")
                h, w = struct.unpack_from(">HH", payload, 1)
                nc = payload[5]
                for c in range(nc):
                    cid, samp, qid = payload[6 + 3 * c : 9 + 3 * c]
                    comps.append((cid, samp >> 4, samp & 0xF, qid))
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
                raise ValueError("only baseline SOF0 supported")
            elif marker == 0xC4:  # DHT (possibly several tables)
                p = 0
                while p < len(payload):
                    cls, tid = payload[p] >> 4, payload[p] & 0xF
                    bits = list(payload[p + 1 : p + 17])
                    nv = sum(bits)
                    vals = list(payload[p + 17 : p + 17 + nv])
                    huffs[(cls, tid)] = _decode_map(bits, vals)
                    p += 17 + nv
            elif marker == 0xDA:  # SOS — entropy data follows
                ns = payload[0]
                for c in range(ns):
                    cid = payload[1 + 2 * c]
                    sel = payload[2 + 2 * c]
                    scan_sel.append((cid, sel >> 4, sel & 0xF))
                # de-stuff up to the next marker (we emit no restarts)
                j = i
                chunks = bytearray()
                while j < len(data):
                    b = data[j]
                    if b == 0xFF:
                        if j + 1 >= len(data):
                            break  # trailing 0xFF on truncated input
                        nxt = data[j + 1]
                        if nxt == 0x00:
                            chunks.append(0xFF)
                            j += 2
                            continue
                        break
                    chunks.append(b)
                    j += 1
                entropy = bytes(chunks)
                i = j
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated JPEG header: {e}") from None
    if w is None or entropy is None:
        raise ValueError("truncated JPEG (missing SOF0 or scan)")
    if len(comps) != 3 or len(scan_sel) != 3:
        raise ValueError("expected 3 components")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    by_comp = {cid: (hi, vi, qid) for cid, hi, vi, qid in comps}

    bits = np.unpackbits(np.frombuffer(entropy, dtype=np.uint8)).tolist()
    nbits = len(bits)
    pos = 0

    def read_huff(table: dict[tuple[int, int], int]) -> int:
        nonlocal pos
        code = 0
        ln = 0
        while pos < nbits and ln <= 16:
            code = (code << 1) | bits[pos]
            pos += 1
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman stream")

    def read_bits(n: int) -> int:
        nonlocal pos
        if pos + n > nbits:
            raise ValueError("truncated JPEG entropy stream")
        v = 0
        for _ in range(n):
            v = (v << 1) | bits[pos]
            pos += 1
        return v

    # per-component zigzag block grids (by, bx, 64)
    grids: list[np.ndarray] = []
    for cid, dct, act in scan_sel:
        hi, vi, _ = by_comp[cid]
        grids.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.float64))
    prev_dc = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, dct, act) in enumerate(scan_sel):
                hi, vi, _ = by_comp[cid]
                dc_tbl = huffs[(0, dct)]
                ac_tbl = huffs[(1, act)]
                for v in range(vi):
                    for u in range(hi):
                        blk = grids[ci][my * vi + v, mx * hi + u]
                        s = read_huff(dc_tbl)
                        prev_dc[ci] += _extend(read_bits(s), s)
                        blk[0] = prev_dc[ci]
                        k = 1
                        while k <= 63:
                            sym = read_huff(ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(read_bits(size), size)
                            k += 1

    planes = []
    for ci, (cid, dct, act) in enumerate(scan_sel):
        hi, vi, qid = by_comp[cid]
        by, bx = mcuy * vi, mcux * hi
        q = qts[qid].astype(np.float64)
        flat = grids[ci].reshape(-1, 64)[:, UNZIGZAG]
        coefs = flat.reshape(-1, 8, 8) * q
        spatial = _idct_blocks(coefs) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # box-replicate subsampled planes back to full resolution
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:h, :w])
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
