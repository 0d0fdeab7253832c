"""Baseline JPEG (JFIF) encode/decode — pure numpy + stdlib.

This is NOT a stubbed codec: baseline sequential JPEG needs only an
8x8 DCT, scalar quantization, and canonical Huffman coding — all
implementable exactly from the public spec (ITU-T T.81 / ISO 10918-1)
with numpy. The tables below are the spec's Annex K examples (the
ones every camera and libjpeg build ships); quality scaling uses the
standard IJG formula.

Scope (what our encoder emits, and what the decoder accepts):
  - baseline DCT, 8-bit, 3 components (YCbCr per JFIF/BT.601)
  - no chroma subsampling (1x1 sampling on all components) — chosen
    for quality: the fixture corpus is seeded noise, the worst case
    for any DCT codec, and the sink invariant is PSNR >= 40 dB
  - no restart intervals, no progressive, no arithmetic coding
The decoder parses real markers (APPn/COM skipped; DQT/SOF0/DHT/SOS
honored, tables taken from the stream, not assumed) — so it decodes
any single-scan baseline 1x1-sampled JPEG, not just its own output.

Non-multiple-of-8 dimensions: encoder pads by edge replication (the
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


def _pad_edge(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    return ch


def _to_blocks(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    return (
        ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def jpeg_encode_rgb(px: np.ndarray, quality: int = 98) -> bytes:
    """Baseline JFIF bytes for an (h, w, 3) uint8 array.

    quality follows the IJG 1..100 convention. Default 98: the sink
    invariant is PSNR >= 40 dB and the fixture corpus is seeded
    NOISE — the adversarial worst case for a DCT codec (no energy
    compaction), so the default sits where even noise survives; on
    natural/smooth content the same setting is visually lossless.
    """
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) uint8 array")
    h, w = px.shape[:2]
    qt = [scaled_qt(QT_LUMA, quality), scaled_qt(QT_CHROMA, quality)]
    ycc = rgb_to_ycbcr(px)

    # vectorized DCT + quantization per component
    comp_zz: list[np.ndarray] = []
    for ci in range(3):
        ch = _pad_edge(ycc[..., ci]) - 128.0
        coefs = _dct_blocks(_to_blocks(ch))
        q = qt[0 if ci == 0 else 1].reshape(8, 8).astype(np.float64)
        quant = np.round(coefs / q).astype(np.int64)
        # clamp to the Annex-K Huffman size ceilings (11 DC / 10 AC)
        quant = np.clip(quant, -2047, 2047)
        zz = quant.reshape(-1, 64)[:, ZIGZAG]
        zz[:, 1:] = np.clip(zz[:, 1:], -1023, 1023)
        comp_zz.append(zz)

    dc_codes = [
        build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = [
        build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    bw = _BitWriter()
    n_mcu = comp_zz[0].shape[0]
    prev_dc = [0, 0, 0]
    for m in range(n_mcu):
        for ci in range(3):
            t = 0 if ci == 0 else 1
            blk = comp_zz[ci][m]
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
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, qid])  # 1x1 sampling
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
    """Decode single-scan baseline 1x1-sampled JFIF bytes -> (h, w, 3)
    uint8. Tables are read from the stream (DQT/DHT), not assumed."""
    data = bytes(buf)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_sel: list[tuple[int, int, int]] = []  # (cid, dc table, ac table)
    entropy = None
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
                if samp != 0x11:
                    raise ValueError("only 1x1 sampling supported")
                comps.append((cid, qid))
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
    if w is None or entropy is None:
        raise ValueError("truncated JPEG (missing SOF0 or scan)")
    if len(comps) != 3 or len(scan_sel) != 3:
        raise ValueError("expected 3 components")

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
        v = 0
        for _ in range(n):
            v = (v << 1) | bits[pos]
            pos += 1
        return v

    nbx, nby = -(-w // 8), -(-h // 8)
    n_mcu = nbx * nby
    comp_blocks = [
        np.zeros((n_mcu, 64), dtype=np.float64) for _ in range(3)
    ]
    prev_dc = [0, 0, 0]
    qid_by_cid = dict(comps)
    for m in range(n_mcu):
        for ci, (cid, dct, act) in enumerate(scan_sel):
            dc_tbl = huffs[(0, dct)]
            ac_tbl = huffs[(1, act)]
            s = read_huff(dc_tbl)
            diff = _extend(read_bits(s), s)
            prev_dc[ci] += diff
            blk = comp_blocks[ci][m]
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
        q = qts[qid_by_cid[cid]].astype(np.float64)
        zz = comp_blocks[ci]
        flat = zz[:, UNZIGZAG]  # zigzag order -> natural flat order
        coefs = flat.reshape(-1, 8, 8) * q
        spatial = _idct_blocks(coefs) + 128.0
        plane = (
            spatial.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        planes.append(plane[:h, :w])
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
