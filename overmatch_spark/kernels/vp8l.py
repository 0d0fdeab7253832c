"""Real WebP *lossless* (VP8L) codec in pure numpy/stdlib — no
libwebp. Implements the public "WebP Lossless Bitstream Specification"
wire format: RIFF/WEBP/VP8L container, LSB-first bitstream, canonical
length-limited prefix codes (DEFLATE-style lengths, code bits emitted
MSB-first), the 19-symbol code-length code with 16/17/18 repeat
symbols, the simple-code (1-2 symbol) path, literal ARGB pixels coded
green-red-blue-alpha, and LZ77 back-references with the prefix+extra-
bits length/distance scheme.

Encoder subset (always spec-legal output): no transforms, no color
cache, one meta-prefix group, literals + optional run-length back-
references using RAW distances (dist_value = distance + 120, which
any conformant decoder accepts; the 120 two-dimensional plane codes
are a pure size optimization the encoder never needs to emit).
Decoder subset: rejects transforms / color cache / meta groups /
plane-code distances with NotImplementedError — exactly the features
the encoder never writes; everything the encoder CAN write decodes,
including simple codes, full code-length-coded trees, the optional
max_symbol form, and raw-distance back-references.

Reference parity anchor: the reference pipeline treats webp as an
opaque decoded-pixel payload (images are data, not geometry); this
codec exists so fmt='webp' rows carry REAL bytes through the
multimodal operators instead of a stub.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# order in which code-length-code lengths are stored (spec constant)
CODE_LENGTH_CODE_ORDER = [
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15
]
GREEN_ALPHABET = 256 + 24  # literals + length codes (no color cache)
DIST_ALPHABET = 40
MAX_CODE_DEPTH = 15
MAX_LENGTH_CODE_DEPTH = 7  # code-length code lengths live in 3-bit fields


class BitWriter:
    """LSB-first-within-byte bitstream (VP8LPutBits convention)."""

    def __init__(self) -> None:
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, val: int, n: int) -> None:
        """Raw field: n bits, LSB first."""
        self.acc |= (int(val) & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, depth: int) -> None:
        """Prefix-code bits, MSB of the canonical code first (the
        stream order a tree-walking decoder consumes)."""
        for i in range(depth - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def put_codes_vec(self, codes: np.ndarray, depths: np.ndarray) -> None:
        """Vectorized put_code over parallel symbol arrays (the pixel
        hot path): expand every code into its MSB-first bit sequence
        and append in one packbits pass."""
        depths = depths.astype(np.int64)
        total = int(depths.sum())
        if total == 0:
            return
        starts = np.zeros(len(depths), dtype=np.int64)
        np.cumsum(depths[:-1], out=starts[1:])
        pos = np.arange(total, dtype=np.int64)
        within = pos - np.repeat(starts, depths)
        shift = np.repeat(depths, depths) - 1 - within
        bits = (np.repeat(codes.astype(np.int64), depths) >> shift) & 1
        # drain through the scalar accumulator so alignment with any
        # preceding partial byte is preserved
        head = (-self.n) % 8
        if head:
            head = min(head, total)
            for b in bits[:head]:
                self.put(int(b), 1)
            bits = bits[head:]
        if len(bits) == 0:
            return
        tail = len(bits) % 8
        body = bits[: len(bits) - tail]
        if len(body):
            self.out += np.packbits(
                body.astype(np.uint8), bitorder="little"
            ).tobytes()
        for b in bits[len(bits) - tail:]:
            self.put(int(b), 1)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


class BitReader:
    def __init__(self, buf: bytes) -> None:
        # pre-unpack to one bit per element (LSB-first within bytes),
        # padded so table-decode peeks never run off the end
        self.bits = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8), bitorder="little"
        ).astype(np.int64)
        self.nbits = len(self.bits)
        self.bits = np.concatenate(
            [self.bits, np.zeros(MAX_CODE_DEPTH, dtype=np.int64)]
        )
        # rolling MSB-first 15-bit peek per position: one indexed read
        # resolves any prefix code (the flat-table decode hot path)
        win = np.lib.stride_tricks.sliding_window_view(
            self.bits, MAX_CODE_DEPTH
        )
        self.peek15 = win @ (
            1 << np.arange(MAX_CODE_DEPTH - 1, -1, -1, dtype=np.int64)
        )
        self.pos = 0  # bit position

    def get(self, n: int) -> int:
        """Raw field: n bits, LSB first."""
        v = 0
        for i in range(n):
            v |= int(self.bits[self.pos]) << i
            self.pos += 1
        return v

    def get_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b


# ---------------------------------------------------------------------------
# canonical length-limited prefix codes
# ---------------------------------------------------------------------------

def huffman_lengths(freq: np.ndarray, max_depth: int) -> np.ndarray:
    """Huffman code lengths, depth-limited by frequency halving (the
    classic retry scheme: if the tree is too deep, flatten the
    distribution and rebuild — converges to a balanced tree)."""
    freq = freq.astype(np.int64).copy()
    n = len(freq)
    used = np.nonzero(freq)[0]
    if len(used) > (1 << max_depth):
        raise ValueError(
            f"{len(used)} symbols cannot fit a depth-{max_depth} code"
        )
    lengths = np.zeros(n, dtype=np.int64)
    if len(used) == 0:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    while True:
        heap = [(int(freq[s]), int(s), (int(s),)) for s in used]
        heapq.heapify(heap)
        depth = {int(s): 0 for s in used}
        while len(heap) > 1:
            fa, ta, la = heapq.heappop(heap)
            fb, tb, lb = heapq.heappop(heap)
            for s in la + lb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, min(ta, tb), la + lb))
        if max(depth.values()) <= max_depth:
            for s, d in depth.items():
                lengths[s] = d
            return lengths
        freq[used] = (freq[used] + 1) >> 1  # flatten and retry


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """RFC1951 canonical code assignment from lengths."""
    codes = np.zeros(len(lengths), dtype=np.int64)
    max_len = int(lengths.max()) if len(lengths) else 0
    code = 0
    for d in range(1, max_len + 1):
        for s in np.nonzero(lengths == d)[0]:
            codes[s] = code
            code += 1
        code <<= 1
    return codes


class _Tree:
    """Decode-side canonical prefix table: peek max-depth stream bits
    (MSB-of-code-first order) and resolve (symbol, consumed) in one
    lookup — the flat-table analogue of libwebp's Huffman tables."""

    __slots__ = ("zero_bit_symbol", "max_d", "sym", "used_bits")

    def __init__(self, lengths: np.ndarray) -> None:
        used = np.nonzero(lengths)[0]
        self.zero_bit_symbol = None
        if len(used) == 0:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            # degenerate: one symbol, zero bits per occurrence
            self.zero_bit_symbol = int(used[0])
            return
        codes = canonical_codes(lengths)
        max_d = int(lengths[used].max())
        self.max_d = max_d
        self.sym = np.full(1 << max_d, -1, dtype=np.int64)
        self.used_bits = np.zeros(1 << max_d, dtype=np.int64)
        for s in used:
            d = int(lengths[s])
            c = int(codes[s])
            lo = c << (max_d - d)
            hi = lo + (1 << (max_d - d))
            self.sym[lo:hi] = int(s)
            self.used_bits[lo:hi] = d

    def read(self, br: BitReader) -> int:
        if self.zero_bit_symbol is not None:
            return self.zero_bit_symbol
        idx = int(br.peek15[br.pos]) >> (MAX_CODE_DEPTH - self.max_d)
        s = int(self.sym[idx])
        if s < 0:
            raise ValueError("invalid prefix code in stream")
        br.pos += int(self.used_bits[idx])
        return s


# ---------------------------------------------------------------------------
# prefix-code (tree) serialization
# ---------------------------------------------------------------------------

def _write_simple_code(bw: BitWriter, symbols: list[int]) -> None:
    bw.put(1, 1)  # simple
    bw.put(len(symbols) - 1, 1)
    if symbols[0] < 2:
        bw.put(0, 1)  # first symbol in 1 bit
        bw.put(symbols[0], 1)
    else:
        bw.put(1, 1)  # first symbol in 8 bits
        bw.put(symbols[0], 8)
    if len(symbols) == 2:
        bw.put(symbols[1], 8)


def _rle_code_lengths(lengths: np.ndarray):
    """Spec RLE over the lengths array: (symbol, extra_value|None)
    pairs using 16 (repeat prev non-zero, 3-6), 17 (3-10 zeros),
    18 (11-138 zeros)."""
    out = []
    i, n = 0, len(lengths)
    prev_nz = 8  # decoder's initial "previous non-zero length"
    while i < n:
        v = int(lengths[i])
        run = 1
        while i + run < n and int(lengths[i + run]) == v:
            run += 1
        if v == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                out.append((18, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 10)
                out.append((17, take - 3))
                left -= take
            out.extend((0, None) for _ in range(left))
        else:
            out.append((v, None))
            left = run - 1
            if v == prev_nz:
                left = run  # every copy can be a repeat
                out.pop()
            while left >= 3:
                take = min(left, 6)
                out.append((16, take - 3))
                left -= take
            out.extend((v, None) for _ in range(left))
            prev_nz = v
        i += run
    return out


_EXTRA_BITS = {16: 2, 17: 3, 18: 7}


def _write_full_code(bw: BitWriter, lengths: np.ndarray) -> None:
    """Non-simple path: code-length-code header + RLE'd lengths."""
    rle = _rle_code_lengths(lengths)
    clc_freq = np.zeros(19, dtype=np.int64)
    for sym, _ in rle:
        clc_freq[sym] += 1
    clc_len = huffman_lengths(clc_freq, MAX_LENGTH_CODE_DEPTH)
    if np.count_nonzero(clc_len) == 1:
        # pad to a 2-symbol tree so each token costs exactly 1 bit
        # (a degenerate 1-symbol code-length code decodes fine, but
        # the padded form keeps the token loop uniform)
        only = int(np.nonzero(clc_len)[0][0])
        pad = 0 if only != 0 else 1
        clc_len[only] = 1
        clc_len[pad] = 1
    clc_codes = canonical_codes(clc_len)
    order_pos = {s: i for i, s in enumerate(CODE_LENGTH_CODE_ORDER)}
    num_codes = max(
        4, 1 + max(order_pos[s] for s in np.nonzero(clc_len)[0])
    ) if np.count_nonzero(clc_len) else 4
    bw.put(0, 1)  # not simple
    bw.put(num_codes - 4, 4)
    for i in range(num_codes):
        bw.put(int(clc_len[CODE_LENGTH_CODE_ORDER[i]]), 3)
    bw.put(0, 1)  # no max_symbol shortcut: code all positions
    for sym, extra in rle:
        bw.put_code(int(clc_codes[sym]), int(clc_len[sym]))
        if extra is not None:
            bw.put(extra, _EXTRA_BITS[sym])


def _write_code(bw: BitWriter, lengths: np.ndarray) -> None:
    used = np.nonzero(lengths)[0]
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used):
        _write_simple_code(bw, [int(s) for s in used])
    else:
        _write_full_code(bw, lengths)


def _read_code(br: BitReader, alphabet_size: int) -> _Tree:
    lengths = np.zeros(alphabet_size, dtype=np.int64)
    if br.get_bit():  # simple
        num_symbols = br.get(1) + 1
        if br.get_bit():
            s0 = br.get(8)
        else:
            s0 = br.get(1)
        lengths[s0] = 1
        if num_symbols == 2:
            lengths[br.get(8)] = 1
        return _Tree(lengths)
    num_codes = br.get(4) + 4
    clc_len = np.zeros(19, dtype=np.int64)
    for i in range(num_codes):
        clc_len[CODE_LENGTH_CODE_ORDER[i]] = br.get(3)
    clc_tree = _Tree(clc_len)
    if br.get_bit():  # max_symbol shortcut
        length_nbits = 2 + 2 * br.get(3)
        max_symbol = 2 + br.get(length_nbits)
    else:
        max_symbol = alphabet_size
    prev_nz = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = clc_tree.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_nz = sym
        elif sym == 16:
            rep = 3 + br.get(2)
            lengths[i:i + rep] = prev_nz
            i += rep
        elif sym == 17:
            i += 3 + br.get(3)
        else:  # 18
            i += 11 + br.get(7)
    return _Tree(lengths)


# ---------------------------------------------------------------------------
# LZ77 length/distance prefix+extra-bits scheme
# ---------------------------------------------------------------------------

def _lz77_encode_value(v: int) -> tuple[int, int, int]:
    """value (>=1) -> (prefix_code, extra_bits_count, extra_value);
    exact inverse of the spec's prefix+extra decode below."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    high = x.bit_length() - 1  # 2^high <= x < 2^(high+1)
    second = (x >> (high - 1)) & 1
    prefix = (high << 1) | second
    return prefix, high - 1, x & ((1 << (high - 1)) - 1)


def _lz77_decode_value(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.get(extra) + 1


# ---------------------------------------------------------------------------
# public codec
# ---------------------------------------------------------------------------

def vp8l_encode_rgb(px: np.ndarray, rle: bool = True) -> bytes:
    """RGB uint8 (h, w, 3) -> lossless .webp bytes. ``rle`` enables
    run-length back-references (distance 1, raw-coded) for repeated
    pixels; literals otherwise."""
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("vp8l_encode_rgb expects uint8 (h, w, 3)")
    h, w = px.shape[:2]
    # hard VP8L format bound: 14-bit dims; a wrapped width would emit
    # a structurally valid but corrupt bitstream, so refuse loudly
    # (ValueError, not assert — survives python -O)
    if not (1 <= w <= (1 << 14) and 1 <= h <= (1 << 14)):
        raise ValueError(f"VP8L dims out of range (1..16384): {w}x{h}")
    flat = px.reshape(-1, 3).astype(np.int64)
    n = len(flat)

    # tokenize: literal pixels + (length, dist=1) runs of the previous
    # pixel. Token stream: list of ("lit", index) / ("run", length)
    tokens: list[tuple[str, int]] = []
    if rle and n:
        same = np.zeros(n, dtype=bool)
        same[1:] = (flat[1:] == flat[:-1]).all(axis=1)
        i = 0
        while i < n:
            if same[i]:
                j = i
                while j < n and same[j]:
                    j += 1
                run = j - i
                while run >= 3:
                    take = min(run, 4096)
                    tokens.append(("run", take))
                    run -= take
                for k in range(run):
                    tokens.append(("lit", j - run + k))
                i = j
            else:
                tokens.append(("lit", i))
                i += 1
    else:
        tokens = [("lit", i) for i in range(n)]

    lit_idx = np.array([t[1] for t in tokens if t[0] == "lit"], dtype=np.int64)
    g_freq = np.zeros(GREEN_ALPHABET, dtype=np.int64)
    if len(lit_idx):
        np.add.at(g_freq, flat[lit_idx, 1], 1)
    r_freq = np.bincount(flat[lit_idx, 0], minlength=256) if len(lit_idx) \
        else np.zeros(256, dtype=np.int64)
    b_freq = np.bincount(flat[lit_idx, 2], minlength=256) if len(lit_idx) \
        else np.zeros(256, dtype=np.int64)
    dist_freq = np.zeros(DIST_ALPHABET, dtype=np.int64)
    for kind, v in tokens:
        if kind == "run":
            code, _, _ = _lz77_encode_value(v)
            g_freq[256 + code] += 1
            dcode, _, _ = _lz77_encode_value(1 + 120)  # raw distance 1
            dist_freq[dcode] += 1
    if not g_freq.any():
        g_freq[0] = 1  # empty image guard (n == 0 cannot happen; w,h >= 1)

    g_len = huffman_lengths(g_freq, MAX_CODE_DEPTH)
    r_len = huffman_lengths(r_freq, MAX_CODE_DEPTH)
    b_len = huffman_lengths(b_freq, MAX_CODE_DEPTH)
    a_len = np.zeros(256, dtype=np.int64)
    a_len[255] = 1  # constant alpha: simple 1-symbol code, 0 bits/pixel
    d_len = huffman_lengths(dist_freq, MAX_CODE_DEPTH) \
        if dist_freq.any() else None

    def emit_depths(lengths: np.ndarray) -> np.ndarray:
        # a 1-symbol prefix code costs ZERO bits per occurrence (the
        # decoder returns the symbol without reading) — the stored
        # length-1 is only the tree declaration, not the emission cost
        if np.count_nonzero(lengths) == 1:
            return np.zeros_like(lengths)
        return lengths

    g_emit = emit_depths(g_len)
    r_emit = emit_depths(r_len)
    b_emit = emit_depths(b_len)
    d_emit = emit_depths(d_len) if d_len is not None else None
    g_codes = canonical_codes(g_len)
    r_codes = canonical_codes(r_len)
    b_codes = canonical_codes(b_len)
    d_codes = canonical_codes(d_len) if d_len is not None else None

    bw = BitWriter()
    bw.put(0x2F, 8)  # VP8L signature
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha_is_used hint: no
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta prefix group
    _write_code(bw, g_len)
    _write_code(bw, r_len)
    _write_code(bw, b_len)
    _write_code(bw, a_len)
    if d_len is not None:
        _write_code(bw, d_len)
    else:
        _write_simple_code(bw, [0])  # unused distance tree

    # pixel stream. Fast path (no runs): one vectorized emission of the
    # interleaved G,R,B code streams (alpha codes are 0 bits).
    if not any(k == "run" for k, _ in tokens):
        codes = np.stack(
            [g_codes[flat[:, 1]], r_codes[flat[:, 0]], b_codes[flat[:, 2]]],
            axis=1,
        ).reshape(-1)
        depths = np.stack(
            [g_emit[flat[:, 1]], r_emit[flat[:, 0]], b_emit[flat[:, 2]]],
            axis=1,
        ).reshape(-1)
        bw.put_codes_vec(codes, depths)
    else:
        for kind, v in tokens:
            if kind == "lit":
                rr, gg, bb = flat[v]
                bw.put_code(int(g_codes[gg]), int(g_emit[gg]))
                bw.put_code(int(r_codes[rr]), int(r_emit[rr]))
                bw.put_code(int(b_codes[bb]), int(b_emit[bb]))
            else:
                code, nbits, extra = _lz77_encode_value(v)
                bw.put_code(int(g_codes[256 + code]), int(g_emit[256 + code]))
                bw.put(extra, nbits)
                dcode, dn, dex = _lz77_encode_value(121)
                bw.put_code(int(d_codes[dcode]), int(d_emit[dcode]))
                bw.put(dex, dn)

    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def vp8l_decode_rgb(buf: bytes) -> np.ndarray:
    """Lossless .webp bytes -> RGB uint8 (h, w, 3). Supports the
    encoder's subset (see module docstring); raises
    NotImplementedError on transforms / color cache / meta groups /
    plane-code distances."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    # walk chunks to the VP8L payload
    pos = 12
    payload = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        if tag == b"VP8L":
            payload = buf[pos + 8:pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if payload is None:
        raise NotImplementedError("no VP8L chunk (lossy VP8 not supported)")
    br = BitReader(payload)
    if br.get(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.get(14) + 1
    h = br.get(14) + 1
    br.get(1)  # alpha hint
    if br.get(3) != 0:
        raise ValueError("unknown VP8L version")
    if br.get_bit():
        raise NotImplementedError("VP8L transforms not supported")
    if br.get_bit():
        raise NotImplementedError("VP8L color cache not supported")
    if br.get_bit():
        raise NotImplementedError("VP8L meta prefix groups not supported")
    g_tree = _read_code(br, GREEN_ALPHABET)
    r_tree = _read_code(br, 256)
    b_tree = _read_code(br, 256)
    a_tree = _read_code(br, 256)
    d_tree = _read_code(br, DIST_ALPHABET)

    n = w * h
    out = np.zeros((n, 3), dtype=np.uint8)
    i = 0
    while i < n:
        s = g_tree.read(br)
        if s < 256:
            g = s
            r = r_tree.read(br)
            b = b_tree.read(br)
            a_tree.read(br)  # alpha (0-bit tree in our encoder subset)
            out[i] = (r, g, b)
            i += 1
        else:
            length = _lz77_decode_value(s - 256, br)
            dist_value = _lz77_decode_value(d_tree.read(br), br)
            if dist_value <= 120:
                raise NotImplementedError(
                    "VP8L plane-code distances not supported"
                )
            dist = dist_value - 120
            if dist > i:
                raise ValueError("back-reference before image start")
            for _ in range(length):
                out[i] = out[i - dist]
                i += 1
                if i >= n:
                    break
    return out.reshape(h, w, 3)
