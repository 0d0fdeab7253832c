"""Property tests (hypothesis) over the VP8L lossless WebP codec —
pure numpy, no Spark session needed. Mirrors the JPEG/PMTiles wire-
format suites: exact roundtrip at arbitrary dims/content, container
structure, prefix-code invariants (Kraft equality, prefix-freeness,
depth limits), tree serialization roundtrip, and the LZ77
prefix+extra-bits value scheme."""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from overmatch_spark.kernels import vp8l as V
from overmatch_spark.kernels.vp8l import (
    BitReader,
    BitWriter,
    _lz77_decode_value,
    _lz77_encode_value,
    _read_code,
    _write_code,
    canonical_codes,
    huffman_lengths,
    vp8l_decode_rgb,
    vp8l_encode_rgb,
)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    mode=st.sampled_from(["noise", "palette", "runs", "const"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    rle=st.booleans(),
)
def test_roundtrip_exact(w, h, mode, seed, rle):
    rng = np.random.Generator(np.random.PCG64(seed))
    if mode == "noise":
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    elif mode == "palette":
        pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
        px = pal[rng.integers(0, 4, size=(h, w))]
    elif mode == "runs":
        px = np.repeat(
            rng.integers(0, 256, size=(h, 1, 3), dtype=np.uint8), w, axis=1
        )
    else:
        px = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
    buf = vp8l_encode_rgb(px, rle=rle)
    dec = vp8l_decode_rgb(buf)
    assert dec.dtype == np.uint8 and np.array_equal(dec, px)


def test_container_structure():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    buf = vp8l_encode_rgb(px)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
    assert struct.unpack("<I", buf[4:8])[0] == len(buf) - 8
    assert buf[12:16] == b"VP8L"
    payload_len = struct.unpack("<I", buf[16:20])[0]
    assert len(buf) == 20 + payload_len + (payload_len & 1)  # pad to even
    assert buf[20] == 0x2F  # VP8L signature byte
    # 14-bit width-1 / height-1 straddle the next bytes (LSB-first)
    br = BitReader(buf[20:])
    assert br.get(8) == 0x2F
    assert br.get(14) + 1 == 4 and br.get(14) + 1 == 4
    br.get(1)
    assert br.get(3) == 0  # version


@given(st.integers(min_value=1, max_value=4096))
def test_lz77_value_scheme_roundtrip(v):
    code, nbits, extra = _lz77_encode_value(v)
    assert 0 <= code < 24 and 0 <= extra < (1 << max(nbits, 1))
    bw = BitWriter()
    bw.put(extra, nbits)
    bw.put(0, 16)  # padding
    assert _lz77_decode_value(code, BitReader(bw.done())) == v


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=280),
    skew=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    max_depth=st.sampled_from([7, 15]),
)
def test_prefix_code_invariants(n, skew, seed, max_depth):
    rng = np.random.Generator(np.random.PCG64(seed))
    freq = rng.integers(0, 100, size=n).astype(np.int64) ** (skew + 1)
    if not freq.any():
        freq[0] = freq[min(1, n - 1)] = 1
    if np.count_nonzero(freq) > (1 << max_depth):
        # infeasible depth limit (guarded by a ValueError in the
        # kernel; production only uses depth 7 for the 19-symbol
        # code-length alphabet) — clamp the support instead
        keep = np.nonzero(freq)[0][: 1 << max_depth]
        mask = np.zeros(n, dtype=bool)
        mask[keep] = True
        freq[~mask] = 0
    lengths = huffman_lengths(freq, max_depth)
    used = np.nonzero(lengths)[0]
    assert set(np.nonzero(freq)[0]) == set(used)
    assert lengths.max() <= max_depth
    if len(used) >= 2:
        # Kraft equality (complete code) and prefix-freeness
        assert sum(2.0 ** -lengths[s] for s in used) == 1.0
        codes = canonical_codes(lengths)
        seen = set()
        for s in used:
            bits = format(codes[s], f"0{lengths[s]}b")
            for p in seen:
                assert not (bits.startswith(p) or p.startswith(bits))
            seen.add(bits)


@settings(max_examples=30, deadline=None)
@given(
    alphabet=st.sampled_from([256, 280, 40]),
    n_used=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_tree_serialization_roundtrip(alphabet, n_used, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    symbols = rng.choice(alphabet, size=min(n_used, alphabet), replace=False)
    freq = np.zeros(alphabet, dtype=np.int64)
    freq[symbols] = rng.integers(1, 1000, size=len(symbols))
    lengths = huffman_lengths(freq, V.MAX_CODE_DEPTH)
    bw = BitWriter()
    _write_code(bw, lengths)
    bw.put(0, 16)  # padding
    tree = _read_code(BitReader(bw.done()), alphabet)
    if tree.zero_bit_symbol is not None:
        assert len(symbols) == 1 and tree.zero_bit_symbol == symbols[0]
    else:
        # recover each symbol's depth from the flat decode table
        got = np.zeros(alphabet, dtype=np.int64)
        for idx in range(len(tree.sym)):
            s = tree.sym[idx]
            if s >= 0:
                got[s] = tree.used_bits[idx]
        assert np.array_equal(got, lengths)


def test_compression_on_runs_and_const():
    const = np.full((32, 32, 3), 7, dtype=np.uint8)
    buf = vp8l_encode_rgb(const)
    assert len(buf) < 64  # 3072 raw bytes -> tens of bytes
    rng = np.random.Generator(np.random.PCG64(3))
    noise = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert len(vp8l_encode_rgb(noise)) > len(buf)
    # rle=False must still roundtrip the constant image (literal-only)
    assert np.array_equal(
        vp8l_decode_rgb(vp8l_encode_rgb(const, rle=False)), const
    )


def test_rejects_non_webp():
    import pytest

    with pytest.raises(ValueError):
        vp8l_decode_rgb(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        # RIFF/WEBP container without a VP8L chunk (e.g. lossy VP8)
        fake = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " \
            + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        vp8l_decode_rgb(fake)


def test_images_dispatch_lossless():
    from overmatch_spark.images import decode, encode, gen_pixels, psnr_db

    px = gen_pixels("img/000000000099", 32, 24)
    buf = encode(px, "webp")
    dec = decode(buf, 32, 24, "webp")
    assert np.array_equal(dec, px)  # lossless: exact, PSNR infinite
    assert psnr_db(px, dec) == float("inf")
