"""Vectorized text-similarity kernels.

The centerpiece is the indel (insert/delete-only edit) similarity that
reproduces rapidfuzz ``fuzz.ratio`` — the reference's name-similarity
join condition ``fuzz.ratio(a, b)/100 >= 0.6``
(/root/reference/scripts/match.py:242-244). rapidfuzz defines

    fuzz.ratio(a, b) = 100 * (1 - indel_distance / (|a| + |b|))
                     = 100 * 2*LCS(a, b) / (|a| + |b|)

with no preprocessing (case-sensitive). We compute
``sim = 2*LCS/(|a|+|b|)`` directly as a float64 (equal to
``fuzz.ratio/100`` up to one ulp; the executable spec uses this same
kernel so engine == spec is exact).

Implementation: Hyyrö's bit-parallel LCS, vectorized ACROSS PAIRS with
numpy uint64 arrays — the per-character loop runs over string
*positions* (≤ 64 iterations), while every numpy op covers the whole
Arrow batch. Zero per-row Python for strings ≤ 64 chars; longer
strings fall back to a banded DP (rare: names/captions are short).
"""

from __future__ import annotations

import numpy as np

_ONE = np.uint64(1)
_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _encode(strs, maxlen: int, pad: int) -> np.ndarray:
    """Encode a list of strings to an (n, maxlen) uint32 codepoint
    matrix padded with `pad` (pads differ per side so padding never
    matches). Vectorized via numpy's UCS4 representation."""
    arr = np.asarray(
        ["" if s is None else s[:maxlen] for s in strs], dtype=f"U{maxlen}"
    )
    out = arr.view(np.uint32).reshape(len(strs), maxlen).copy()
    out[out == 0] = np.uint32(pad)
    return out


def lcs_len_batch(a_list, b_list) -> np.ndarray:
    """LCS length for each aligned pair. Pure numpy across pairs.

    Equal pairs short-circuit (LCS(a,a) = |a|) — in conflation
    workloads the majority of surviving candidates carry the exact
    same name on both sides, so this skips the bit-parallel sweep for
    most of the batch."""
    n = len(a_list)
    la = np.array([len(s) if s else 0 for s in a_list], dtype=np.int64)
    lb = np.array([len(s) if s else 0 for s in b_list], dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)

    a_arr = np.asarray([s or "" for s in a_list], dtype=object)
    b_arr = np.asarray([s or "" for s in b_list], dtype=object)
    eq = a_arr == b_arr
    out[eq] = la[eq]

    fast = ~eq & (la <= 64) & (lb <= 256)
    idx_fast = np.nonzero(fast)[0]
    if idx_fast.size:
        out[idx_fast] = _lcs_bitparallel(
            [a_list[i] for i in idx_fast], [b_list[i] for i in idx_fast]
        )
    idx_slow = np.nonzero(~eq & ~fast)[0]
    for i in idx_slow:
        out[i] = _lcs_dp(a_list[i] or "", b_list[i] or "")
    return out


def _lcs_bitparallel(a_list, b_list) -> np.ndarray:
    """Hyyrö bit-parallel LCS, vectorized over pairs.

    For each pair, pattern a (≤64 chars) has match masks; we sweep the
    text b column-by-column. The match mask for text char b[:, j] is
    built on the fly: bit k set iff a[:, k] == b[:, j] — an O(64)
    numpy comparison per column, each op covering all pairs.
    """
    n = len(a_list)
    ma = max((len(s) for s in a_list if s), default=0)
    mb = max((len(s) for s in b_list if s), default=0)
    if ma == 0 or mb == 0 or n == 0:
        return np.zeros(n, dtype=np.int64)
    ma = min(ma, 64)
    A = _encode(a_list, ma, pad=0xFFFFFFFF)  # pads can't collide
    B = _encode(b_list, mb, pad=0xFFFFFFFE)

    V = np.full(n, _FULL, dtype=np.uint64)
    la = np.array([min(len(s) if s else 0, 64) for s in a_list], dtype=np.uint64)
    # mask of valid pattern bits per pair
    mask = np.where(
        la >= np.uint64(64),
        _FULL,
        (_ONE << np.minimum(la, np.uint64(63))) - _ONE,
    ).astype(np.uint64)

    # Per text column j, build the match mask M (bit k set iff
    # a[k] == b[j]) via packbits — O(n * ma / 8) bytes per column.
    eq_pad = np.zeros((n, 64), dtype=bool)
    for j in range(mb):
        eq_pad[:, :ma] = A == B[:, j : j + 1]
        M = np.packbits(eq_pad, axis=1, bitorder="little").view(np.uint64)[:, 0]
        U = V & M
        V = (V + U) | (V - U)
    # zero bits of V within the pattern mask = LCS length
    matched = (~V) & mask
    return _popcount64(matched)


def _popcount64(x: np.ndarray) -> np.ndarray:
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(8):
        byte = ((x >> np.uint64(shift * 8)) & np.uint64(0xFF)).astype(np.uint8)
        cnt += np.unpackbits(byte[:, None], axis=1).sum(axis=1).astype(np.int64)
    return cnt


def _lcs_dp(a: str, b: str) -> int:
    """Classic O(|a|*|b|) DP fallback (long strings only)."""
    if not a or not b:
        return 0
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    barr = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    for ca in a:
        cur = prev.copy()
        eq = barr == np.uint32(ord(ca))
        # cur[j+1] = max(prev[j] + eq[j], prev[j+1], cur[j]) — the
        # cur[j] dependency is sequential; keep it simple and correct.
        for j in range(len(b)):
            cur[j + 1] = max(prev[j] + (1 if eq[j] else 0), prev[j + 1], cur[j])
        prev = cur
    return int(prev[-1])


def indel_similarity(a_list, b_list) -> np.ndarray:
    """``2*LCS/(|a|+|b|)`` per pair — rapidfuzz fuzz.ratio / 100
    (reference F19). Both empty -> 1.0 (rapidfuzz returns 100)."""
    la = np.array([len(s) if s else 0 for s in a_list], dtype=np.float64)
    lb = np.array([len(s) if s else 0 for s in b_list], dtype=np.float64)
    lcs = lcs_len_batch(a_list, b_list).astype(np.float64)
    denom = la + lb
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = np.where(denom > 0, 2.0 * lcs / denom, 1.0)
    return sim
