"""Real content-based perceptual hash (classic pHash) — pure numpy.

The fixture `images.phash` column is an id-seeded 64-bit hash (it
doubles as the geometry seed, FIXTURES.md §1). This kernel is the
REAL thing computed from pixel content, so near-duplicate detection
works on what the image looks like, not on its identity: the classic
pHash recipe (grayscale -> 32x32 box/bilinear resize -> 2D DCT ->
low-frequency 8x8 block -> median threshold -> 64 bits).

Properties (tested):
  - re-encoding the same pixels (jpeg/qlossy/png/raw) moves the hash
    by only a few bits (low-frequency DCT terms are stable under
    quantization noise),
  - global brightness shifts are a no-op BY CONSTRUCTION (the DC
    row/column is excluded from the 64-bit block, and a uniform
    shift only moves the DC term),
  - unrelated images land ~32 bits apart (independent coin flips).

Hash-version note (r5): the bit convention changed in round 5 — the
DC row/column is now skipped and the median is taken over all 64 AC
coefficients. phash_dct values persisted by earlier pipeline runs
(checkpoints, stored dedup tables) are NOT comparable with newly
computed hashes; recompute or version the column when mixing eras.
No in-tree artifact stores the old hashes.

Pairs with operators/multimodal.phash_near_dups (exact hamming <= k
retrieval via pigeonhole blocking): compute the hash scan-side with
compute_phash, then only (block, 8-byte sig, id) rides the shuffle.
"""

from __future__ import annotations

import numpy as np

_N = 32  # resize target; low-freq block is 8x8 -> 64 bits


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix of size n."""
    t = np.zeros((n, n))
    for i in range(n):
        c = np.sqrt(1.0 / n) if i == 0 else np.sqrt(2.0 / n)
        t[i] = c * np.cos((2 * np.arange(n) + 1) * i * np.pi / (2 * n))
    return t


_T32 = _dct_matrix(_N)


def _resize_bilinear(gray: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic bilinear resample of a 2-D float array."""
    h, w = gray.shape
    ys = (np.arange(th) + 0.5) * h / th - 0.5
    xs = (np.arange(tw) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = gray[np.ix_(y0, x0)]
    b = gray[np.ix_(y0, x1)]
    c = gray[np.ix_(y1, x0)]
    d = gray[np.ix_(y1, x1)]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (
        1 - fx
    ) + d * fy * fx


def phash64(pixels: np.ndarray) -> int:
    """Classic 64-bit pHash of an (h, w, 3) uint8 RGB array (signed
    int64, matching the images.phash column type)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    small = _resize_bilinear(gray, _N, _N)
    coefs = _T32 @ small @ _T32.T
    # pHash.org convention: the 8x8 block SKIPS the DC row/column —
    # DC (mean brightness) dwarfs every AC term, so including it
    # yields one constant bit (63 effective bits) and brightness
    # sensitivity; the pure-AC block makes all 64 bits informative
    # and global brightness shifts a no-op by construction
    low = coefs[1:9, 1:9].reshape(64)
    med = np.median(low)
    bits = low > med
    h = 0
    for bit in bits:
        h = (h << 1) | int(bit)
    return h - (1 << 64) if h >= (1 << 63) else h


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
