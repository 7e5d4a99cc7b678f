"""DCT-based 64-bit perceptual hash (pHash), batched.

The ``images`` table carries ``phash:int64`` (BASELINE.json input_hint). The
classic pHash recipe (public: Zauner, "Implementation and Benchmarking of
Perceptual Image Hash Functions", 2010): grayscale → 32×32 resize → 2D DCT →
top-left 8×8 low-frequency block (skipping DC for the median) → bit = coef >
median. Deterministic, pure numpy.
"""

from __future__ import annotations

import numpy as np

from .resample import scale_batch


def _dct_mat(n: int) -> np.ndarray:
    k = np.arange(n)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    d[0, :] = 1.0 / np.sqrt(n)
    return d


_D32 = _dct_mat(32)


def phash64_batch(imgs: np.ndarray) -> np.ndarray:
    """``(n, h, w, 3) uint8`` (equal sizes) → ``(n,) int64`` perceptual hashes."""
    imgs = np.asarray(imgs)
    if imgs.ndim == 3:
        imgs = imgs[None]
    gray = (0.299 * imgs[..., 0] + 0.587 * imgs[..., 1] + 0.114 * imgs[..., 2])
    small = scale_batch(np.clip(np.round(gray), 0, 255).astype(np.uint8)[..., None].repeat(3, -1),
                        32, 32, "BiLinear")[..., 0].astype(np.float64)
    coefs = np.einsum("ij,njk,lk->nil", _D32, small, _D32, optimize=True)
    low = coefs[:, :8, :8].reshape(-1, 64)
    med = np.median(low[:, 1:], axis=1, keepdims=True)  # skip DC
    bits = (low > med).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return (bits * weights).sum(axis=1).astype(np.int64)


def phash64(img: np.ndarray) -> int:
    return int(phash64_batch(img[None])[0])


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays."""
    x = (np.asarray(a, dtype=np.int64).view(np.uint64)
         ^ np.asarray(b, dtype=np.int64).view(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
