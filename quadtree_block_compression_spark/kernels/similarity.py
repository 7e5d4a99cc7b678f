"""Weighted / exact pixel-similarity kernels.

Reimplements ``ComparePixelsWeighted`` / ``ComparePixelsExact``
(``pkg/utils/comparisonUtils.go:10-104``) as vectorized numpy reductions over
batches of equal-sized node images, preserving three deliberate quirks
(SURVEY.md §7):

* **16-bit color domain**: Go's ``At().RGBA()`` returns ``v8 * 0x101``; the
  per-channel tolerance is ``1000 * weight`` in those units
  (``comparisonUtils.go:79-88``), i.e. ≈1 8-bit LSB for red, ≈2 for green and
  **0** for blue (114.0 / 257 < 1 — blue requires exact equality).
* **`PointCollides` off-by-one** (``comparisonUtils.go:107-112``): a pixel is
  "in bounds" when ``x <= W`` / ``y <= H`` (not ``<``), so the first padding
  row/column *is counted* in the similarity.
* **Zero relevant pixels → similarity 1** (``comparisonUtils.go:95-99``).

Luma weights from ``pkg/utils/imageUtils.go:11-13``.
"""

from __future__ import annotations

import numpy as np

WEIGHT_R = 0.2989
WEIGHT_G = 0.5870
WEIGHT_B = 0.1140
_WEIGHTS = np.array([WEIGHT_R, WEIGHT_G, WEIGHT_B])
# tolerances in the 16-bit domain: 1000 * weight (comparisonUtils.go:79-88).
# Since both operands are v8 * 0x101, the 16-bit diff is always diff8 * 257,
# so the float comparison |a16-b16| <= 1000*w is EXACTLY equivalent to the
# integer comparison diff8 <= floor(1000*w / 257) — i.e. R: ±1, G: ±2, B: 0.
# The integer path moves 8-bit data instead of three float64 temporaries;
# the kernel is memory-bandwidth-bound at high core counts, so this is the
# difference between 2.3× and near-linear 8→32-core scaling.
_TOL8 = (1000.0 * _WEIGHTS / 257.0).astype(np.int16)  # [1, 2, 0]


def _relevant_mask(n: int, size: int, x0: np.ndarray, y0: np.ndarray,
                   width: int, height: int) -> np.ndarray:
    """(n, size, size) bool — pixels NOT skipped by ``PointCollides``.

    Node ``i`` occupies global ``[x0[i], x0[i]+size) × [y0[i], y0[i]+size)``;
    a pixel at global (x, y) is relevant iff ``x <= width and y <= height``
    (the deliberate ``<=`` quirk; origins are never negative here).
    """
    lx = np.arange(size)
    ly = np.arange(size)
    keep_x = (x0[:, None] + lx[None, :]) <= width    # (n, size)
    keep_y = (y0[:, None] + ly[None, :]) <= height   # (n, size)
    return keep_y[:, :, None] & keep_x[:, None, :]


def compare_pixels_weighted(a: np.ndarray, b: np.ndarray, x0: np.ndarray,
                            y0: np.ndarray, width: int, height: int) -> np.ndarray:
    """Batched ``ComparePixelsWeighted``.

    ``a``/``b``: ``(n, s, s, 3) uint8`` equal-bounds image pairs; ``x0, y0``:
    global top-left of each node; ``width, height``: original-image bounds
    (the ``globalBounds`` rect). Returns ``(n,) float64`` similarities.
    """
    a = np.asarray(a); b = np.asarray(b)
    n, s = a.shape[0], a.shape[1]
    x0 = np.asarray(x0, dtype=np.int64); y0 = np.asarray(y0, dtype=np.int64)
    diff8 = np.abs(a.astype(np.int16) - b.astype(np.int16))  # (n, s, s, 3) int16
    in_range = diff8 <= _TOL8  # bool, exact per the 16-bit-domain identity
    mask = _relevant_mask(n, s, x0, y0, width, height)
    # per-channel integer match counts, then one tiny float combination
    counts = (in_range & mask[..., None]).sum(axis=(1, 2), dtype=np.int64)  # (n, 3)
    matches = counts @ _WEIGHTS
    relevant = mask.sum(axis=(1, 2)).astype(np.float64)
    return np.where(relevant <= 0, 1.0, matches / np.maximum(relevant, 1.0))


def compare_pixels_exact(a: np.ndarray, b: np.ndarray, x0: np.ndarray,
                         y0: np.ndarray, width: int, height: int) -> np.ndarray:
    """Batched ``ComparePixelsExact`` (``comparisonUtils.go:10-51``)."""
    a = np.asarray(a); b = np.asarray(b)
    n, s = a.shape[0], a.shape[1]
    x0 = np.asarray(x0, dtype=np.int64); y0 = np.asarray(y0, dtype=np.int64)
    eq = (a == b).all(axis=3)  # (n, s, s)
    mask = _relevant_mask(n, s, x0, y0, width, height)
    matches = (eq & mask).sum(axis=(1, 2)).astype(np.float64)
    relevant = mask.sum(axis=(1, 2)).astype(np.float64)
    return np.where(relevant <= 0, 1.0, matches / np.maximum(relevant, 1.0))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images (dB)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))
