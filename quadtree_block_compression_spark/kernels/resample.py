"""Image resampling kernels, faithful to ``golang.org/x/image/draw``.

The reference scales blocks with ``utils.Scale`` (``pkg/utils/imageUtils.go:40-47``)
using one of four interpolators registered at
``pkg/quadtreeImage/quadtreeElement.go:20-25``; the defaults that drive the
leaf decision are **NearestNeighbor down, CatmullRom up**
(``configs/config.yml:6-8``). Both are reimplemented here from the published
x/image algorithm (not ported code):

* NearestNeighbor: integer source index ``sx = (2*dx+1)*sw // (2*dw)``.
* Kernel scalers (BiLinear support 1, CatmullRom support 2): separable —
  horizontal pass into a float64 buffer, vertical pass, single final
  rounding. Pixel math happens in the 16-bit color domain (Go's
  ``At().RGBA()`` yields ``v8 * 0x101``) and the final conversion is
  ``uint16(clamp(sum + 0.5)) >> 8``, matching Go's ``ftou``/``>>8`` path, so
  exact 8-bit values survive identity transforms bit-for-bit.
* ApproxBiLinear: x/image's *point-sampled* bilinear (``draw/interp.go``
  ablInterpolator): back-project ``sx = (dx+0.5)·sw/dw − 0.5`` (edge-
  clamped) and blend the two neighbors with weights ``(1−fx, fx)`` — no
  kernel widening on minification, which is exactly what distinguishes it
  from the true BiLinear kernel. Separable with ≤2 taps per row, so it
  shares the matmul path; arithmetic is float64 in the 16-bit domain where
  Go's fast paths use integer fixed point — a documented sub-LSB rounding
  divergence, bit-exact on identity.

Weights are precomputed per (src_size, dst_size, kernel) and cached — in the
tiling UDF every level of every image reuses the same two matrices, so the
whole level is two matmuls per channel over a stacked ``(n, s, s, 3)`` batch.
"""

from __future__ import annotations

import functools

import numpy as np

_SUPPORT = {"BiLinear": 1.0, "CatmullRom": 2.0}


def _kernel_at(name: str, t: np.ndarray) -> np.ndarray:
    """Kernel response at |t|; zero outside support."""
    t = np.abs(t)
    if name == "BiLinear":
        return np.where(t < 1.0, 1.0 - t, 0.0)
    if name == "CatmullRom":
        # Catmull-Rom spline, a = -0.5 (the x/image choice)
        r1 = (1.5 * t - 2.5) * t * t + 1.0
        r2 = ((-0.5 * t + 2.5) * t - 4.0) * t + 2.0
        return np.where(t < 1.0, r1, np.where(t < 2.0, r2, 0.0))
    raise ValueError(f"unknown kernel: {name}")


@functools.lru_cache(maxsize=4096)
def _distrib(src: int, dst: int, name: str) -> np.ndarray:
    """(dst, src) row-normalized weight matrix for one axis."""
    half_width = _SUPPORT[name]
    arg_scale = 1.0
    if dst < src:  # minification widens the kernel
        half_width *= src / dst
        arg_scale = dst / src
    w = np.zeros((dst, src), dtype=np.float64)
    for d in range(dst):
        center = (d + 0.5) * (src / dst) - 0.5
        lo = max(int(np.ceil(center - half_width)), 0)
        hi = min(int(np.floor(center + half_width)), src - 1)
        idx = np.arange(lo, hi + 1)
        ww = _kernel_at(name, (center - idx) * arg_scale)
        w[d, lo : hi + 1] = ww / ww.sum()
    return w


@functools.lru_cache(maxsize=4096)
def _abl_distrib(src: int, dst: int) -> np.ndarray:
    """(dst, src) point-sampled bilinear weights (ApproxBiLinear): two taps
    at floor/ceil of the back-projected coordinate, edge-clamped."""
    w = np.zeros((dst, src), dtype=np.float64)
    for d in range(dst):
        sx = (d + 0.5) * (src / dst) - 0.5
        sx = min(max(sx, 0.0), float(src - 1))
        ix = int(np.floor(sx))
        fx = sx - ix
        if ix + 1 < src and fx > 0.0:
            w[d, ix] = 1.0 - fx
            w[d, ix + 1] = fx
        else:
            w[d, ix] = 1.0
    return w


@functools.lru_cache(maxsize=4096)
def _nn_index(src: int, dst: int) -> np.ndarray:
    """Nearest-neighbor source indices, Go integer arithmetic."""
    d = np.arange(dst, dtype=np.int64)
    return (2 * d + 1) * src // (2 * dst)




def scale_batch(imgs: np.ndarray, dst_h: int, dst_w: int, method: str) -> np.ndarray:
    """Resample a batch of images ``(n, h, w, c) uint8`` to ``(n, dst_h, dst_w, c)``.

    Semantics match ``utils.Scale`` + x/image interpolators as described in
    the module docstring.
    """
    imgs = np.asarray(imgs)
    if imgs.ndim == 3:
        imgs = imgs[None]
    n, h, w, c = imgs.shape
    if method == "NearestNeighbor":
        iy = _nn_index(h, dst_h)
        ix = _nn_index(w, dst_w)
        return imgs[:, iy[:, None], ix[None, :], :]
    if method == "ApproxBiLinear":
        wy = _abl_distrib(h, dst_h)
        wx = _abl_distrib(w, dst_w) * 257.0
    else:
        wy = _distrib(h, dst_h, method)          # (dst_h, h)
        wx = _distrib(w, dst_w, method) * 257.0  # (dst_w, w); fold the 16-bit
    # expansion (v8·0x101) into the tiny weight matrix instead of a full-array
    # multiply — exact, since the expansion is linear.
    v = imgs.astype(np.float64)
    # horizontal then vertical, float64 throughout, one final rounding.
    # NB: einsum must NOT get an out= buffer — that disables its BLAS/dot
    # dispatch and costs ~35% throughput (measured), far more than the
    # page-zeroing the buffer reuse would have saved.
    tmp = np.einsum("nhwc,xw->nhxc", v, wx, optimize=True)
    out = np.einsum("nhxc,yh->nyxc", tmp, wy, optimize=True)
    # Go's ftou + >>8, fused in place: u8 = floor(clamp(sum16 + 0.5)) >> 8
    # == floor(clamp(sum16 + 0.5) / 256) (integer floor commutes with /256)
    np.add(out, 0.5, out=out)
    np.clip(out, 0.0, 65535.0, out=out)
    np.floor_divide(out, 256.0, out=out)
    return out.astype(np.uint8)


def scale(img: np.ndarray, dst_h: int, dst_w: int, method: str) -> np.ndarray:
    """Single-image convenience wrapper around :func:`scale_batch`."""
    return scale_batch(img[None], dst_h, dst_w, method)[0]
