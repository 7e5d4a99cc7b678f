"""Per-image quadtree tile assignment + reassembly (pure numpy).

This is the distributed re-expression of the reference's recursive
partitioner. The Go code recurses node-by-node with goroutines
(``pkg/quadtreeImage/quadtreeElement.go:80-139``) and eagerly computes each
node's 8×8 block, upsampled block and leaf flag in the constructor
(``quadtreeElement.go:64-77``). Here one *image* is one unit of work (the
engine parallelizes across images, not within one), and within an image the
recursion is run **level-synchronously**: every node of a level is stacked
into a ``(n, s, s, 3)`` batch, so downsample / upsample / similarity are two
matmuls and one masked reduction per level instead of per-node loops — the
"most expensive code" (the quadrant copy, ``quadtreeElement.go:114-118``)
becomes fancy-indexed gathers.

Decision semantics are the reference's, bit-for-bit (SURVEY.md §2.2):

1. node fully outside original bounds (strict-inequality AABB test,
   ``comparisonUtils.go:115-120``) → leaf + skippable;
2. node size ≤ BLOCK_SIZE on either axis → leaf;
3. weighted similarity(upsampled block, node) > SimilarityCutoff → leaf
   (``quadtreeElement.go:142-155``).

Every node (interior included) emits a row — matching the reference's eager
evaluation, and giving the blocks table the full tree for lineage queries.
"""

from __future__ import annotations

import numpy as np

from .. import BLOCK_SIZE
from ..config import EngineConfig, DEFAULT_CONFIG
from .resample import scale_batch
from .similarity import compare_pixels_weighted
from .geometry import rectangles_collide
from .tiles import pad_image, tile_children, tree_height

BLOCK_BYTES = BLOCK_SIZE * BLOCK_SIZE * 3

# Upsample+similarity are fused over chunks whose float64 intermediate stays
# ~this size: the (n, s, s, 3) buffer plus its three read-modify-write
# post-passes otherwise stream ~30× the payload bytes through DRAM (s=128),
# which is what starves cores once 32 of them run the kernel concurrently.
# Measured on the bench mix: +57% aggregate throughput at 8- and 32-way
# parallelism vs the unchunked pass, bit-identical output per node (chunking
# never changes per-node arithmetic; reductions are over fixed K=8).
_CHUNK_BYTES = 1 << 20


def _gather_nodes(padded: np.ndarray, x0: np.ndarray, y0: np.ndarray, s: int) -> np.ndarray:
    """Stack node sections ``(n, s, s, 3)`` out of the padded canvas."""
    rows = y0[:, None] + np.arange(s)[None, :]
    cols = x0[:, None] + np.arange(s)[None, :]
    return padded[rows[:, :, None], cols[:, None, :], :]


def assign_tiles_image(img: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """Quadtree-partition one decoded image.

    Returns a dict of equal-length column lists:
    ``tile_id, level, x0, y0, x1, y1, is_leaf, oob, similarity, block_px``.
    ``block_px`` is the 8×8 RGB downsample (192 raw bytes) of the node — the
    reference's ``blockImageMinimal`` (``quadtreeElement.go:172``).
    """
    h, w = img.shape[:2]
    padded = pad_image(np.ascontiguousarray(img[:, :, :3], dtype=np.uint8))
    side = padded.shape[0]
    qt = cfg.quadtree

    out: dict[str, list] = {k: [] for k in
                            ("tile_id", "level", "x0", "y0", "x1", "y1",
                             "is_leaf", "oob", "similarity", "block_px")}

    tile_ids = np.array([""], dtype=object)
    bounds = np.array([[0, 0, side, side]], dtype=np.int64)
    level = 0

    while len(bounds):
        s = int(bounds[0, 2] - bounds[0, 0])
        x0, y0 = bounds[:, 0], bounds[:, 1]
        nodes = _gather_nodes(padded, x0, y0, s)

        down = scale_batch(nodes, BLOCK_SIZE, BLOCK_SIZE, qt.downsampling_interpolator)

        # rule 1: fully out of the original image's bounds
        oob = ~rectangles_collide(bounds, np.array([0, 0, w, h], dtype=np.float64))
        # rule 2: min block size
        min_size = s <= BLOCK_SIZE
        # rule 3 (similarity) is evaluated ONLY for nodes rules 1-2 didn't
        # decide — exactly like checkIsLeaf's early returns
        # (quadtreeElement.go:142-155, compareImages called at :154 only).
        # The skipped upsample+compare at the bottom level is the single
        # hottest saving in the whole kernel; undecided rows carry NaN.
        sim = np.full(len(bounds), np.nan)
        idx = np.flatnonzero(~(oob | min_size))
        if len(idx):
            # fused + cache-resident: upsample a chunk, compare it while its
            # float64 intermediate is still hot, discard — never materialize
            # the whole level's upsampled batch (see _CHUNK_BYTES)
            chunk = max(1, _CHUNK_BYTES // (s * s * 3 * 8))
            for i in range(0, len(idx), chunk):
                sel = idx[i:i + chunk]
                up = scale_batch(down[sel], s, s, qt.upsampling_interpolator)
                sim[sel] = compare_pixels_weighted(up, nodes[sel], x0[sel],
                                                   y0[sel], w, h)
        is_leaf = oob | min_size | (sim > qt.similarity_cutoff)

        out["tile_id"].extend(tile_ids.tolist())
        out["level"].extend([level] * len(bounds))
        out["x0"].extend(bounds[:, 0].tolist())
        out["y0"].extend(bounds[:, 1].tolist())
        out["x1"].extend(bounds[:, 2].tolist())
        out["y1"].extend(bounds[:, 3].tolist())
        out["is_leaf"].extend(is_leaf.tolist())
        out["oob"].extend(oob.tolist())
        out["similarity"].extend(sim.tolist())
        out["block_px"].extend([d.tobytes() for d in down])

        split = ~is_leaf
        if not split.any():
            break
        parent_ids = tile_ids[split]
        child_b = tile_children(bounds[split])          # (m, 4, 4)
        bounds = child_b.reshape(-1, 4)
        tile_ids = np.array([pid + str(i) for pid in parent_ids for i in range(4)],
                            dtype=object)
        level += 1

    return out


def reassemble_image(w: int, h: int, x0s, y0s, x1s, block_pxs,
                     cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Rebuild an image from its leaf blocks — the reference's decode +
    ``GetBlockImage`` composition (``quadtreeImage.go:151-301``): upsample
    each 8×8 block to its node size with the *upsampling* interpolator,
    paste at its bounds, crop the padding.
    """
    side = 1
    canvas = None
    order = np.argsort(np.asarray(x1s) - np.asarray(x0s))  # group by node size
    x0s = np.asarray(x0s, dtype=np.int64)[order]
    y0s = np.asarray(y0s, dtype=np.int64)[order]
    sizes = (np.asarray(x1s, dtype=np.int64)[order] - x0s)
    blocks = [block_pxs[i] for i in order]
    side = max(int((x0s + sizes).max()), int((y0s + sizes).max()))
    canvas = np.zeros((side, side, 3), dtype=np.uint8)
    i = 0
    n = len(blocks)
    while i < n:
        j = i
        s = int(sizes[i])
        while j < n and sizes[j] == s:
            j += 1
        batch = np.stack([np.frombuffer(blocks[k], dtype=np.uint8).reshape(
            BLOCK_SIZE, BLOCK_SIZE, 3) for k in range(i, j)])
        ups = scale_batch(batch, s, s, cfg.quadtree.upsampling_interpolator)
        for bi, k in enumerate(range(i, j)):
            canvas[y0s[k]:y0s[k] + s, x0s[k]:x0s[k] + s] = ups[bi]
        i = j
    return canvas[:h, :w]


__all__ = ["assign_tiles_image", "reassemble_image", "tree_height", "BLOCK_BYTES"]
