"""Deterministic query polygons + kNN query fixtures (FIXTURES.md §2, §4).

Coordinate frame: the spatial layer's world frame ``[0, WORLD)²`` (see
``kernels.geometry``). Tile centroids land in this frame via the fixed affine
in ``operators.spatial_join``. Rect polygons reduce to the reference's
``RectanglesCollide`` strict-inequality semantics; ~2% of polygons are "hot"
(huge area) to force skew-salting paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels.geometry import WORLD, polygon_cover


def generate_geometries(n: int = 64, seed: int = 42, res: int = 8,
                        hot_fraction: float = 0.02) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ("rect", "convex", "concave")[i % 3]
        is_hot = rng.random() < hot_fraction or i == 0  # always ≥1 hot polygon
        span = WORLD * (0.5 if is_hot else 0.02 + 0.08 * rng.random())
        cx, cy = rng.random() * WORLD, rng.random() * WORLD
        if kind == "rect":
            w_, h_ = span, span * (0.5 + rng.random())
            xs = np.array([cx, cx + w_, cx + w_, cx])
            ys = np.array([cy, cy, cy + h_, cy + h_])
        elif kind == "convex":
            k = int(rng.integers(5, 9))
            ang = np.sort(rng.random(k) * 2 * np.pi)
            r = span * (0.5 + 0.5 * rng.random(k))
            xs, ys = cx + r * np.cos(ang), cy + r * np.sin(ang)
        else:  # concave star
            k = int(rng.integers(5, 8))
            ang = np.linspace(0, 2 * np.pi, 2 * k, endpoint=False)
            r = np.where(np.arange(2 * k) % 2 == 0, span, span * 0.35)
            xs, ys = cx + r * np.cos(ang), cy + r * np.sin(ang)
        xs = np.clip(xs, 0, WORLD - 1)
        ys = np.clip(ys, 0, WORLD - 1)
        rows.append({
            "geom_id": f"poly_{i:05d}",
            "kind": kind,
            "vx": xs.astype(float).tolist(),
            "vy": ys.astype(float).tolist(),
            "cell_keys": polygon_cover(xs, ys, res).tolist(),
            "is_hot": bool(is_hot),
        })
    return pd.DataFrame(rows)


def generate_knn_queries(n: int = 32, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ks = np.array([1, 5, 16])
    return pd.DataFrame({
        "query_id": [f"q_{i:04d}" for i in range(n)],
        "x": rng.random(n) * WORLD,
        "y": rng.random(n) * WORLD,
        "k": ks[rng.integers(0, 3, n)].astype("int32"),
    })
