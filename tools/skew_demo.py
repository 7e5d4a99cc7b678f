"""Hot-cell skew demonstration: salted vs naive shuffle spatial join.

Key-level skew is invisible to AQE: one hot cell key lands on one task no
matter how partitions split. This tool builds a deliberately skewed points
table (a configurable fraction of all points in ONE cell), disables
broadcast so the join must shuffle on the cell key, and times:

  1. naive shuffle equi-join on ``cell`` + PIP verify,
  2. the engine's salt-exploded join (``spatial_join_salted``'s hot path).

Prints one JSON line with both wall times and the per-task row distribution
(max/mean) that explains the difference. Results recorded in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from quadtree_block_compression_spark.session import build_session
from quadtree_block_compression_spark.kernels.geometry import WORLD, cell_encode, polygon_cover
from quadtree_block_compression_spark.operators.spatial_join import (
    spatial_join_salted, polygons_by_cell, _verify_pip)

N_POINTS = int(os.environ.get("QBCS_SKEW_POINTS", "400000"))
HOT_FRACTION = 0.6
RES = 8


def make_points(spark):
    rng = np.random.default_rng(7)
    n_hot = int(N_POINTS * HOT_FRACTION)
    # hot points: all inside one cell; cold: uniform
    hot_x = rng.uniform(0.30 * WORLD, 0.30 * WORLD + WORLD / 256, n_hot)
    hot_y = rng.uniform(0.70 * WORLD, 0.70 * WORLD + WORLD / 256, n_hot)
    cold_x = rng.uniform(0, WORLD, N_POINTS - n_hot)
    cold_y = rng.uniform(0, WORLD, N_POINTS - n_hot)
    x = np.concatenate([hot_x, cold_x]); y = np.concatenate([hot_y, cold_y])
    pdf = pd.DataFrame({
        "image_id": [f"p{i}" for i in range(N_POINTS)],
        "tile_id": "",
        "wx": x, "wy": y,
        "cell": cell_encode(x, y, RES),
    })
    return spark.createDataFrame(pdf).repartition(64).cache()


def make_polys(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(24):
        span = WORLD * (0.5 if i == 0 else 0.05)  # poly 0 covers the hot cell
        cx = 0.3 * WORLD if i == 0 else rng.uniform(0, WORLD)
        cy = 0.7 * WORLD if i == 0 else rng.uniform(0, WORLD)
        vx = np.clip(np.array([cx, cx + span, cx + span, cx]), 0, WORLD - 1)
        vy = np.clip(np.array([cy, cy, cy + span, cy + span]), 0, WORLD - 1)
        rows.append({"geom_id": f"g{i:03d}", "kind": "rect",
                     "vx": vx.tolist(), "vy": vy.tolist(),
                     "cell_keys": polygon_cover(vx, vy, RES).tolist(),
                     "is_hot": i == 0})
    return spark.createDataFrame(pd.DataFrame(rows)).cache()


def main() -> None:
    spark = build_session("skew-demo", cores=32, shuffle_partitions=64,
                          extra={"spark.sql.autoBroadcastJoinThreshold": "-1"})
    points = make_points(spark)
    polys_cells = polygons_by_cell(make_polys(spark)).cache()
    points.count(); polys_cells.count()  # materialize inputs

    # naive: shuffle hash join on the skewed cell key
    t0 = time.time()
    naive = _verify_pip(points.join(polys_cells, "cell")) \
        .select("image_id", "geom_id").dropDuplicates(["image_id", "geom_id"])
    n_naive = naive.count()
    t_naive = time.time() - t0

    # salted: the engine's hot-cell path
    t0 = time.time()
    salted = spatial_join_salted(points, make_polys(spark),
                                 hot_threshold=10_000, salt=32)
    n_salted = salted.select("image_id", "geom_id").count()
    t_salted = time.time() - t0

    print(json.dumps({
        "points": N_POINTS, "hot_fraction": HOT_FRACTION,
        "naive_shuffle_join_sec": round(t_naive, 2), "naive_rows": n_naive,
        "salted_join_sec": round(t_salted, 2), "salted_rows": n_salted,
        "speedup": round(t_naive / t_salted, 2),
        "rows_equal": n_naive == n_salted,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
