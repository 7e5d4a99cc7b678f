"""Golden tile-assignment regression (FIXTURES.md §3): the frozen expected
output of assign_tiles on the seed-42 tiny images table. Catches any kernel
change that flips a leaf decision, bound, hash, or similarity."""

import os

import numpy as np
from pyspark.sql import functions as F

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "blocks_golden.parquet")
KEY = ["image_id", "tile_id"]
EXACT_COLS = ["image_id", "tile_id", "level", "x0", "y0", "x1", "y1",
              "is_leaf", "oob", "block_hash", "morton"]


def test_tile_assignment_matches_golden(spark, tiny_images):
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    golden = spark.read.parquet(GOLDEN)
    got = assign_tiles(tiny_images).cache()
    assert got.count() == golden.count()
    diff = (got.select(EXACT_COLS).exceptAll(golden.select(EXACT_COLS)).count()
            + golden.select(EXACT_COLS).exceptAll(got.select(EXACT_COLS)).count())
    assert diff == 0
    # similarity: exact float match (deterministic kernel), NaN-aware
    j = (got.select(*KEY, "similarity")
         .join(golden.select(*KEY, F.col("similarity").alias("sim_g")), KEY))
    bad = j.filter(~(F.col("similarity").eqNullSafe(F.col("sim_g"))
                     | (F.isnan("similarity") & F.isnan("sim_g")))).count()
    assert bad == 0


def test_golden_invariants(spark):
    """Sanity on the golden itself: tree structure + leaf partition."""
    g = spark.read.parquet(GOLDEN)
    roots = g.filter(F.col("tile_id") == "")
    assert roots.count() == 16
    leaf_area = (g.filter("is_leaf")
                 .groupBy("image_id")
                 .agg(F.sum((F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))).alias("a")))
    side = roots.select("image_id", (F.col("x1") * F.col("x1")).alias("expect"))
    assert leaf_area.join(side, "image_id").filter("a != expect").count() == 0
