"""Config-gated behavior: SkipOutOfBoundsBlocks (reference P4) and the
interpolator registry (F4) flowing through the engine config."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from quadtree_block_compression_spark.config import (
    EngineConfig, QuadtreeConfig, EncodingConfig)
from quadtree_block_compression_spark.operators.tiling import assign_tiles, leaf_blocks
from quadtree_block_compression_spark.kernels.codecs import encode_png


def _nonsquare_image(spark):
    # 9×3 pads to 16 → lower-right quadrants fully OOB
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (3, 9, 3), dtype=np.int64).astype(np.uint8)
    return spark.createDataFrame(pd.DataFrame([{
        "image_id": "ns", "bytes": encode_png(img), "w": 9, "h": 3,
        "fmt": "png", "caption": "", "phash": 0}]))


def test_skip_oob_filter(spark):
    images = _nonsquare_image(spark)
    blocks = assign_tiles(images).cache()
    n_oob_leaves = blocks.filter("is_leaf and oob").count()
    assert n_oob_leaves > 0
    kept = leaf_blocks(blocks, skip_oob=False).count()
    skipped = leaf_blocks(blocks, skip_oob=True).count()
    assert kept - skipped == n_oob_leaves


def test_interpolator_config_changes_decisions(spark, tiny_images):
    # ApproxBiLinear-up vs CatmullRom-up must flow through to the kernel;
    # on gradient-ish images the trees can differ, and at minimum the
    # similarity values must differ somewhere
    cfg_bl = EngineConfig(quadtree=QuadtreeConfig(upsampling_interpolator="BiLinear"))
    a = assign_tiles(tiny_images, cfg_bl).select("image_id", "tile_id", "similarity")
    b = assign_tiles(tiny_images).select("image_id", "tile_id", "similarity")
    j = a.join(b.withColumnRenamed("similarity", "s2"), ["image_id", "tile_id"])
    diff = j.filter((~F.isnan("similarity")) & (~F.isnan("s2"))
                    & (F.col("similarity") != F.col("s2"))).count()
    assert diff > 0


def test_cutoff_config_monotone_blocks(spark, tiny_images):
    lo = assign_tiles(tiny_images, EngineConfig(quadtree=QuadtreeConfig(similarity_cutoff=0.5)))
    hi = assign_tiles(tiny_images, EngineConfig(quadtree=QuadtreeConfig(similarity_cutoff=0.999)))
    assert lo.count() <= hi.count()
