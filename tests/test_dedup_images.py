"""pHash-based image near-dup detection."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_phash_near_dup_pairs(spark):
    from quadtree_block_compression_spark.kernels.phash import phash64
    from quadtree_block_compression_spark.operators.dedup_images import (
        phash_near_dup_pairs)
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (64, 64, 3), dtype=np.int64).astype(np.uint8)
    # near-dup: tiny perturbation; far: fresh noise
    near = np.clip(base.astype(np.int16) + rng.integers(-2, 3, base.shape),
                   0, 255).astype(np.uint8)
    far = rng.integers(0, 256, (64, 64, 3), dtype=np.int64).astype(np.uint8)
    rows = [("a", int(phash64(base))), ("b", int(phash64(near))),
            ("c", int(phash64(far)))]
    images = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "phash"]))
    pairs = {(r.image_a, r.image_b): r.hamming
             for r in phash_near_dup_pairs(images, max_hamming=10).collect()}
    assert ("a", "b") in pairs
    assert ("a", "c") not in pairs and ("b", "c") not in pairs


def test_phash_near_dup_plan_jvm_only(spark):
    from quadtree_block_compression_spark.operators.dedup_images import (
        phash_near_dup_pairs)
    images = spark.createDataFrame(
        pd.DataFrame({"image_id": ["x", "y"], "phash": [1, 2]}))
    plan = phash_near_dup_pairs(images)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan