"""End-to-end staged pipeline: images → blocks → dedup → centroids →
spatial join, with checkpoint resume semantics."""

from pyspark.sql import functions as F

from quadtree_block_compression_spark.fixtures.geometries import generate_geometries


def test_full_pipeline_and_resume(spark, tiny_images, tmp_path):
    from quadtree_block_compression_spark.plans.quadtree_pipeline import (
        run_quadtree_pipeline)
    geoms = spark.createDataFrame(generate_geometries(n=12, seed=5, res=8))
    root = str(tmp_path / "pipe")

    out = run_quadtree_pipeline(spark, tiny_images, geoms, root,
                                input_fingerprint="tiny-v1")
    n_blocks = out["blocks"].count()
    n_spatial = out["spatial"].count()
    assert n_blocks > 16
    assert out["deduped"].count() == n_blocks
    assert out["centroids"].filter(F.col("cell").isNull()).count() == 0

    # manifest recorded all four stages
    pipe = out["pipeline"]
    assert all(pipe.manifest[s]["complete"] for s in
               ("s1_blocks", "s2_dedup", "s3_centroids", "s4_spatial_join"))

    # resume: same fingerprint → stage outputs identical, nothing recomputed
    # (poison the images df so any recompute of s1 would fail)
    poisoned = tiny_images.withColumn("bytes", F.lit(b"oops"))
    out2 = run_quadtree_pipeline(spark, poisoned, geoms, root,
                                 input_fingerprint="tiny-v1")
    assert out2["blocks"].count() == n_blocks
    assert out2["spatial"].count() == n_spatial

    # changed fingerprint → rebuild is attempted (and fails on the poison)
    import pytest
    with pytest.raises(Exception):
        run_quadtree_pipeline(spark, poisoned, geoms, root,
                              input_fingerprint="tiny-v2")

    # lineage accumulated across stages
    lin = pipe.lineage()
    stages = {r.stage for r in lin.select("stage").distinct().collect()}
    assert "s1_blocks" in stages and "s4_spatial_join" in stages
