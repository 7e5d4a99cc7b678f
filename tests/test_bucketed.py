"""Bucketed-table co-located joins: the join on the bucket key must run
without shuffling the bucketed side."""

import os

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_no_exchange_on_bucketed_side(spark, tiny_images, tmp_path):
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    from quadtree_block_compression_spark.sources.bucketed import (
        write_bucketed, bucketed_self_join_demo)

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS blocks_bucketed")
    # a dropped in-memory-catalog table leaves its warehouse dir behind
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    shutil.rmtree(os.path.join(warehouse, "blocks_bucketed"), ignore_errors=True)
    blocks = assign_tiles(tiny_images.limit(6))
    joined = bucketed_self_join_demo(spark, blocks, "blocks_bucketed", n_buckets=8)
    # correctness: every block row resolved to a canonical (min-key) block
    assert joined.count() == blocks.count()
    assert joined.filter(F.col("canonical_image_id").isNull()).count() == 0

    # plan: the scan side of the self-aggregate join must not re-Exchange by
    # block_hash — bucket metadata satisfies the distribution requirement
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # one Exchange can remain for the tiny aggregated (canon) side under AQE,
    # but the big bucketed scan side must feed the join without an Exchange:
    scan_to_join = plan.split("FileScan")[0]
    assert "blocks_bucketed" in plan
    # count Exchanges: a non-bucketed equivalent plan has 2+ (both sides);
    # the bucketed plan has at most 1
    assert plan.count("Exchange hashpartitioning(block_hash") <= 1
