"""Streaming image ingest: stream → tile-assign per micro-batch → blocks
store, identical to the batch operator's output."""

import os

from pyspark.sql import functions as F


def test_streaming_ingest_matches_batch(spark, tiny_images, tmp_path):
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    from quadtree_block_compression_spark.streaming.ingest import start_image_ingest

    src = str(tmp_path / "img_in")
    blocks_out = str(tmp_path / "blocks_out")
    ckpt = str(tmp_path / "ckpt")
    lineage = str(tmp_path / "lineage")
    os.makedirs(src)

    subset = tiny_images.limit(6).cache()
    subset.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(subset.schema).parquet(src)
    q = start_image_ingest(stream, blocks_out, ckpt, lineage_path=lineage)
    q.awaitTermination(120)

    got = spark.read.parquet(blocks_out)
    want = assign_tiles(subset)
    cols = ["image_id", "tile_id", "level", "x0", "y0", "x1", "y1",
            "is_leaf", "oob", "block_hash"]
    assert got.count() == want.count()
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    # lineage rows recorded for the batch
    lin = spark.read.parquet(lineage)
    assert lin.filter(F.col("stage").startswith("ingest_batch_")).count() > 0
    # restart with no new data: availableNow + checkpoint → no duplicates
    stream2 = spark.readStream.schema(subset.schema).parquet(src)
    q2 = start_image_ingest(stream2, blocks_out, ckpt, lineage_path=lineage)
    q2.awaitTermination(60)
    assert spark.read.parquet(blocks_out).count() == want.count()


def test_ingest_batch_replay_is_idempotent(spark, tiny_images, tmp_path):
    """foreachBatch is at-least-once: a batch retried with the same batch_id
    (failure between sink write and checkpoint commit) must REPLACE its own
    output, not append a duplicate — the idempotent half of exactly-once."""
    from quadtree_block_compression_spark.streaming.ingest import make_batch_processor

    blocks_out = str(tmp_path / "blocks_replay")
    lineage = str(tmp_path / "lineage_replay")
    proc = make_batch_processor(blocks_out, lineage_path=lineage)
    subset = tiny_images.limit(4).cache()

    proc(subset, 0)
    n_first = spark.read.parquet(blocks_out).count()
    proc(subset, 0)                      # simulated retry of the same batch
    assert spark.read.parquet(blocks_out).count() == n_first
    proc(subset.limit(2), 1)             # a NEW batch still appends
    got = spark.read.parquet(blocks_out)
    assert got.filter(F.col("_batch_id") == 1).count() > 0
    assert got.filter(F.col("_batch_id") == 0).count() == n_first
    # lineage follows the same per-batch overwrite discipline
    lin = spark.read.parquet(lineage)
    assert lin.filter(F.col("stage") == "ingest_batch_0") \
              .filter(F.col("partition_id") == -1).count() == 1
