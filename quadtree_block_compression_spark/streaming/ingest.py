"""Streaming image ingest: images stream → quadtree blocks, exactly-once.

The streaming face of the encode pipeline: a Structured Streaming source of
image rows is tile-assigned per micro-batch with the SAME batch operator
(``operators.tiling.assign_tiles``) inside ``foreachBatch``, appended to the
blocks store with per-batch lineage rows. ``foreachBatch`` + checkpoint
gives exactly-once sink semantics for an idempotent parquet append keyed by
(batch_id), and keeps one code path for batch and streaming tile assignment
(no semantic drift between the two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig, DEFAULT_CONFIG


def start_image_ingest(stream_images: DataFrame, blocks_path: str,
                       checkpoint_path: str,
                       cfg: EngineConfig = DEFAULT_CONFIG,
                       lineage_path: str | None = None):
    """Start the ingest query. ``stream_images`` must have the images-table
    schema. Returns the StreamingQuery (caller stops it)."""
    from ..operators.tiling import assign_tiles
    from ..plans.lineage import partition_lineage

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        blocks = assign_tiles(batch_df, cfg).withColumn("_batch_id", F.lit(batch_id))
        blocks.write.mode("append").parquet(blocks_path)
        if lineage_path:
            (partition_lineage(blocks, f"ingest_batch_{batch_id}",
                               weigh_col="block_px")
             .write.mode("append").parquet(lineage_path))

    return (stream_images.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())
