"""Bucketed block store — shuffle-free co-located joins.

At 10^12 blocks the recurring joins (blocks⋈blocks dedup resolve,
blocks⋈images reassembly) shuffle both sides on ``image_id``/``block_hash``
every run. Writing the blocks table bucketed on the join key moves that
shuffle to write time, once: subsequent equi-joins between tables bucketed
the same way execute with NO Exchange on either side (SortMergeJoin over
pre-bucketed scans). This is the parquet/Iceberg equivalent of the archive
being "keyed by path" in the reference — the key is physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None) -> None:
    """Persist as a bucketed managed table (saveAsTable is required for
    bucket metadata; plain parquet paths can't carry it)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    w.format("parquet").saveAsTable(table_name)


def bucketed_self_join_demo(spark: SparkSession, blocks: DataFrame,
                            table_name: str = "blocks_bucketed",
                            n_buckets: int = 16) -> DataFrame:
    """Write blocks bucketed by block_hash, then resolve duplicate blocks via
    a self-join that needs no shuffle (the decode-side symlink follow,
    SURVEY.md §2.3 J2, at scale)."""
    from pyspark.sql import functions as F

    write_bucketed(blocks.select("image_id", "tile_id", "block_hash"),
                   table_name, "block_hash", n_buckets)
    t = spark.table(table_name)
    canon = (t.groupBy("block_hash")
             .agg(F.min(F.struct("image_id", "tile_id")).alias("c"))
             .select("block_hash", F.col("c.image_id").alias("canonical_image_id"),
                     F.col("c.tile_id").alias("canonical_tile_id")))
    return t.join(canon, "block_hash")
