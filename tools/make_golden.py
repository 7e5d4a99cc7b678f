"""Generate the frozen blocks_golden regression table (FIXTURES.md §3).

Run once; the output parquet is committed. Tests then assert that tile
assignment reproduces it exactly — any kernel change that flips a leaf
decision or block hash is caught as a regression (and, if intentional, this
file is regenerated in the same commit with the justification).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quadtree_block_compression_spark.session import build_session
from quadtree_block_compression_spark.fixtures.images import images_pandas
from quadtree_block_compression_spark.operators.tiling import assign_tiles

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "blocks_golden.parquet")


def main() -> None:
    spark = build_session("make-golden", cores=8, shuffle_partitions=8)
    images = spark.createDataFrame(images_pandas(16, seed=42, max_side=128))
    blocks = assign_tiles(images).select(
        "image_id", "tile_id", "level", "x0", "y0", "x1", "y1",
        "is_leaf", "oob", "similarity", "block_hash", "morton")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    blocks.coalesce(1).sortWithinPartitions("image_id", "tile_id") \
        .write.mode("overwrite").parquet(OUT)
    print(f"{blocks.count()} golden rows -> {OUT}")


if __name__ == "__main__":
    main()
