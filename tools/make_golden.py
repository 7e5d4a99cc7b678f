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

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")
OUT = os.path.join(GOLDEN_DIR, "blocks_golden.parquet")
OUT_SIZES = os.path.join(GOLDEN_DIR, "block_sizes_golden.parquet")


def main(which: str = "all") -> None:
    spark = build_session("make-golden", cores=8, shuffle_partitions=8)
    images = spark.createDataFrame(images_pandas(16, seed=42, max_side=128))
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if which in ("all", "blocks"):
        blocks = assign_tiles(images).select(
            "image_id", "tile_id", "level", "x0", "y0", "x1", "y1",
            "is_leaf", "oob", "similarity", "block_hash", "morton")
        blocks.coalesce(1).sortWithinPartitions("image_id", "tile_id") \
            .write.mode("overwrite").parquet(OUT)
        print(f"{blocks.count()} golden rows -> {OUT}")
    if which in ("all", "sizes"):
        # leaf encoded sizes (lossy q75) — the block_size_extremes oracle
        # fixture; frozen for the same reason as blocks_golden
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("int")
        def enc_size(px):  # type: ignore[misc]
            import numpy as np
            import pandas as pd
            from quadtree_block_compression_spark.kernels.codecs import encode_lossy
            return pd.Series([len(encode_lossy(
                np.frombuffer(bytes(b), dtype=np.uint8).reshape(8, 8, 3), 75))
                for b in px])

        sized = (assign_tiles(images).filter(F.col("is_leaf"))
                 .select("image_id", "tile_id", enc_size("block_px").alias("enc_bytes")))
        sized.coalesce(1).sortWithinPartitions("image_id", "tile_id") \
            .write.mode("overwrite").parquet(OUT_SIZES)
        print(f"{sized.count()} size rows -> {OUT_SIZES}")


if __name__ == "__main__":
    import sys as _sys
    main(_sys.argv[1] if len(_sys.argv) > 1 else "all")
