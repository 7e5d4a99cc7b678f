"""Calibration tools — parity with the reference's cmd/tools.

* :func:`interpolator_matrix` — the 4×4 down/up interpolator round-trip
  similarity matrix (``cmd/tools/scalingCombinations/scalingCombinations.go:22-51``),
  the calibration that justifies the NN-down/CatmullRom-up default. One
  Arrow UDF pass per image, all pairs vectorized inside.
* :func:`block_size_extremes` — min/max/argmin/argmax of encoded leaf-block
  sizes (``cmd/tools/imageGenerator/imageGenerator.go:50-144``), as plain
  aggregates over an encoded-size column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf

INTERPOLATORS = ["NearestNeighbor", "ApproxBiLinear", "BiLinear", "CatmullRom"]

MATRIX_SCHEMA = ("image_id string, down string, up string, similarity double")


def interpolator_matrix(images: DataFrame) -> DataFrame:
    """Per image × (down, up) pair: weighted similarity of the
    downsample→upsample round trip at the image's own size."""
    src = images.select("image_id", "bytes", "w", "h")

    def run(batches):
        import numpy as np
        import pandas as pd
        from .. import BLOCK_SIZE
        from ..kernels.codecs import decode_image
        from ..kernels.resample import scale
        from ..kernels.similarity import compare_pixels_weighted
        from ..kernels.tiles import pad_image

        for pdf in batches:
            out = []
            for image_id, data, w, h in zip(pdf["image_id"], pdf["bytes"],
                                            pdf["w"], pdf["h"]):
                img = pad_image(decode_image(bytes(data)))
                s = img.shape[0]
                z = np.zeros(1, dtype=np.int64)
                for down in INTERPOLATORS:
                    small = scale(img, BLOCK_SIZE, BLOCK_SIZE, down)
                    for up in INTERPOLATORS:
                        big = scale(small, s, s, up)
                        sim = compare_pixels_weighted(
                            big[None], img[None], z, z, int(w), int(h))[0]
                        out.append((image_id, down, up, float(sim)))
            yield pd.DataFrame(out, columns=["image_id", "down", "up", "similarity"])

    return src.mapInPandas(run, MATRIX_SCHEMA)


def block_size_extremes(blocks: DataFrame, quality: int = 75) -> DataFrame:
    """Encoded-size extremes over all leaf blocks — one row with
    min/max sizes and the tile ids achieving them."""

    @pandas_udf("int")
    def enc_size(px):  # type: ignore[misc]
        import numpy as np
        import pandas as pd
        from ..kernels.codecs import encode_lossy
        return pd.Series([len(encode_lossy(
            np.frombuffer(bytes(b), dtype=np.uint8).reshape(8, 8, 3), quality))
            for b in px])

    sized = (blocks.filter(F.col("is_leaf"))
             .withColumn("enc_bytes", enc_size("block_px"))
             .withColumn("key", F.concat_ws("/", "image_id", "tile_id")))
    return sized.agg(
        F.min("enc_bytes").alias("min_bytes"),
        F.max("enc_bytes").alias("max_bytes"),
        F.expr("min_by(key, struct(enc_bytes, key))").alias("min_block"),
        F.expr("max_by(key, struct(enc_bytes, key))").alias("max_block"),
        F.count("*").alias("n_blocks"))
