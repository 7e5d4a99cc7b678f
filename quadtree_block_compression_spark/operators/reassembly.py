"""Decode/reassembly: blocks → images, with fidelity + caption verification.

Distributed form of the reference's decode path
(``pkg/quadtreeImage/quadtreeImage.go:151-301``): the archive file-cache
becomes the blocks DataFrame, the per-file goroutines
(``quadtreeImage.go:215-230``) become tasks, and the final ``GetBlockImage``
composition is a grouped Arrow UDF per image. The per-row invariant of
BASELINE.json (decoded pixels allclose / PSNR≥40dB lossy, captions
byte-equal) is computed here as columns so tests and lineage can assert it
at scale without collecting pixels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig, DEFAULT_CONFIG


def reassemble(blocks: DataFrame, images: DataFrame,
               cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Rebuild every image from its leaf blocks and score fidelity.

    Returns ``(image_id, n_blocks, psnr double, exact boolean,
    caption string, caption_ok boolean)`` — one row per image.

    Plan shape: leaf filter (pushed to the blocks scan) → shuffle by
    image_id (the only shuffle; co-partitioned with the images join) →
    grouped Arrow UDF.
    """
    meta = images.select("image_id", "bytes", "w", "h", "caption")
    leaves = (blocks.filter(F.col("is_leaf"))
              .select("image_id", "x0", "y0", "x1", "block_px"))
    joined = leaves.join(meta, "image_id")

    def rebuild(pdf):
        import numpy as np
        import pandas as pd
        from ..kernels.codecs import decode_image
        from ..kernels.quadtree import reassemble_image
        from ..kernels.similarity import psnr as psnr_fn

        image_id = pdf["image_id"].iloc[0]
        w = int(pdf["w"].iloc[0]); h = int(pdf["h"].iloc[0])
        caption = pdf["caption"].iloc[0]
        rec = reassemble_image(w, h, pdf["x0"].to_numpy(), pdf["y0"].to_numpy(),
                               pdf["x1"].to_numpy(),
                               [bytes(b) for b in pdf["block_px"]], cfg)
        orig = decode_image(bytes(pdf["bytes"].iloc[0]))
        p = psnr_fn(orig, rec)
        return pd.DataFrame([{
            "image_id": image_id,
            "n_blocks": len(pdf),
            "psnr": float(min(p, 1e9)),
            "exact": bool(np.array_equal(orig, rec)),
            "caption": caption,
        }])

    schema = ("image_id string, n_blocks long, psnr double, exact boolean, "
              "caption string")
    rebuilt = joined.groupBy("image_id").applyInPandas(rebuild, schema)
    # caption integrity: the caption that traveled join → Arrow → grouped UDF
    # → Arrow must be byte-equal to the source-of-truth column (input_hint
    # invariant). Compared JVM-side after re-joining the images table.
    truth = images.select("image_id", F.col("caption").alias("_caption_src"))
    return (rebuilt.join(truth, "image_id")
            .withColumn("caption_ok", F.col("caption").eqNullSafe(F.col("_caption_src")))
            .drop("_caption_src"))


def roundtrip_report(images: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Convenience: tile-assign then reassemble in one pipeline."""
    from .tiling import assign_tiles
    blocks = assign_tiles(images, cfg)
    return reassemble(blocks, images, cfg)
