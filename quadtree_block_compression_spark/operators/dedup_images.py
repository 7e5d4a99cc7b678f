"""Image-level near-duplicate detection via perceptual hash.

The ``images`` table carries a 64-bit DCT pHash per row (input_hint schema).
Near-duplicate images are pairs with Hamming(phash_a, phash_b) ≤ t. Banding
on four non-overlapping 16-bit segments prunes the quadratic pair space
(pigeonhole: any pair with Hamming ≤ 3 shares at least one segment exactly;
larger t trades recall, the standard SimHash argument). Everything is JVM
bit arithmetic — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def phash_near_dup_pairs(images: DataFrame, max_hamming: int = 10,
                         id_col: str = "image_id",
                         hash_col: str = "phash") -> DataFrame:
    """Pairs of images with pHash Hamming distance ≤ ``max_hamming``."""
    segs = [(F.shiftright(F.col(hash_col), s * 16)
             .bitwiseAND(F.lit((1 << 16) - 1))).alias(f"seg{s}") for s in range(4)]
    keyed = images.select(F.col(id_col), F.col(hash_col), *segs)
    pairs = None
    for s in range(4):
        a = keyed.select(F.col(id_col).alias("a"), F.col(hash_col).alias("ha"),
                         F.col(f"seg{s}").alias("seg"))
        b = keyed.select(F.col(id_col).alias("b"), F.col(hash_col).alias("hb"),
                         F.col(f"seg{s}").alias("seg"))
        p = a.join(b, "seg").where(F.col("a") < F.col("b")).select("a", "b", "ha", "hb")
        pairs = p if pairs is None else pairs.unionByName(p)
    return (pairs.distinct()
            .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .where(F.col("hamming") <= max_hamming)
            .select(F.col("a").alias("image_a"), F.col("b").alias("image_b"),
                    "hamming"))
