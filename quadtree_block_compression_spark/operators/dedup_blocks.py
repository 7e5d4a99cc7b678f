"""Block deduplication — exact and near-duplicate tiers.

The reference dedups blocks two ways, both replaced by joins/windows:

* **Exact identity** (encode-time pseudo-symlinks,
  ``pkg/quadtreeImage/quadtreeImage.go:116-117``,
  ``quadtreeElement.go:249-261``): a ``map[*image.Image]string`` writes the
  canonical block's archive path instead of bytes. Here: group by
  ``block_hash``, elect the lowest ``(image_id, tile_id)`` as canonical via a
  window, others carry ``block_ref`` — deterministic, unlike the reference's
  pointer-identity map under goroutines.
* **Near-duplicate** (``quadtreeElement.go:176-207``): an O(n²) scan of a
  mutex-guarded global list, keeping argmax similarity ≥ MinimalSimilarity.
  Here: LSH banding on the block's coarse signature (quantized 2×2 mean per
  channel per quadrant) → candidates meet only within a band bucket → exact
  weighted-similarity verification in one vectorized UDF → deterministic
  argmax (max similarity, ties broken by lowest canonical key). The global
  lock disappears; candidate generation is an equi-join that broadcasts or
  shuffles on the band key like any other join.

Divergence from the reference, by design (SURVEY.md §3.1): the reference's
candidate pool is insertion-order-dependent (non-deterministic under its own
parallelism flag). This engine's election is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import EngineConfig, DEFAULT_CONFIG

def dedup_exact(blocks: DataFrame) -> DataFrame:
    """Add ``canonical_image_id``, ``canonical_tile_id``, ``is_canonical``,
    ``block_ref`` (null for canonical rows) — the symlink map as columns."""
    w = Window.partitionBy("block_hash").orderBy("image_id", "tile_id")
    out = (blocks
           .withColumn("_rn", F.row_number().over(w))
           .withColumn("is_canonical", F.col("_rn") == 1)
           .drop("_rn"))
    canon = (out.filter(F.col("is_canonical"))
             .select(F.col("block_hash"),
                     F.col("image_id").alias("canonical_image_id"),
                     F.col("tile_id").alias("canonical_tile_id")))
    return (out.join(canon, "block_hash")
            .withColumn("block_ref",
                        F.when(F.col("is_canonical"), F.lit(None).cast("string"))
                        .otherwise(F.concat_ws("/", "canonical_image_id",
                                               "canonical_tile_id"))))


def dedup_group_counts(blocks: DataFrame) -> DataFrame:
    """The visualization dedup-group census (``quadtreeImage.go:310-333``):
    hash-aggregate instead of a pointer-count loop."""
    return (blocks.groupBy("block_hash")
            .agg(F.count("*").alias("n_blocks"),
                 F.countDistinct("image_id").alias("n_images"))
            .filter(F.col("n_blocks") > 1))


def near_dedup(blocks: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG,
               bands: int = 4, max_bucket: int | None = 10_000) -> DataFrame:
    """Near-duplicate candidate pairs with verified similarity.

    Returns ``(image_id, tile_id, dup_image_id, dup_tile_id, similarity)``
    where similarity ≥ ``cfg.encoding.dedup_minimal_similarity``, argmax per
    block, deterministic tie-break. Banding keys are computed in one
    vectorized UDF (Arrow in/out); candidate pairing and argmax election are
    pure DataFrame joins/windows.

    ``max_bucket`` caps band-bucket size: a degenerate bucket of d blocks
    (e.g. all-black tiles at 10^12 scale) contributes d²/2 candidate pairs —
    dropped buckets are the exact-duplicate crowd the *exact* tier already
    handles by hash, so near-dedup loses nothing of value.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<long>")
    def band_keys(px):  # type: ignore[misc]
        import numpy as np
        import pandas as pd
        arr = np.stack([np.frombuffer(b, dtype=np.uint8) for b in px]).reshape(-1, 8, 8, 3)
        # 4×4 quadrant means per channel, quantized to 16 levels
        q = arr.reshape(-1, 2, 4, 2, 4, 3).mean(axis=(2, 4))  # (n, 2, 2, 3)
        qq = np.clip((q / 16).astype(np.int64), 0, 15).reshape(-1, 12)
        n_per_band = 12 // bands
        keys = []
        for b in range(bands):
            sl = qq[:, b * n_per_band:(b + 1) * n_per_band]
            k = np.zeros(len(qq), dtype=np.int64)
            for j in range(n_per_band):
                k = k * 16 + sl[:, j]
            keys.append(k * bands + b)  # band id disambiguates key space
        return pd.Series(np.stack(keys, axis=1).tolist())

    from ..functions.bucketing import cap_by_key
    from ..functions.cache import persist_tracked

    min_sim = cfg.encoding.dedup_minimal_similarity
    # persist the UDF OUTPUT (pre-cap): the band_keys Arrow pass is the
    # expensive stage and it feeds the cap's count aggregate, the cap's row
    # side, and (through the cap) both self-join sides — cached it runs
    # exactly once. The cap itself (aggregate + key-list join) re-derives
    # from the cache per consumer, which is cheap — unlike the r4 shape
    # where the UNpersisted UDF executed once per self-join side, or a
    # capped-only persist where it would still run twice inside the one
    # cache build (row side + count side of the cap join).
    sig = persist_tracked(
        blocks.select("image_id", "tile_id", "block_hash", "block_px")
        .withColumn("band", F.explode(band_keys("block_px"))))
    if max_bucket is not None:
        sig = cap_by_key(sig, ["band"], max_bucket)

    left = sig.select(F.col("image_id").alias("a_img"), F.col("tile_id").alias("a_tile"),
                      F.col("block_px").alias("a_px"), "band", F.col("block_hash").alias("a_hash"))
    right = sig.select(F.col("image_id").alias("b_img"), F.col("tile_id").alias("b_tile"),
                       F.col("block_px").alias("b_px"), "band", F.col("block_hash").alias("b_hash"))
    cand = (left.join(right, "band")
            .filter((F.col("a_img") < F.col("b_img")) |
                    ((F.col("a_img") == F.col("b_img")) & (F.col("a_tile") < F.col("b_tile"))))
            .dropDuplicates(["a_img", "a_tile", "b_img", "b_tile"]))

    @pandas_udf("double")
    def verify(a_px, b_px):  # type: ignore[misc]
        import numpy as np
        import pandas as pd
        from ..kernels.similarity import compare_pixels_weighted
        if len(a_px) == 0:
            return pd.Series([], dtype=float)
        a = np.stack([np.frombuffer(x, dtype=np.uint8) for x in a_px]).reshape(-1, 8, 8, 3)
        b = np.stack([np.frombuffer(x, dtype=np.uint8) for x in b_px]).reshape(-1, 8, 8, 3)
        z = np.zeros(len(a), dtype=np.int64)
        # globalBounds = the 8×8 block rect itself, as in the reference's
        # dedup call (quadtreeElement.go:187: bounds = downsampled.Rect)
        return pd.Series(compare_pixels_weighted(a, b, z, z, 8, 8))

    # asNondeterministic: the similarity column feeds BOTH the threshold
    # filter and the output projection; with a deterministic UDF Catalyst's
    # ExtractPythonUDFs re-extracts it per consumer and every candidate
    # pair pays the Arrow verify twice (observed as two ArrowEvalPython
    # nodes in the r4 plan). The UDF is pure — the marker only pins
    # single evaluation (plan-audited).
    verify = verify.asNondeterministic()

    pairs = (cand.withColumn("similarity", verify("a_px", "b_px"))
             .filter(F.col("similarity") >= min_sim)
             .select(F.col("a_img").alias("image_id"), F.col("a_tile").alias("tile_id"),
                     F.col("b_img").alias("dup_image_id"), F.col("b_tile").alias("dup_tile_id"),
                     "similarity"))
    w = Window.partitionBy("image_id", "tile_id").orderBy(
        F.desc("similarity"), "dup_image_id", "dup_tile_id")
    return pairs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
