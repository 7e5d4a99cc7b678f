"""Fixture generator determinism: the distributed (mapInPandas) generator
must produce byte-identical rows to the local pandas generator — the
property that makes goldens and bench workloads reproducible anywhere."""

import numpy as np


def test_generate_images_matches_local(spark):
    from quadtree_block_compression_spark.fixtures.images import (
        generate_images, images_pandas)
    # NB: generate_images draws from the ≤512 size pool (per-row seeded), so
    # compare against the local generator at the same max_side
    local = images_pandas(12, seed=42, max_side=512).set_index("image_id")
    dist = {r.image_id: r for r in generate_images(spark, 12, seed=42).collect()}
    assert set(dist) == set(local.index)
    for image_id, row in local.iterrows():
        d = dist[image_id]
        assert bytes(d.bytes) == bytes(row["bytes"]), image_id
        assert (d.w, d.h, d.fmt, d.caption, d.phash) == \
            (row["w"], row["h"], row["fmt"], row["caption"], row["phash"])


def test_generate_images_partition_invariant(spark):
    from quadtree_block_compression_spark.fixtures.images import generate_images
    a = {r.image_id: bytes(r.bytes) for r in generate_images(spark, 8, 42, partitions=1).collect()}
    b = {r.image_id: bytes(r.bytes) for r in generate_images(spark, 8, 42, partitions=8).collect()}
    assert a == b


def test_images_meta_matches_full_generator():
    """The metadata-only view (ADVICE r3: oracle-side dims without the
    pixel kernel) must replay the EXACT size draws of the full generator —
    any drift in the per-row RNG draw order breaks the archive oracles."""
    from quadtree_block_compression_spark.fixtures.images import (
        images_pandas, images_meta_pandas)
    full = images_pandas(16, seed=42, max_side=128)
    meta = images_meta_pandas(16, seed=42, max_side=128)
    assert list(meta.columns) == ["image_id", "w", "h", "caption"]
    for col in ("image_id", "w", "h", "caption"):
        assert list(meta[col]) == list(full[col]), col
