"""binaryFile source + visualization overlay tests."""

import os

import numpy as np


def test_binary_file_source(spark, tmp_path):
    from quadtree_block_compression_spark.kernels.codecs import encode_png, encode_raw
    from quadtree_block_compression_spark.sources.tables import load_images_binary_files
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (12, 10, 3), dtype=np.int64).astype(np.uint8)
    b = rng.integers(0, 256, (7, 7, 3), dtype=np.int64).astype(np.uint8)
    (tmp_path / "a.png").write_bytes(encode_png(a))
    (tmp_path / "b.raw").write_bytes(encode_raw(b))
    df = load_images_binary_files(spark, str(tmp_path)).cache()
    rows = {r.image_id: r for r in df.collect()}
    assert rows["a.png"].w == 10 and rows["a.png"].h == 12 and rows["a.png"].fmt == "png"
    assert rows["b.raw"].w == 7 and rows["b.raw"].fmt == "raw"
    assert rows["a.png"].phash != 0


def test_render_tile_overlay(spark, tiny_images):
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    from quadtree_block_compression_spark.operators.visualize import render_tile_overlay
    from quadtree_block_compression_spark.kernels.codecs import decode_png
    some = tiny_images.limit(4)
    blocks = assign_tiles(some)
    out = {r.image_id: bytes(r.overlay_png)
           for r in render_tile_overlay(blocks, some, color_dedup_groups=True).collect()}
    assert len(out) == 4
    for image_id, png in out.items():
        img = decode_png(png)
        meta = some.filter(f"image_id = '{image_id}'").collect()[0]
        assert img.shape[:2] == (meta.h, meta.w)
        # root box corner pixel is the box color on at least one image > 1px
        if meta.w > 2 and meta.h > 2:
            assert (img[0, 0] == np.array([255, 0, 0])).all()


def test_write_analytics_reference_dir_convention(spark, tiny_images, tmp_path):
    """Reference parity (cmd/codec/main.go:139-181): artifacts land in
    analytics_dir/<unix-ts>/, an existing dir probes <ts>_0, <ts>_1, …;
    disabled or empty dir is a no-op."""
    from quadtree_block_compression_spark.operators.tiling import assign_tiles
    from quadtree_block_compression_spark.operators.visualize import (
        render_tile_overlay, write_analytics)
    some = tiny_images.limit(2)
    art = render_tile_overlay(assign_tiles(some), some).cache()
    base = str(tmp_path / "analytics")
    os.makedirs(base)
    d1 = write_analytics(art, base, timestamp=1700000000)
    assert d1 == os.path.join(base, "1700000000")
    assert sorted(os.listdir(d1)) == sorted(
        f"{r.image_id}.png" for r in some.select("image_id").collect())
    # collision: same timestamp probes _0 then _1, like the reference loop
    d2 = write_analytics(art, base, timestamp=1700000000)
    d3 = write_analytics(art, base, timestamp=1700000000)
    assert d2 == os.path.join(base, "1700000000_0")
    assert d3 == os.path.join(base, "1700000000_1")
    # disabled / empty-dir guards are no-ops
    assert write_analytics(art, base, enabled=False) is None
    assert write_analytics(art, "", timestamp=1) is None
    # bytes round-trip untouched
    want = {r.image_id: bytes(r.overlay_png) for r in art.collect()}
    for name, blob in want.items():
        with open(os.path.join(d1, f"{name}.png"), "rb") as f:
            assert f.read() == blob
