"""pHash-based image near-dup detection."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_phash_near_dup_pairs(spark):
    from quadtree_block_compression_spark.kernels.phash import phash64
    from quadtree_block_compression_spark.operators.dedup_images import (
        phash_near_dup_pairs)
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (64, 64, 3), dtype=np.int64).astype(np.uint8)
    # near-dup: tiny perturbation; far: fresh noise
    near = np.clip(base.astype(np.int16) + rng.integers(-2, 3, base.shape),
                   0, 255).astype(np.uint8)
    far = rng.integers(0, 256, (64, 64, 3), dtype=np.int64).astype(np.uint8)
    rows = [("a", int(phash64(base))), ("b", int(phash64(near))),
            ("c", int(phash64(far)))]
    images = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "phash"]))
    pairs = {(r.image_a, r.image_b): r.hamming
             for r in phash_near_dup_pairs(images, max_hamming=10).collect()}
    assert ("a", "b") in pairs
    assert ("a", "c") not in pairs and ("b", "c") not in pairs


def test_phash_pairs_match_bruteforce_and_emit_once(spark):
    """Reference-point rule = the distinct it replaced: the pair set equals
    brute force (hamming ≤ t AND ≥1 agreeing 16-bit segment) and every pair
    is emitted EXACTLY once even when the two hashes agree on several
    segments (exact dups agree on all four)."""
    from quadtree_block_compression_spark.operators.dedup_images import (
        phash_near_dup_pairs)
    rng = np.random.default_rng(7)
    hs = list(rng.integers(-2**63, 2**63 - 1, 24, dtype=np.int64))
    hs += hs[:3]                    # exact dups: all 4 segments agree
    hs += [h ^ 0x3 for h in hs[:2]]  # hamming 2, segments 1-3 agree
    hs += [hs[4] ^ (0x5 << 16)]     # hamming 2, segments 0,2,3 agree
    ids = [f"i{k:02d}" for k in range(len(hs))]
    images = spark.createDataFrame(
        pd.DataFrame({"image_id": ids, "phash": np.array(hs, dtype=np.int64)}))
    rows = phash_near_dup_pairs(images, max_hamming=10).collect()
    got = [(r.image_a, r.image_b, r.hamming) for r in rows]
    assert len(got) == len(set(got)), "a pair was emitted more than once"

    def seg(h, s):
        return (int(np.uint64(np.int64(h))) >> (16 * s)) & 0xFFFF

    expected = set()
    for x in range(len(hs)):
        for y in range(x + 1, len(hs)):
            a, b = sorted((ids[x], ids[y]))
            ham = bin(int(np.uint64(np.int64(hs[x]) ^ np.int64(hs[y])))).count("1")
            if ham <= 10 and any(seg(hs[x], s) == seg(hs[y], s) for s in range(4)):
                expected.add((a, b, ham))
    assert {(a, b, h) for a, b, h in got} == expected


def test_phash_dedup_clusters_chain_and_singleton(spark):
    """Transitive near-dup chain a–b, b–c (a–c beyond the threshold) forms
    ONE component with the min id canonical; an unrelated hash stays a
    singleton component of itself."""
    from quadtree_block_compression_spark.operators.dedup_images import (
        phash_dedup_clusters)
    rows = [("a", 0x0), ("b", 0x3F), ("c", 0xFFF),       # ham 6, 6, 12
            ("d", -6148914691236517206)]                  # 0xAAAA... pattern
    images = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "phash"]))
    out = {r.image_id: r for r in
           phash_dedup_clusters(images, max_hamming=10).collect()}
    assert len(out) == 4
    for i in ("a", "b", "c"):
        assert out[i].component_id == "a" and out[i].component_size == 3
        assert out[i].is_canonical == (i == "a")
    assert out["d"].component_id == "d" and out["d"].component_size == 1
    assert out["d"].is_canonical


def test_phash_near_dup_plan_jvm_only(spark):
    from quadtree_block_compression_spark.operators.dedup_images import (
        phash_near_dup_pairs)
    images = spark.createDataFrame(
        pd.DataFrame({"image_id": ["x", "y"], "phash": [1, 2]}))
    plan = phash_near_dup_pairs(images)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan

def test_caption_dedup_normalize_election_unicode(spark):
    """Trailing bracketed annotation is stripped (only at end-of-string),
    groups elect the min image id, unicode captions group correctly, and
    the plan stays JVM-only."""
    from quadtree_block_compression_spark.operators.dedup_images import (
        caption_dedup)
    rows = [
        ("i3", "a red fox jumps [source#12]"),
        ("i1", "a red fox jumps [crawl-2024]"),
        ("i2", "a red fox jumps"),
        ("i4", "[lead] bracket not trailing"),
        ("i5", "ein roter Fuchs 赤狐 [x]"),
        ("i6", "ein roter Fuchs 赤狐"),
        ("i7", "unique caption"),
    ]
    images = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "caption"]))
    df = caption_dedup(images)
    out = {r.image_id: r for r in df.collect()}
    assert len(out) == 7
    for i in ("i1", "i2", "i3"):
        assert out[i].caption_norm == "a red fox jumps"
        assert out[i].canonical_id == "i1"
        assert out[i].group_size == 3
        assert out[i].is_canonical == (i == "i1")
    # leading bracket untouched; only a TRAILING annotation is boilerplate
    assert out["i4"].caption_norm == "[lead] bracket not trailing"
    assert out["i5"].caption_norm == out["i6"].caption_norm
    assert out["i5"].canonical_id == "i5" and out["i5"].group_size == 2
    assert out["i7"].group_size == 1 and out["i7"].is_canonical
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_caption_dedup_empty_captions_stay_singletons(spark):
    """Untitled images (caption normalizes to '') are NOT a duplicate
    group: each is its own canonical singleton — electing across them
    would silently drop all-but-one untitled image downstream, and the
    shared empty fingerprint would be a giant hot window partition at
    scale."""
    from quadtree_block_compression_spark.operators.dedup_images import (
        caption_dedup)
    rows = [("i1", ""), ("i2", "   "), ("i3", "[source#9]"),
            ("i4", "real caption"), ("i5", "real caption"),
            ("i6", None), ("i7", None)]  # NULL caption ≡ untitled too
    out = {r.image_id: r for r in caption_dedup(
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["image_id", "caption"]))).collect()}
    for i in ("i1", "i2", "i3", "i6", "i7"):
        assert out[i].caption_norm == ""
        assert out[i].group_size == 1
        assert out[i].canonical_id == i and out[i].is_canonical
    assert out["i4"].group_size == 2 and out["i5"].canonical_id == "i4"


def test_multimodal_clusters_union_and_transitivity(spark):
    """Joint dedup merges via EITHER channel and transitively across them:
    a–b pixel-near (caption empty), b absent… specifically: x–y by phash
    only, y–z by caption only ⇒ one component {x,y,z}; empty normalized
    captions contribute no edges; unrelated rows stay singletons."""
    from quadtree_block_compression_spark.operators.dedup_images import (
        multimodal_dedup_clusters)
    rows = [
        # x ≈phash y (hamming 2), captions differ after normalize
        ("x", 0x0, "alpha view [a]"),
        ("y", 0x3, "beta view [b]"),
        # z shares y's normalized caption, phash far from both
        ("z", 0x00FF00FF00FF00FF, "beta view [c]"),
        # empty captions: near-identical caption state, far phash — singleton
        ("e1", -6148914691236517206, ""),
        ("e2", 0x7530000012345678, "   [only-bracket]"),
    ]
    images = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "phash", "caption"]))
    out = {r.image_id: r for r in
           multimodal_dedup_clusters(images, max_hamming=10).collect()}
    assert len(out) == 5
    for i in ("x", "y", "z"):
        assert out[i].component_id == "x" and out[i].component_size == 3
        assert out[i].is_canonical == (i == "x")
    for i in ("e1", "e2"):
        assert out[i].component_id == i and out[i].component_size == 1
