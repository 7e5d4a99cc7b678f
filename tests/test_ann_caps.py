"""Scale guards on the embedding-LSH tiers (round-2 verdict item #2).

A degenerate bucket — hundreds of near-identical embeddings sharing every
half-signature, the boilerplate-page shape at web scale — must not square
inside the banded self-join. ``max_bucket`` drops such buckets before the
join; ``auto_num_planes`` grows the bucket key space with the table.
"""

import pandas as pd
import pytest

from quadtree_block_compression_spark.operators.ann import (
    auto_num_planes, cosine_topk_lsh, embedding_near_dup_pairs)


def _degenerate_emb(spark, n_dup=300, n_other=40, dim=8):
    """n_dup identical vectors (one bucket in every tier) + n_other spread."""
    rows = [{"vec_id": i, "embedding": [1.0] * dim} for i in range(n_dup)]
    for j in range(n_other):
        v = [float((j * 7 + d * 3) % 11 - 5) for d in range(dim)]
        rows.append({"vec_id": n_dup + j, "embedding": v})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_auto_num_planes_growth():
    assert auto_num_planes(500, target_bucket=32) == 8   # the sf0.01 gate value
    assert auto_num_planes(2000, target_bucket=32) == 12
    assert auto_num_planes(10**9, target_bucket=32) == 50
    assert auto_num_planes(10, target_bucket=32) == 8    # floor
    # expected occupancy stays ~target: n / 2^(planes/2) <= target
    for n in (10**4, 10**6, 10**8):
        planes = auto_num_planes(n, target_bucket=32)
        assert n / 2 ** (planes // 2) <= 32


def test_near_dup_degenerate_bucket_capped(spark):
    emb = _degenerate_emb(spark)
    uncapped = embedding_near_dup_pairs(
        emb, threshold=0.99, dim=8, num_planes=8, max_bucket=None).count()
    capped = embedding_near_dup_pairs(
        emb, threshold=0.99, dim=8, num_planes=8, max_bucket=100)
    got = capped.toPandas()
    # without the cap the 300 identical vectors square: 300·299/2 pairs
    assert uncapped >= 300 * 299 // 2
    # with it the degenerate bucket is dropped from every tier entirely
    assert len(got) < 300
    assert not ((got["vec_a"] < 300) & (got["vec_b"] < 300)).any()


def test_topk_lsh_degenerate_bucket_capped(spark):
    emb = _degenerate_emb(spark)
    from pyspark.sql import functions as F
    q = (emb.where(F.col("vec_id") >= 330)  # queries from the spread tail
         .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")))
    capped = cosine_topk_lsh(emb, q, k=3, dim=8, num_planes=8,
                             max_bucket=100, multiprobe=True)
    got = capped.toPandas()
    # results exist and never come from the dropped degenerate bucket
    assert len(got) > 0
    assert (got["vec_id"] >= 300).all()
    assert (got.groupby("q_id").size() <= 3).all()


def test_multiprobe_lifts_candidates(spark):
    """Multiprobe must be a superset candidate set: every exact-probe hit
    remains, rank quality can only improve (same scoring, more candidates)."""
    emb = _degenerate_emb(spark, n_dup=5, n_other=60)
    from pyspark.sql import functions as F
    q = (emb.where(F.col("vec_id") >= 60)
         .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")))
    single = cosine_topk_lsh(emb, q, k=50, dim=8, num_planes=8,
                             multiprobe=False).count()
    multi = cosine_topk_lsh(emb, q, k=50, dim=8, num_planes=8,
                            multiprobe=True).count()
    assert multi >= single
