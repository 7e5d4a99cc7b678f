"""Deterministic hash sampling + vocab building (operators/sampling.py)."""

import pandas as pd

from quadtree_block_compression_spark.operators.sampling import (
    hash_sample, stratified_hash_sample, vocab_topk)


def _docs(spark, n=2000):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n),
        "source": [f"src{i % 4}" for i in range(n)],
        "text": [f"tok{i % 7} tok{i % 3} common" for i in range(n)],
    }))


def test_hash_sample_deterministic_and_calibrated(spark):
    docs = _docs(spark)
    s1 = hash_sample(docs, 0.25, salt="a").toPandas()
    s2 = hash_sample(docs, 0.25, salt="a").toPandas()
    assert sorted(s1.doc_id) == sorted(s2.doc_id)  # rerun-identical
    assert 0.18 <= len(s1) / 2000 <= 0.32          # ±7pp at n=2000
    # different salt decorrelates
    s3 = hash_sample(docs, 0.25, salt="b").toPandas()
    assert sorted(s3.doc_id) != sorted(s1.doc_id)


def test_hash_sample_composes(spark):
    """A narrower sample with the SAME salt is a subset — hash thresholds
    nest, which RNG sampling cannot guarantee."""
    docs = _docs(spark)
    wide = set(hash_sample(docs, 0.5, salt="a").toPandas().doc_id)
    narrow = set(hash_sample(docs, 0.1, salt="a").toPandas().doc_id)
    assert narrow <= wide


def test_stratified_rates(spark):
    docs = _docs(spark)
    out = stratified_hash_sample(
        docs, rates={"src0": 1.0, "src1": 0.2}, strata_col="source",
        default_rate=0.0).toPandas()
    by = out.groupby("source").size()
    assert by.get("src0", 0) == 500          # rate 1.0 keeps everything
    assert 60 <= by.get("src1", 0) <= 140    # ~0.2 of 500
    assert "src2" not in by and "src3" not in by  # default 0 drops


def test_vocab_topk_deterministic_tiebreak(spark):
    docs = _docs(spark)
    out = vocab_topk(docs, k=5).toPandas()
    assert list(out["rank"]) == [1, 2, 3, 4, 5]
    assert out.iloc[0]["token"] == "common" and out.iloc[0]["n"] == 2000
    # ties (equal n) must order by token ascending
    for i in range(1, len(out)):
        prev, cur = out.iloc[i - 1], out.iloc[i]
        assert (prev["n"], cur["n"]) != (cur["n"], prev["n"]) or \
            prev["token"] < cur["token"]
        if prev["n"] == cur["n"]:
            assert prev["token"] < cur["token"]


def test_corpus_stats_exact_quantiles(spark):
    from quadtree_block_compression_spark.operators.sampling import corpus_stats
    # known distribution: one stratum, values 1..100 → p50 rank = floor(99*.5)+1
    # = 50 → value 50; p95 rank = floor(99*.95)+1 = 95 → value 95
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(100), "source": ["s"] * 100,
        "n_chars": list(range(1, 101))}))
    row = corpus_stats(docs).collect()[0]
    assert (row.n_docs, row.total, row.min_v, row.max_v) == (100, 5050, 1, 100)
    assert (row.p50, row.p95) == (50, 95)
    # two-doc stratum: p50 rank = floor(1*0.5)+1 = 1 → the SMALLER value
    tiny = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "source": ["t", "t"], "n_chars": [10, 99]}))
    r = corpus_stats(tiny).collect()[0]
    assert (r.p50, r.p95) == (10, 10)


def test_corpus_stats_skewed_stratum_sorts_histogram_not_rows(spark):
    """VERDICT r3 #5: with one stratum holding 95% of rows, the per-stratum
    window must sort the (stratum, value) HISTOGRAM, never the raw rows —
    exactness preserved, per-task sort bounded by distinct values."""
    from quadtree_block_compression_spark.operators.sampling import corpus_stats
    import numpy as np
    rng = np.random.default_rng(7)
    n_hot, n_cold = 19_000, 1_000  # 95% / 5%
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n_hot + n_cold),
        "source": ["hot"] * n_hot + ["cold"] * n_cold,
        # only 32 distinct values in the dominant stratum
        "n_chars": list(rng.integers(100, 132, n_hot))
                   + list(rng.integers(0, 5000, n_cold))}))
    out = corpus_stats(docs)
    rows = {r.source: r for r in out.collect()}
    assert rows["hot"].n_docs == n_hot and rows["cold"].n_docs == n_cold
    # exactness oracle: pandas-side exact discrete quantile
    pdf = docs.toPandas()
    for src in ("hot", "cold"):
        vals = np.sort(pdf[pdf["source"] == src]["n_chars"].to_numpy())
        n = len(vals)
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            want = int(vals[int(np.floor((n - 1) * q))])
            assert getattr(rows[src], col) == want, (src, col)
    # plan: the Window's subtree aggregates to the value histogram first —
    # the sort input is keys=[source, n_chars], not the raw scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    below = plan[plan.index("Window"):]
    import re
    m = re.search(r"HashAggregate\(keys=\[source[^\]]*n_chars[^\]]*\]", below)
    assert m is not None, below[:800]


def test_weighted_hash_sample_caps_and_proportionality(spark):
    from quadtree_block_compression_spark.operators.sampling import (
        weighted_hash_sample)
    n = 4000
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n),
        # half the corpus at weight 0.2, half at weight 1.0
        "wgt": [0.2 if i % 2 == 0 else 1.0 for i in range(n)]}))
    out = weighted_hash_sample(docs, "wgt", base_rate=0.5, salt="t").toPandas()
    lo = (out["wgt"] < 0.5).sum()
    hi = (out["wgt"] > 0.5).sum()
    # expected: 10% of evens (200), 50% of odds (1000) — hash-uniform ±20%
    assert 140 <= lo <= 260 and 850 <= hi <= 1150
    # deterministic: identical selection on rerun
    out2 = weighted_hash_sample(docs, "wgt", base_rate=0.5, salt="t").toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # cap: weight far above max_weight cannot exceed the capped rate
    heavy = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n), "wgt": [50.0] * n}))
    kept = weighted_hash_sample(heavy, "wgt", base_rate=0.4,
                                max_weight=2.0).count()
    assert kept <= n * 0.8 * 1.15  # capped at base_rate*max_weight = 0.8


def test_mixture_sample_exact_quotas_and_determinism(spark):
    from quadtree_block_compression_spark.operators.sampling import (
        mixture_sample)
    # strata sizes 100 / 300 / 50; targets 1:2:1 (W=4)
    # T = min(100*4//1, 300*4//2, 50*4//1) = min(400, 600, 200) = 200
    # quotas: a=200//4=50, b=2*200//4=100, c=50
    rows = ([("a", i) for i in range(100)]
            + [("b", 1000 + i) for i in range(300)]
            + [("c", 5000 + i) for i in range(50)]
            + [("ignored", 9000 + i) for i in range(40)])
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["stratum", "doc_id"]))
    out = mixture_sample(df, {"a": 1, "b": 2, "c": 1}).toPandas()
    got = out.groupby("stratum")["doc_id"].count().to_dict()
    assert got == {"a": 50, "b": 100, "c": 50}
    assert "ignored" not in set(out["stratum"])
    assert (out.groupby("stratum")["pick_rank"].max()
            == pd.Series({"a": 50, "b": 100, "c": 50})).all()
    # deterministic rerun
    out2 = mixture_sample(df, {"a": 1, "b": 2, "c": 1}).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_mixture_sample_unsatisfiable_and_validation(spark):
    from quadtree_block_compression_spark.operators.sampling import (
        mixture_sample)
    df = spark.createDataFrame(pd.DataFrame(
        {"stratum": ["a"] * 10, "doc_id": range(10)}))
    # target stratum absent from the data -> T = 0 -> empty, not skewed
    assert mixture_sample(df, {"a": 1, "missing": 1}).count() == 0
    import pytest
    with pytest.raises(ValueError):
        mixture_sample(df, {})
    with pytest.raises(ValueError):
        mixture_sample(df, {"a": 0})


def test_leakage_safe_split_groups_never_straddle(spark):
    """Every member of a group gets the group's split (no near-dup pair can
    straddle train/test), labels are deterministic across reruns, the
    three-way fractions land near spec over many groups, and invalid
    fraction specs raise."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F
    from quadtree_block_compression_spark.operators.sampling import (
        leakage_safe_split)
    rows = [(f"d{i:04d}", f"c{i % 400:04d}") for i in range(1200)]
    members = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "component_id"]))
    out = leakage_safe_split(members)
    # one split per group — members inherit it
    straddle = (out.groupBy("component_id")
                .agg(F.countDistinct("split").alias("n"))
                .filter("n > 1").count())
    assert straddle == 0
    # deterministic across invocations
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in leakage_safe_split(members).collect()}
    assert a == b
    # fractions near spec at the GROUP level (400 groups, hash-binomial)
    by = {r.split: r.n for r in
          (out.select("component_id", "split").distinct()
           .groupBy("split").agg(F.count("*").alias("n")).collect())}
    assert set(by) == {"train", "val", "test"}
    assert 0.7 <= by["train"] / 400 <= 0.9
    assert 0.05 <= by["val"] / 400 <= 0.16
    assert 0.05 <= by["test"] / 400 <= 0.16
    # a different salt reshuffles assignments (decorrelated splits)
    c = {(r.doc_id, r.split) for r in
         leakage_safe_split(members, salt="split1").collect()}
    assert a != c
    with pytest.raises(ValueError):
        leakage_safe_split(members, fractions=())
    with pytest.raises(ValueError):
        leakage_safe_split(members, fractions=(("a", 0.7), ("b", 0.4)))
    with pytest.raises(ValueError):
        leakage_safe_split(members, fractions=(("a", -0.1), ("b", 0.5)))


def test_leakage_safe_split_thresholds_round_not_truncate(spark):
    """Thresholds are round(fr·1e6): int(0.7·1e6) is 699999 under IEEE, so
    truncation would misroute any group hashing to exactly 699999 (and
    silently diverge from an oracle computing 700000). Pinned against a
    pure-Python twin of the portable hash over enough groups to make the
    band matter."""
    import hashlib
    import pandas as pd
    from quadtree_block_compression_spark.operators.sampling import (
        leakage_safe_split)
    groups = [f"g{i}" for i in range(3000)]
    members = spark.createDataFrame(
        pd.DataFrame({"doc_id": groups, "component_id": groups}))
    fr = (("train", 0.7), ("val", 0.15), ("test", 0.15))
    got = {r.component_id: r.split
           for r in leakage_safe_split(members, fractions=fr).collect()}

    def h(g):
        return int(hashlib.md5(f"split0:{g}".encode())
                   .hexdigest()[:15], 16) % 1_000_000

    want = {g: ("train" if h(g) < 700_000 else
                "val" if h(g) < 850_000 else "test") for g in groups}
    assert got == want


def test_mixture_sample_integer_strata(spark):
    """r6 (ADVICE r5): mixture_sample must accept a non-string strata
    column (e.g. int bucket ids) — the weights frame's schema mirrors the
    data's strata type instead of hardcoding STRING."""
    import pandas as pd
    from pyspark.sql import functions as F
    from quadtree_block_compression_spark.operators.sampling import (
        mixture_sample)
    pdf = pd.DataFrame({"doc_id": range(60), "stratum": [i % 3 for i in range(60)]})
    df = spark.createDataFrame(pdf)
    out = mixture_sample(df, targets={0: 1, 1: 2}, strata_col="stratum")
    counts = {r.stratum: r.n for r in
              out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    # W=3, n_s=20 each: T = min(20*3/1, 20*3/2) = 30; t_0 = 10, t_1 = 20
    assert counts == {0: 10, 1: 20}
