"""Concat-then-split sequence packing (operators/packing.py)."""

import pandas as pd
import pytest


def test_pack_sequences_matches_pandas_replay(spark):
    from quadtree_block_compression_spark.operators.packing import (
        pack_sequences)
    import hashlib
    texts = {i: " ".join(f"w{j}" for j in range(1 + (i * 7) % 23))
             for i in range(200)}
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    budget, n_parts = 16, 4
    out = (pack_sequences(docs, budget=budget, n_parts=n_parts)
           .toPandas().set_index("doc_id").sort_index())

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    exp = pd.DataFrame({
        "doc_id": list(texts),
        "n_tokens": [len(t.split()) for t in texts.values()],
        "part": [h60(str(i)) % n_parts for i in texts]})
    exp = exp.sort_values("doc_id")
    exp["_start"] = (exp.groupby("part")["n_tokens"].cumsum()
                     - exp["n_tokens"])
    exp["pack_id"] = (exp["_start"] // budget) * n_parts + exp["part"]
    exp["pack_offset"] = exp["_start"] % budget
    exp = exp.set_index("doc_id").sort_index()
    for col in ("n_tokens", "part", "pack_id", "pack_offset"):
        assert (out[col] == exp[col]).all(), col

    # invariants: offsets inside the budget; each shard's id-order head
    # starts at (first pack of the shard, offset 0)
    assert (out["pack_offset"] < budget).all()
    heads = out.reset_index().sort_values("doc_id").groupby("part").first()
    assert (heads["pack_id"] == heads.index).all()
    assert (heads["pack_offset"] == 0).all()


def test_pack_sequences_validation(spark):
    from quadtree_block_compression_spark.operators.packing import (
        pack_sequences)
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1], "text": ["a b"]}))
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=8, n_parts=0)
