"""Streaming exact-dedup — a custom stateful operator.

A training-data ingest stream must drop documents whose content was already
seen in any earlier micro-batch. Expressed with
``applyInPandasWithState``: group by content hash, keep one boolean of state
per hash, emit only the first arrival (ties within a batch broken by min
doc_id — deterministic). State is per-key and partitioned by the groupBy
hash, so the operator scales like any keyed aggregation; at 100 TB the state
store is RocksDB behind the same API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.portable_hash import portable_hash64

OUTPUT_SCHEMA = "content_hash long, doc_id long, text string"
STATE_SCHEMA = "seen boolean"


def _emit_first(key, pdf_iter, state: GroupState):
    import pandas as pd
    if state.exists:
        # hash already emitted in an earlier batch — consume & drop
        for _ in pdf_iter:
            pass
        return iter([])
    best = None
    for pdf in pdf_iter:
        cand = pdf.sort_values("doc_id").iloc[0]
        if best is None or cand["doc_id"] < best["doc_id"]:
            best = cand
    state.update((True,))
    out = pd.DataFrame([{"content_hash": key[0], "doc_id": int(best["doc_id"]),
                         "text": best["text"]}])
    return iter([out])


def streaming_dedup_exact(stream_docs: DataFrame) -> DataFrame:
    """stream of (doc_id, text) → stream of first-seen docs per content hash."""
    hashed = stream_docs.withColumn("content_hash", portable_hash64(F.col("text")))
    return (hashed.groupBy("content_hash")
            .applyInPandasWithState(_emit_first, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
