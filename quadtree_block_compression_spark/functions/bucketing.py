"""Degenerate-group guards shared by the banded dedup/ANN tiers."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cap_by_key(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Drop rows whose key-group exceeds ``cap`` members — the web-scale
    guard against degenerate groups squaring inside a self-join (a group of
    d members contributes d²/2 candidate pairs).

    Hash aggregate over the key + join against the surviving key list;
    measured 2.5× faster than the equivalent window count at bench scale
    (WindowExec sort-buffers every group, the aggregate+join pipelines).
    Callers persist the CAPPED result so the cap computes once, not per
    consumer.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_grp_n"))
    return df.join(counts.where(F.col("_grp_n") <= cap).select(*keys), keys)
