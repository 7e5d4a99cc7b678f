"""Scan-parallelism guard for per-row-heavy operators.

A small table often arrives as one parquet file → one scan partition, so an
explode/regex/shingle projection runs on a single core no matter how many
the cluster has (measured 4× on the sf0.1 documents table: the whole
shingle build serialized behind a 594 KB single-file scan). At real scale
the scan has thousands of splits and this is a no-op — ``spread`` only
repartitions when the plan's partition count is below the session's
default parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_parts`` (default: the
    session's ``defaultParallelism``) iff it currently has fewer partitions.
    Content-deterministic: Spark's round-robin repartition locally sorts for
    retry determinism, and every consumer here is order-insensitive."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
