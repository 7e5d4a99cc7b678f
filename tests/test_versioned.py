"""Iceberg-lite versioned tables: manifest-published snapshots, time travel,
snapshot-pinned schema (sources/tables.py)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from quadtree_block_compression_spark.sources.tables import (
    read_versioned, table_versions, write_versioned)


def _df(spark, ids):
    return spark.createDataFrame(
        pd.DataFrame({"k": list(ids), "v": [i * 10 for i in ids]}))


def test_append_overwrite_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    assert table_versions(path) == []
    assert write_versioned(_df(spark, [1, 2, 3]), path) == 1
    assert write_versioned(_df(spark, [4, 5]), path, mode="append") == 2
    assert write_versioned(_df(spark, [9]), path, mode="overwrite") == 3
    assert table_versions(path) == [1, 2, 3]
    # latest = the overwrite
    assert sorted(r.k for r in read_versioned(spark, path).collect()) == [9]
    # every past snapshot still reads exactly as committed
    assert sorted(r.k for r in
                  read_versioned(spark, path, 1).collect()) == [1, 2, 3]
    assert sorted(r.k for r in
                  read_versioned(spark, path, 2).collect()) == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        read_versioned(spark, path, 7)
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError):
        write_versioned(_df(spark, [1]), path, mode="merge")


def test_unpublished_files_invisible(spark, tmp_path):
    """A data file with no manifest entry (crashed writer, stray copy) is
    never scanned — visibility is decided ONLY by the published manifest."""
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark, [1, 2]), path)
    # orphan: a whole unpublished snapshot directory
    _df(spark, [99]).write.parquet(os.path.join(path, "data", "s999"))
    # stray file inside a PUBLISHED snapshot dir, added after the commit
    _df(spark, [98]).toPandas().to_parquet(
        os.path.join(path, "data", "s1", "stray.parquet"))
    assert sorted(r.k for r in read_versioned(spark, path).collect()) == [1, 2]


def test_schema_pinned_per_snapshot(spark, tmp_path):
    """A later snapshot may add a column; reading the OLD snapshot yields
    the OLD schema (no leakage of future columns), and the new snapshot
    carries the widened one."""
    path = str(tmp_path / "tbl")
    write_versioned(_df(spark, [1]), path)
    widened = _df(spark, [2]).withColumn("extra", F.lit("x"))
    write_versioned(widened, path, mode="overwrite")
    old = read_versioned(spark, path, 1)
    assert old.columns == ["k", "v"]
    assert [r.k for r in old.collect()] == [1]
    new = read_versioned(spark, path, 2)
    assert new.columns == ["k", "v", "extra"]


def test_empty_snapshot_reads_with_schema(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(spark.createDataFrame([], "k long, v long"), path)
    out = read_versioned(spark, path)
    assert out.columns == ["k", "v"] and out.count() == 0
