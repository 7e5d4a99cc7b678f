"""Table sources.

The driver provides TPC-H-ish parquet at ``/root/testdata/sf*`` (TESTDATA.md)
plus ``documents``/``embeddings``; the engine's own ``images``/``geometries``
fixtures are generated (``fixtures``). At production scale these would be
Iceberg tables — the reader keeps format dispatch in one place so swapping
``parquet`` → ``iceberg`` is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in names}
