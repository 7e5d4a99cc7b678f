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


def load_images_binary_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """Loose image files → the images-table shape (reference S1: the codec's
    file-path input, ``pkg/utils/ioUtils.go:16-24``). Uses Spark's
    ``binaryFile`` source; width/height/fmt are decoded in one Arrow pass,
    captions default empty (loose files carry none)."""
    from pyspark.sql import functions as F

    raw = (spark.read.format("binaryFile").load(glob_path)
           .select(F.col("path"), F.col("content").alias("bytes")))

    def meta(batches):
        import pandas as pd
        from ..kernels.codecs import decode_image, PNG_SIG, QJX_SIG, RAW_SIG
        from ..kernels.phash import phash64
        for pdf in batches:
            out = []
            for path, data in zip(pdf["path"], pdf["bytes"]):
                data = bytes(data)
                img = decode_image(data)
                fmt = ("png" if data[:8] == PNG_SIG else
                       "jpeg" if data[:4] == QJX_SIG else
                       "raw" if data[:4] == RAW_SIG else "unknown")
                out.append((path.rsplit("/", 1)[-1], data, img.shape[1],
                            img.shape[0], fmt, "", int(phash64(img))))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h",
                                             "fmt", "caption", "phash"])

    return raw.mapInPandas(meta, "image_id string, bytes binary, w int, h int, "
                                 "fmt string, caption string, phash long")
