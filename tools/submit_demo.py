"""spark-submit entrypoint — proves the engine runs via the north rule's
invocation shape:

    python tools/make_pyfiles.py               # builds dist/qbcs.zip
    spark-submit --master 'local[8]' \\
        --py-files dist/qbcs.zip tools/submit_demo.py

The job: deterministic images → tile assignment → reassembly fidelity →
prints a one-line JSON summary.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    spark = (SparkSession.builder.appName("qbcs-submit-demo").getOrCreate())
    from quadtree_block_compression_spark.fixtures.images import generate_images
    from quadtree_block_compression_spark.operators.reassembly import roundtrip_report

    images = generate_images(spark, 24, seed=42, partitions=8, max_side=128)
    rep = roundtrip_report(images)
    row = rep.agg(F.count("*").alias("images"),
                  F.sum("n_blocks").alias("blocks"),
                  F.min("psnr").alias("min_psnr"),
                  F.sum((~F.col("caption_ok")).cast("int")).alias("caption_violations")
                  ).collect()[0]
    print(json.dumps({"images": row.images, "blocks": int(row.blocks),
                      "min_psnr": round(row.min_psnr, 2),
                      "caption_violations": int(row.caption_violations)}))
    spark.stop()


if __name__ == "__main__":
    main()
