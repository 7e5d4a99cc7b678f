"""Stateful streaming dedup: cross-micro-batch state via applyInPandasWithState."""

import os
import time

from pyspark.sql import functions as F


def test_streaming_dedup_across_batches(spark, tmp_path):
    from quadtree_block_compression_spark.streaming.dedup_stream import streaming_dedup_exact

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "doc_id long, text string"

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    # batch 1: two unique docs + an in-batch duplicate pair
    write_batch([(1, "alpha"), (2, "beta"), (3, "alpha")], "b1")

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_dedup_exact(stream)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    q.processAllAvailable()

    # batch 2: re-sends "alpha" and "beta", adds one new doc
    write_batch([(4, "alpha"), (5, "gamma"), (6, "beta")], "b2")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from dedup_out").collect()
    emitted = {r.text: r.doc_id for r in rows}
    # every text emitted exactly once, first doc_id wins (in-batch tie → min id)
    assert len(rows) == 3
    assert emitted == {"alpha": 1, "beta": 2, "gamma": 5}
