"""quadtree_block_compression_spark — a PySpark-native spatial tiling + join engine.

A from-scratch re-expression of the capabilities of
``xaverhimmelsbach/quadtree-block-compression`` (a single-node Go image codec,
see /root/reference) as a distributed PySpark engine:

* quadtree tile assignment over an ``images`` table (mapInPandas, one pass,
  zero shuffles — the Go recursion `pkg/quadtreeImage/quadtreeElement.go:80-139`
  becomes per-image vectorized numpy inside Arrow batches),
* exact + near block dedup (joins/windows instead of the reference's
  mutex-guarded global list, `quadtreeElement.go:176-221`),
* a spatial layer (Z-order cell keys, point-in-polygon broadcast join,
  salted shuffle join for hot cells, kNN via cell-ring expansion),
* checkpoint-resumable stages with per-partition lineage rows,
* a training-data ops layer (text dedup, quality scoring, ANN search).

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` wherever
expressible, Arrow-vectorized pandas UDFs for pixel math, no per-row Python.
"""

__version__ = "0.1.0"

BLOCK_SIZE = 8   # reference: pkg/quadtreeImage/constants.go:4
CHILD_COUNT = 4  # reference: pkg/quadtreeImage/constants.go:5
