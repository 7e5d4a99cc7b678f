"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quadtree round-trip; ``queries()`` maps
every implemented operator (SURVEY.md §2 + the training-data ops layer) to a
(spark, sf_dir) callable; ``oracle_sql()`` carries the DuckDB twin for every
SQL-expressible operator. Hash-dependent operators share a *portable* 60-bit
md5 hash and seeded MinHash permutation constants so Spark and DuckDB compute
bit-identical values (see ``functions/portable_hash.py``).

Quadtree/pixel operators (tile assignment, round-trip, block dedup, image
features) are genuinely non-SQL-expressible — they run on this repo's
deterministic synthetic images table (BASELINE.json input_hint schema) and
get rows-only checks, as the contract allows.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

from quadtree_block_compression_spark.functions.portable_hash import (
    PERMS_16, MINHASH_PRIME, portable_hash64_sql)

# ---------------------------------------------------------------- helpers --

# pseudo-coordinate affine shared by the spatial queries and their oracles:
# deterministic integer points in the engine's [0, 2^20) world frame.
_W = 1 << 20
_PX = 48271
_PY = 69621
_RES = 8

_NGRAM_N = 3
_JACCARD_T = 0.01
_NUM_PERM = 8
_BANDS = 4
# document-frequency cap for the shingle self-join: a shingle present in d
# docs contributes d²/2 candidate pairs, so the graded plan always runs with
# the cap ACTIVE (ubiquitous boilerplate shingles are dropped at web scale)
_MAX_DF = 100
# same hazard class for the LSH band buckets and SimHash segment buckets:
# a degenerate bucket squares inside the self-join, so the graded plans cap
# bucket size (mirrored in the oracles)
_MAX_BUCKET = 100


def _tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in names]


def _fixture_images(spark: SparkSession, n: int = 16):
    from quadtree_block_compression_spark.fixtures.images import images_pandas
    return spark.createDataFrame(images_pandas(n, seed=42, max_side=128))


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic points from customer keys, shaped for the spatial ops
    (image_id/tile_id are the point identity columns)."""
    from quadtree_block_compression_spark.operators.spatial_join import block_centroids  # noqa
    from pyspark.sql.pandas.functions import pandas_udf

    from quadtree_block_compression_spark.functions.parallelism import spread

    # spread: customer.parquet is a ~3 MB scan (2 splits at sf1), so the
    # cell-encode UDF and every downstream PIP/kNN join would otherwise run
    # on 2 of 32 cores (r6 finding, CLAUDE spread invariant)
    cust = spread(spark.read.parquet(f"{sf_dir}/customer.parquet"))
    pts = cust.select(
        F.col("c_custkey").cast("string").alias("image_id"),
        F.lit("").alias("tile_id"),
        ((F.col("c_custkey") * _PX) % _W).cast("double").alias("wx"),
        ((F.col("c_custkey") * _PY) % _W).cast("double").alias("wy"))

    @pandas_udf("long")
    def cell_of(wx, wy):  # type: ignore[misc]
        import pandas as pd
        from quadtree_block_compression_spark.kernels.geometry import cell_encode
        return pd.Series(cell_encode(wx.to_numpy(dtype=float),
                                     wy.to_numpy(dtype=float), _RES))

    # asNondeterministic (guide §4.4, r6): the optimizer pushes a
    # deterministic Python projection below the spread() repartition, so
    # the ArrowEvalPython ran on the customer scan's 2 raw splits (the
    # committed before-plan shows ArrowEvalPython directly over the scan,
    # under the Exchange). cell_of IS value-deterministic — the marker only
    # forbids the reorder, keeping the UDF above the exchange on all cores.
    return pts.withColumn("cell", cell_of.asNondeterministic()("wx", "wy"))


def _nation_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CCW triangles from nation keys (oracle-replicable;
    vertex offsets chosen so no test point ever lies exactly on an edge)."""
    import numpy as np
    import pandas as pd
    from quadtree_block_compression_spark.kernels.geometry import polygon_cover

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey").collect()
    rows = []
    for r in nat:
        n = int(r.n_nationkey)
        ax = (n * 7121 + 103) % _W + 0.5
        ay = (n * 9377 + 59) % _W + 0.5
        bx, by = ax + 40000 + (n % 5) * 30000, ay + 5000 + (n % 3) * 5000
        cx, cy = ax + 5000 + (n % 7) * 5000, ay + 60000 + (n % 3) * 25000
        vx = np.array([ax, bx, cx]); vy = np.array([ay, by, cy])
        rows.append({"geom_id": f"tri_{n:05d}", "kind": "convex",
                     "vx": vx.tolist(), "vy": vy.tolist(),
                     "cell_keys": polygon_cover(vx, vy, _RES).tolist(),
                     "is_hot": False})
    return spark.createDataFrame(pd.DataFrame(rows))


_TRI_SQL = f"""
  SELECT 'tri_' || lpad(CAST(n_nationkey AS VARCHAR), 5, '0') AS geom_id,
         (CAST(n_nationkey AS BIGINT)*7121+103) % {_W} + 0.5 AS ax,
         (CAST(n_nationkey AS BIGINT)*9377+59) % {_W} + 0.5 AS ay,
         (CAST(n_nationkey AS BIGINT)*7121+103) % {_W} + 0.5 + 40000 + (n_nationkey % 5)*30000 AS bx,
         (CAST(n_nationkey AS BIGINT)*9377+59) % {_W} + 0.5 + 5000 + (n_nationkey % 3)*5000 AS by,
         (CAST(n_nationkey AS BIGINT)*7121+103) % {_W} + 0.5 + 5000 + (n_nationkey % 7)*5000 AS cx,
         (CAST(n_nationkey AS BIGINT)*9377+59) % {_W} + 0.5 + 60000 + (n_nationkey % 3)*25000 AS cy
  FROM nation
"""


def _nation_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rect polygons from nation keys (oracle-replicable)."""
    import numpy as np
    import pandas as pd
    from quadtree_block_compression_spark.kernels.geometry import polygon_cover

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey").collect()
    rows = []
    for r in nat:
        n = int(r.n_nationkey)
        cx = (n * _PX * 7919 + 12345) % _W
        cy = (n * _PY * 104729 + 54321) % _W
        hw = 30000 + (n % 7) * 20000
        hh = 30000 + (n % 5) * 25000
        x0, x1 = cx - hw - 0.5, cx + hw + 0.5
        y0, y1 = cy - hh - 0.5, cy + hh + 0.5
        vx = np.array([x0, x1, x1, x0]); vy = np.array([y0, y0, y1, y1])
        rows.append({"geom_id": f"poly_{n:05d}", "kind": "rect",
                     "vx": vx.tolist(), "vy": vy.tolist(),
                     "cell_keys": polygon_cover(vx, vy, _RES).tolist(),
                     "is_hot": False})
    return spark.createDataFrame(pd.DataFrame(rows))


_RECT_SQL = f"""
  SELECT 'poly_' || lpad(CAST(n_nationkey AS VARCHAR), 5, '0') AS geom_id,
         (CAST(n_nationkey AS BIGINT) * {_PX} * 7919 + 12345) % {_W} AS cx,
         (CAST(n_nationkey AS BIGINT) * {_PY} * 104729 + 54321) % {_W} AS cy,
         30000 + (n_nationkey % 7) * 20000 AS hw,
         30000 + (n_nationkey % 5) * 25000 AS hh
  FROM nation
"""

_POINT_SQL = f"""
  SELECT CAST(c_custkey AS VARCHAR) AS point_id,
         CAST((c_custkey * {_PX}) % {_W} AS DOUBLE) AS px,
         CAST((c_custkey * {_PY}) % {_W} AS DOUBLE) AS py
  FROM customer
"""


def _strip_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rects over the mosaic strip the 16 fixture images
    occupy (wx ∈ [0, 16·16384), wy ∈ [0, 16384)) — the geometry side of the
    blocks→polygon join. Half-integer bounds: block centroids are integer
    multiples of 64 (the affine divides powers of two), so no centroid can
    sit on a rect boundary."""
    import numpy as np
    import pandas as pd
    from quadtree_block_compression_spark.kernels.geometry import polygon_cover

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey").collect()
    rows = []
    for r in nat:
        n = int(r.n_nationkey)
        cx = (n * 9973 + 777) % (16 * 16384)
        cy = (n * 613 + 450) % 16384
        hw = 3000 + (n % 5) * 4000
        hh = 1500 + (n % 4) * 1500
        x0, x1 = cx - hw - 0.5, cx + hw + 0.5
        y0, y1 = cy - hh - 0.5, cy + hh + 0.5
        vx = np.array([x0, x1, x1, x0]); vy = np.array([y0, y0, y1, y1])
        rows.append({"geom_id": f"strip_{n:05d}", "kind": "rect",
                     "vx": vx.tolist(), "vy": vy.tolist(),
                     "cell_keys": polygon_cover(vx, vy, _RES).tolist(),
                     "is_hot": False})
    return spark.createDataFrame(pd.DataFrame(rows))


_STRIP_RECT_SQL = """
  SELECT 'strip_' || lpad(CAST(n_nationkey AS VARCHAR), 5, '0') AS geom_id,
         (CAST(n_nationkey AS BIGINT) * 9973 + 777) % 262144 AS cx,
         (CAST(n_nationkey AS BIGINT) * 613 + 450) % 16384 AS cy,
         3000 + (n_nationkey % 5) * 4000 AS hw,
         1500 + (n_nationkey % 4) * 1500 AS hh
  FROM nation
"""

def _shingle_sql(src: str = "documents") -> str:
    """Shingle CTE body over ``src`` (a table or CTE name) — parametrized so
    the incremental-dedup oracle can shingle a corpus∪batch union."""
    return f"""
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(arr) - {_NGRAM_N} + 1, 0) + 1),
                  i -> array_to_string(arr[i:i + {_NGRAM_N - 1}], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr FROM {src})
  ) WHERE length(shingle) > 0
"""


_SHINGLE_SQL = _shingle_sql()


def _minhash_sql_select() -> str:
    cols = []
    for i in range(_NUM_PERM):
        a, b = PERMS_16[i]
        cols.append(f"min(CAST((CAST(h AS HUGEINT) * {a} + {b}) % {MINHASH_PRIME} "
                    f"AS BIGINT)) AS mh{i}")
    return ", ".join(cols)


def _minhash_sig_sql(src: str = "documents") -> str:
    return f"""
  WITH sh AS ({_shingle_sql(src)}),
  hashed AS (SELECT doc_id, {portable_hash64_sql('shingle')} AS h FROM sh)
  SELECT doc_id, {_minhash_sql_select()} FROM hashed GROUP BY doc_id
"""


_MINHASH_SIG_SQL = _minhash_sig_sql()

# full minhash-LSH pair statement — the `minhash_lsh_pairs` oracle, and the
# edge list the `dedup_components` recursive-CTE oracle builds on
_minhash_pairs_sql = f"""
    WITH sig AS ({_MINHASH_SIG_SQL}),
    bucketed0 AS (
      SELECT DISTINCT doc_id, band, key FROM (
        SELECT doc_id, 0 AS band, {portable_hash64_sql("CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)")} AS key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band, {portable_hash64_sql("CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)")} AS key FROM sig
        UNION ALL
        SELECT doc_id, 2 AS band, {portable_hash64_sql("CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)")} AS key FROM sig
        UNION ALL
        SELECT doc_id, 3 AS band, {portable_hash64_sql("CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR)")} AS key FROM sig)),
    -- mirrors max_bucket={_MAX_BUCKET}: degenerate band buckets are
    -- dropped before the self-join on both engines
    bucketed AS (
      SELECT b.* FROM bucketed0 b
      JOIN (SELECT band, key FROM bucketed0
            GROUP BY band, key HAVING count(*) <= {_MAX_BUCKET}) s
        USING (band, key)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bucketed a JOIN bucketed b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    shv AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shv GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN shv a ON a.doc_id = c.doc_a
      JOIN shv b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i / (sa.sz + sb.sz - i) >= {_JACCARD_T}
"""

# ---- hyperplane-LSH constants, shared by ann.py and the DuckDB oracles ----

_LSH_DIM = 64
_LSH_GATE_N = 500  # embeddings rows at the sf0.01 correctness gate
_LSH_PLANES = 8   # gate-SF value: auto_num_planes(500, target_bucket) == 8
                  # for BOTH tiers' targets (near-dup 32, top-k 128)
_LSH_MAX_BUCKET = 100  # near-dup degenerate-bucket cap, mirrored in oracles
# top-k tier: recall wants bigger buckets (target 128 → recall@10 0.77 at
# sf0.1 vs 0.48 at target 32 — tools/ann_quality.py) while candidates stay
# ~2·(half+1)·128 per query at ANY n; the cap only exists for degenerate keys
_LSH_TOPK_TARGET = 128
_LSH_TOPK_MAX_BUCKET = 512
_NEAR_DUP_COS = 0.35
# IVF list count at the gate SF: auto_n_clusters(500) == isqrt(500) == 22
# (√n lists — the oracle's unrolled Lloyd build embeds this constant, and
# ann_ivf_topk fails loudly if the live derivation ever drifts from it)
_IVF_CLUSTERS = 22


# unit-vector + single-fold cosine, mirroring ann._unit/_dot: normalize once
# per vector, dot once per pair (the Spark HOF folds are interpreted, so the
# one-fold form is also the engine's fast path)
_UNIT_SQL = ("list_transform({v}, x -> x / greatest(sqrt(list_sum("
             "list_transform({v}, y -> y * y))), 1e-12))")
_NDOT_SQL = ("round(list_sum(list_transform(range(1, {d} + 1), "
             "i -> {a}[i] * {b}[i])), 6)")


def _lsh_keyed_sql() -> str:
    """DuckDB CTE body computing per-vector LSH bucket keys k1/k2 with the
    SAME ±1 hyperplanes as ``ann.hyperplane_signs`` (embedded literals) and
    the same half-signature split as ``ann.cosine_topk_lsh``. Bucket bits
    are projections of the RAW vector; ``vn`` carries the unit vector for
    the verify stage, exactly like the Spark plan.

    The base CTE carries an ``error()`` guard (ADVICE r3): the embedded
    plane set is ``auto_num_planes(n)`` evaluated at the sf0.01 gate
    (n=500), while the Spark side derives it from the LIVE count — at any
    other SF the two bucketings differ, so instead of an opaque hash
    mismatch the oracle fails fast with the reason."""
    from quadtree_block_compression_spark.operators.ann import hyperplane_signs

    planes = hyperplane_signs(_LSH_PLANES, _LSH_DIM)
    bits = []
    for p, signs in enumerate(planes):
        lits = ", ".join(f"{s:.1f}" for s in signs)
        bits.append(
            f"CASE WHEN list_sum(list_transform(range(1, {_LSH_DIM + 1}), "
            f"i -> v[i] * (CAST([{lits}] AS DOUBLE[]))[i])) >= 0 "
            f"THEN 1 ELSE 0 END AS b{p}")
    half = _LSH_PLANES // 2

    def key(lo: int, hi: int) -> str:
        expr = "0"
        for i in range(lo, hi):
            expr = f"({expr}) * 2 + b{i}"
        return expr

    return f"""
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE CASE WHEN (SELECT count(*) FROM embeddings) = {_LSH_GATE_N}
                       THEN TRUE
                       ELSE error('LSH oracle only valid at the sf0.01 gate '
                                  || '(n={_LSH_GATE_N}): its {_LSH_PLANES} embedded '
                                  || 'hyperplanes are auto_num_planes(n) at that '
                                  || 'size, and the Spark side derives the count '
                                  || 'from the live table') END),
      sg AS (SELECT vec_id, v, {', '.join(bits)} FROM e),
      kb AS (SELECT vec_id, {_UNIT_SQL.format(v='v')} AS vn,
                    {key(0, half)} AS k1,
                    {key(half, _LSH_PLANES)} AS k2 FROM sg)
    """

# ---- frozen pixel-kernel fixtures (tests/golden, tools/make_golden.py) ----
#
# The quadtree kernel itself is not SQL-expressible, but its deterministic
# output over the seed-42 fixture images IS a table. That table is frozen as
# a committed parquet (regenerated only with an intentional kernel-semantics
# change, in the same commit — see CLAUDE.md), so DuckDB can run the
# *downstream relational semantics* (dedup election, window predicates,
# extremes) against it. The driver gate then catches any kernel drift AND any
# divergence in the Spark-side relational plan.

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_BLOCKS_GOLDEN = os.path.join(_REPO_DIR, "tests", "golden",
                              "blocks_golden.parquet", "*.parquet")
_SIZES_GOLDEN = os.path.join(_REPO_DIR, "tests", "golden",
                             "block_sizes_golden.parquet", "*.parquet")
_NEAR_DEDUP_SNAP = os.path.join(_REPO_DIR, "tests", "golden", "snapshots",
                                "block_near_dedup.parquet", "*.parquet")


def _ivf_sql(n_clusters: int = 16, nprobe: int = 6, iters: int = 3,
             k: int = 5, dim: int = 64) -> str:
    """DuckDB replication of ``ann.cosine_topk_ivf``'s deterministic build:
    seeds = the n_clusters lowest-id vectors, then ``iters`` unrolled Lloyd
    steps (argmax-cosine assignment with lowest-cluster tie-break, raw-vector
    per-dim means, renormalize, empty clusters keep their previous centroid),
    probe the ``nprobe`` nearest centroids per query, exact cosine top-k over
    the probed inverted lists. Float-safe: measured assignment/probe margins
    on this data are ~2e-4, eleven orders above cross-engine summation noise.
    """
    def dot(a: str, b: str) -> str:
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> {a}[i] * {b}[i]))")

    def norm(a: str) -> str:
        return f"greatest(sqrt(list_sum(list_transform({a}, x -> x * x))), 1e-12)"

    def normalize(a: str) -> str:
        return f"list_transform({a}, x -> x / {norm(a)})"

    def assign(src: str, cen: str) -> str:
        return f"""(
          SELECT vec_id, cluster FROM (
            SELECT en.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY en.vec_id
                        ORDER BY {dot('en.vn', 'c.c')} DESC, c.cluster) AS rn
            FROM en, {cen} c) WHERE rn = 1)"""

    def update(a: str, cen_prev: str) -> str:
        return f"""(
          WITH means AS (
            SELECT a.cluster, i.i AS pos, avg(e2.v[i.i]) AS m
            FROM {a} a JOIN e e2 USING (vec_id), range(1, {dim + 1}) i(i)
            GROUP BY a.cluster, i.i),
          vecs AS (
            SELECT cluster, list(m ORDER BY pos) AS raw FROM means GROUP BY cluster)
          SELECT c0.cluster,
                 CASE WHEN v.cluster IS NULL THEN c0.c
                      ELSE {normalize('v.raw')} END AS c
          FROM {cen_prev} c0 LEFT JOIN vecs v USING (cluster))"""

    ctes = [f"""
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE CASE WHEN (SELECT count(*) FROM embeddings) = {_LSH_GATE_N}
                       THEN TRUE
                       ELSE error('IVF oracle only valid at the sf0.01 gate '
                                  || '(n={_LSH_GATE_N}): its {n_clusters}-cluster '
                                  || 'Lloyd build is auto_n_clusters(n) at that '
                                  || 'size, and the Spark side derives the count '
                                  || 'from the live table') END),
      en AS (SELECT vec_id, v, {normalize('v')} AS vn FROM e),
      cen0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
               {normalize('v')} AS c
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {n_clusters}))"""]
    for it in range(iters):
        ctes.append(f"a{it} AS {assign('en', f'cen{it}')}")
        ctes.append(f"cen{it + 1} AS {update(f'a{it}', f'cen{it}')}")
    final_cen = f"cen{iters}"
    ctes.append(f"afinal AS {assign('en', final_cen)}")
    ctes.append(f"""
      q AS (SELECT vec_id AS q_id, v AS qv, vn AS qn FROM en WHERE vec_id < 10),
      probes AS (
        SELECT q_id, cluster FROM (
          SELECT q.q_id, c.cluster,
                 row_number() OVER (PARTITION BY q.q_id
                      ORDER BY {dot('q.qn', 'c.c')} DESC, c.cluster) AS rn
          FROM q, {final_cen} c) WHERE rn <= {nprobe}),
      cand AS (
        SELECT DISTINCT p.q_id, a.vec_id
        FROM probes p JOIN afinal a USING (cluster)
        WHERE a.vec_id <> p.q_id),
      scored AS (
        -- unit-vector single-fold cosine, mirroring ann._unit/_dot
        SELECT c.q_id, c.vec_id,
               round({dot('ev.vn', 'eq.vn')}, 6) AS cos
        FROM cand c
        JOIN en ev ON ev.vec_id = c.vec_id
        JOIN en eq ON eq.vec_id = c.q_id)""")
    return f"""
      WITH {', '.join(ctes)}
      SELECT q_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS INT) AS rank
      FROM scored QUALIFY rank <= {k}
    """


def _snapshot_sql(name: str, invariant: str | None = None) -> str:
    """Oracle for a pure-function-of-fixture pixel query: replay its frozen
    committed output (tools/make_snapshots.py — regenerated only with an
    intentional kernel change). Kernel drift → driver-visible hash fail.

    Replay alone pins determinism but would also replay a bug frozen into
    the snapshot (ADVICE r2), so each oracle ANDs an ``invariant`` —
    a predicate derivable WITHOUT the pixel kernels (fixture-constant
    dims, quadtree leaf-count arithmetic, PCM algebra). A snapshot row
    violating it drops out → driver-visible rows mismatch."""
    path = os.path.join(_REPO_DIR, "tests", "golden", "snapshots",
                        f"{name}.parquet", "*.parquet")
    base = f"SELECT * FROM read_parquet('{path}')"
    return f"{base} WHERE {invariant}" if invariant else base


def _fixture_dims_values(n: int) -> str:
    """(image_id, w, h) VALUES rows for the first ``n`` fixture images —
    independent constants from the metadata-only generator view (per-row
    RNG size draws replayed; NO pixel synthesis or encoding on the oracle
    side — ADVICE r3)."""
    from quadtree_block_compression_spark.fixtures.images import images_meta_pandas
    pdf = images_meta_pandas(n, seed=42, max_side=128)
    return ", ".join(f"('{r.image_id}', {int(r.w)}, {int(r.h)})"
                     for r in pdf.itertuples())


def _components_prefix_sql() -> str:
    """The norm -> exact-dedup -> shingle -> MinHash-LSH -> Jaccard-edges
    -> recursive-components CTE chain shared VERBATIM by the
    corpus_clean_components / dedup_elect_quality / corpus_split oracles
    (each appends its own election/split tail). One definition so a
    semantics change (cap, threshold, band count) cannot silently
    diverge between the three. Interpolate after WITH RECURSIVE."""
    return f"""norm AS (
              SELECT doc_id, text,
                     trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                         '\\s+', ' ', 'g')) AS n
              FROM documents),
            ann AS (
              SELECT doc_id, text, {portable_hash64_sql('n')} AS fingerprint FROM norm),
            exact AS (
              SELECT * FROM (
                SELECT doc_id, text, fingerprint,
                       row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
                FROM ann) WHERE rn = 1),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(arr) - {_NGRAM_N} + 1, 0) + 1),
                              i -> array_to_string(arr[i:i + {_NGRAM_N - 1}], ' '))) AS shingle
                FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr FROM exact)
              ) WHERE length(shingle) > 0),
            hashed AS (SELECT doc_id, {portable_hash64_sql('shingle')} AS h FROM sh),
            sig AS (SELECT doc_id, {_minhash_sql_select()} FROM hashed GROUP BY doc_id),
            bucketed0 AS (
              SELECT DISTINCT doc_id, band, key FROM (
                SELECT doc_id, 0 AS band, {portable_hash64_sql("CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band, {portable_hash64_sql("CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 2 AS band, {portable_hash64_sql("CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 3 AS band, {portable_hash64_sql("CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR)")} AS key FROM sig)),
            bucketed AS (
              SELECT b.* FROM bucketed0 b
              JOIN (SELECT band, key FROM bucketed0
                    GROUP BY band, key HAVING count(*) <= {_MAX_BUCKET}) s
                USING (band, key)),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bucketed a JOIN bucketed b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS i
              FROM cand c
              JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
              GROUP BY 1, 2),
            edges AS (
              SELECT doc_a AS x, doc_b AS y FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE i / (sa.sz + sb.sz - i) >= 0.5),
            sym AS (SELECT x, y FROM edges UNION SELECT y, x FROM edges),
            reach(src, node) AS (
              SELECT doc_id, doc_id FROM exact
              UNION
              SELECT r.src, e.y FROM reach r JOIN sym e ON e.x = r.node),
            comp AS (SELECT src AS doc_id, min(node) AS component_id
                     FROM reach GROUP BY src),"""


def _caption_rows(n: int) -> list:
    """(i, image_id, sql-escaped caption) triples for the first ``n``
    fixture images — ONE generator behind both VALUES helpers so escaping
    and fixture params cannot silently diverge between the caption
    oracles."""
    from quadtree_block_compression_spark.fixtures.images import images_meta_pandas
    pdf = images_meta_pandas(n, seed=42, max_side=128)
    return [(i, r.image_id, r.caption.replace("'", "''"))
            for i, r in enumerate(pdf.itertuples())]


def _caption_values_indexed(n: int) -> str:
    """(i, image_id, caption) VALUES rows — generator ORDER carried as an
    explicit index so an oracle can slice "the first 8" / "rows 4..11"
    without assuming id sort order equals generation order."""
    return ", ".join(f"({i}, '{img}', '{cap}')"
                     for i, img, cap in _caption_rows(n))


def _caption_values(n: int) -> str:
    """(image_id, caption) VALUES rows — unindexed projection of the same
    generator."""
    return ", ".join(f"('{img}', '{cap}')"
                     for _, img, cap in _caption_rows(n))


def _phash_fixture_ids_values() -> str:
    """(image_id) VALUES rows for the 20-row seeded phash fixture
    (16 metadata-only fixture ids + the 4 deterministic near-dup extras
    _phash_images seeds) — the node set for the image-cluster oracle."""
    from quadtree_block_compression_spark.fixtures.images import images_meta_pandas
    pdf = images_meta_pandas(16, seed=42, max_side=128)
    ids = list(pdf["image_id"])
    extras = [ids[0] + "_copy"] + [ids[i] + "_v2" for i in (2, 7, 11)]
    return ", ".join(f"('{i}')" for i in ids + extras)


def _phash_fixture_caption_values() -> str:
    """(image_id, caption) VALUES rows for the 20-row seeded phash fixture —
    base captions are generator metadata constants; the 4 extras carry their
    source row's caption verbatim, mirroring ``_phash_images`` exactly."""
    from quadtree_block_compression_spark.fixtures.images import images_meta_pandas
    pdf = images_meta_pandas(16, seed=42, max_side=128)
    rows = list(zip(pdf["image_id"], pdf["caption"]))
    by_id = dict(rows)
    ids = list(pdf["image_id"])
    extras = ([(ids[0] + "_copy", by_id[ids[0]])]
              + [(ids[i] + "_v2", by_id[ids[i]]) for i in (2, 7, 11)])
    return ", ".join("('{}', '{}')".format(i, c.replace("'", "''"))
                     for i, c in rows + extras)


def _versioned_values(lo: int, hi: int) -> str:
    """(image_id, w, h, caption) VALUES rows [lo, hi) of the versioned-table
    gates' fixture (pure generator constants, no pixel synthesis)."""
    from quadtree_block_compression_spark.fixtures.images import images_meta_pandas
    pdf = images_meta_pandas(hi, seed=42, max_side=128).iloc[lo:]
    return ", ".join(
        "('{}', {}, {}, '{}')".format(r.image_id, int(r.w), int(r.h),
                                      r.caption.replace("'", "''"))
        for r in pdf.itertuples())


def _versioned_v1_values() -> str:
    """Snapshot-1 rows (first 8 fixture meta rows) of the versioned gate."""
    return _versioned_values(0, 8)


def _boilerplate_fixture() -> list[tuple[int, list[str]]]:
    """(doc_id, lines) for the boilerplate-removal gate — pure constants
    exercising every semantic edge: case-variant boilerplate (normalization
    merges them), padded boilerplate (trim matches, the padded original is
    what gets removed), blank lines (always kept), in-document repetition
    (df counts DISTINCT docs → kept), and one all-boilerplate document
    (clean_text must go empty, not null)."""
    B0 = "Subscribe to our newsletter!"
    B1 = "ALL RIGHTS RESERVED"
    B2 = "This site uses cookies."
    docs: list[tuple[int, list[str]]] = []
    for d in range(12):
        lines = [f"doc {d} headline about topic {d % 5}"]
        if d % 2 == 0:  # 6 docs: alternating case variants of B0
            lines.append(B0 if d % 4 == 0 else B0.lower())
        lines.append(f"unique body sentence {d} alpha")
        if d % 3 == 0:  # 4 docs: B1 exact / padded / title-cased
            lines.append({0: B1, 3: f"  {B1}  ", 6: B1.title(),
                          9: B1}[d % 12] if d in (0, 3, 6, 9)
                         else B1)
        if d == 5:  # in-doc repetition: df=1, stays content
            lines += ["lorem ipsum repeated locally",
                      "lorem ipsum repeated locally"]
        if d % 4 == 1:  # blank line, always kept
            lines.append("")
        if d >= 10:
            lines.append(B2)
        docs.append((d, lines))
    docs.append((12, [B0, B2]))  # all boilerplate → clean_text ''
    return docs


def _boilerplate_line_values() -> str:
    """(doc_id, pos, line) VALUES rows of the boilerplate fixture."""
    return ", ".join(
        "({}, {}, '{}')".format(d, p, ln.replace("'", "''"))
        for d, lines in _boilerplate_fixture()
        for p, ln in enumerate(lines))


def _boilerplate_oracle_sql(lines_cte: str, min_df: int = 2) -> str:
    """df-count + redaction oracle over an ``l(doc_id, pos, line)`` CTE —
    shared by the fixture gate and the real-documents gate: df counts
    DISTINCT docs on the NORMALIZED line (blanks never boilerplate),
    removal drops the ORIGINAL lines, order preserved, all-boilerplate
    docs go to '' (never NULL)."""
    return f"""
        WITH l AS ({lines_cte}),
        b AS (SELECT nline FROM (
                SELECT trim(lower(line)) AS nline,
                       count(DISTINCT doc_id) AS df
                FROM l WHERE trim(lower(line)) <> '' GROUP BY 1)
              WHERE df >= {min_df}),
        j AS (SELECT doc_id, pos, line,
                     trim(lower(line)) IN (SELECT nline FROM b)
                       AS is_boiler
              FROM l)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(is_boiler AS INT)) AS BIGINT) AS n_removed,
               coalesce(string_agg(CASE WHEN NOT is_boiler THEN line END,
                                   chr(10) ORDER BY pos), '')
                 AS clean_text
        FROM j GROUP BY doc_id
    """


def _archive_meta_values() -> str:
    """(image_id, w, h, tree_height) VALUES rows for the 8 fixture images —
    deterministic pure-function constants, same pattern as PERMS_16."""
    from quadtree_block_compression_spark.fixtures.images import images_meta_pandas
    from quadtree_block_compression_spark.kernels.tiles import tree_height
    pdf = images_meta_pandas(8, seed=42, max_side=128)
    rows = [f"('{r.image_id}', {int(r.w)}, {int(r.h)}, "
            f"{int(tree_height(int(r.w), int(r.h)))})"
            for r in pdf.itertuples()]
    return ", ".join(rows)

# ------------------------------------------------------------------ entry --


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: quadtree tile-assign + reassembly fidelity report over the
    deterministic images fixture, anchored to /root/testdata/sf0.001 (the
    corpus documents count rides along as a sanity column)."""
    from quadtree_block_compression_spark.operators.reassembly import roundtrip_report

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.agg(F.count("*").alias("corpus_docs"))

    images = _fixture_images(spark, 16)
    report = roundtrip_report(images)
    return report.crossJoin(n_docs)


# ---------------------------------------------------------------- queries --


def _gate_table_dir(name: str) -> str:
    """Scratch dir for the versioned-table gate queries: a per-BUILD unique
    dir plus age-based reclaim of stale siblings (ADVICE r5: the previous
    wipe-on-reuse keyed by (pid, thread ident) could wipe parquet still
    referenced by a prior thread's undrained lazy DataFrame once CPython
    recycled the ident). A gate table lives for one query build+collect —
    minutes — so reclaiming siblings older than an hour can never touch a
    live one, and repeated gate/audit runs still don't accumulate
    unbounded parquet garbage under /tmp."""
    import shutil
    import tempfile
    import time
    import uuid
    root = os.path.join(tempfile.gettempdir(), "qbcs_gate_tables")
    os.makedirs(root, exist_ok=True)
    cutoff = time.time() - 3600.0
    for d in os.listdir(root):
        p = os.path.join(root, d)
        try:
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass  # a sibling raced its own reclaim — nothing to free
    return os.path.join(root, f"{name}_{os.getpid()}_{uuid.uuid4().hex[:8]}")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from quadtree_block_compression_spark.operators import (
        ann, dedup_blocks, dedup_text, knn, multimodal, raster, sampling,
        spatial_join, text_analysis, tiling)
    from quadtree_block_compression_spark.streaming import windows as stream_windows

    # ---------------- relational core (TPC-H-ish; engine = Catalyst) ------

    def q1_pricing_summary(spark, sf):
        (li,) = _tables(spark, sf, "lineitem")
        return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                     F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                     F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                     .alias("sum_disc_price"),
                     F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                     F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                     F.count("*").alias("count_order"))
                .orderBy("l_returnflag", "l_linestatus"))

    def q3_revenue_by_order(spark, sf):
        cust, orders, li = _tables(spark, sf, "customer", "orders", "lineitem")
        return (cust.where(F.col("c_mktsegment") == "BUILDING")
                .join(orders, F.col("c_custkey") == F.col("o_custkey"))
                .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
                .groupBy("o_orderkey")
                .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                     .alias("revenue"))
                .orderBy(F.desc("revenue"), "o_orderkey").limit(10))

    def q10_returned_revenue(spark, sf):
        """TPC-H Q10 shape: per-customer revenue from RETURNED items — a
        4-way join with a pushed selective filter on the fact side, a
        customer-grain aggregate, and a deterministic top-20
        (TakeOrderedAndProject, no window)."""
        cust, orders, li, nation = _tables(
            spark, sf, "customer", "orders", "lineitem", "nation")
        return (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
                .join(li.where(F.col("l_returnflag") == "R"),
                      F.col("o_orderkey") == F.col("l_orderkey"))
                .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
                .groupBy("c_custkey", "c_name", "n_name")
                .agg(F.round(F.sum(F.col("l_extendedprice")
                                   * (1 - F.col("l_discount"))), 2)
                     .alias("revenue"))
                .orderBy(F.desc("revenue"), "c_custkey").limit(20))

    def q18_large_orders(spark, sf):
        """TPC-H Q18 shape: large-volume orders — a HAVING-style aggregate
        subquery (per-order quantity total > 300) semi-driving the join to
        orders/customer, then a deterministic top-20."""
        cust, orders, li = _tables(spark, sf, "customer", "orders", "lineitem")
        big = (li.groupBy("l_orderkey")
               .agg(F.sum("l_quantity").alias("total_qty"))
               .where(F.col("total_qty") > 300))
        return (big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                .join(cust, F.col("o_custkey") == F.col("c_custkey"))
                .select("c_custkey", "c_name", "o_orderkey",
                        F.round("o_totalprice", 2).alias("o_totalprice"),
                        F.round("total_qty", 2).alias("total_qty"))
                .orderBy(F.desc("total_qty"), "o_orderkey").limit(20))

    def q5_local_supplier_volume(spark, sf):
        # TPC-H Q5 shape: 5-way join (region⋈nation⋈customer⋈orders⋈lineitem
        # ⋈supplier with colocation predicate), agg, sort — exercises join
        # reordering + broadcast selection end to end
        region, nation, cust, orders, li, supp = _tables(
            spark, sf, "region", "nation", "customer", "orders", "lineitem", "supplier")
        return (region.where(F.col("r_name") == "ASIA")
                .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
                .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
                .join(orders, F.col("o_custkey") == F.col("c_custkey"))
                .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
                .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
                .groupBy("n_name")
                .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                     .alias("revenue"))
                .orderBy(F.desc("revenue"), "n_name"))

    def events_rollup(spark, sf):
        (ev,) = _tables(spark, sf, "events")
        day = F.date_format("ts", "yyyy-MM-dd")
        # exact integer micro-unit sum: floor(value*1e6) is the same IEEE op
        # on both engines and BIGINT summation is order-independent (a
        # round(sum(double), 6) can flip its last digit between engines)
        micros = F.sum(F.floor(F.col("value") * 1000000.0).cast("long"))
        return (ev.rollup(day.alias("day"), "event_type")
                .agg(F.count("*").alias("n"), micros.alias("sum_value_micros"))
                .select(F.coalesce("day", F.lit("ALL")).alias("day"),
                        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
                        "n", "sum_value_micros"))

    def q6_forecast_revenue(spark, sf):
        (li,) = _tables(spark, sf, "lineitem")
        return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                         & (F.col("l_shipdate") < F.lit("1997-01-01"))
                         & (F.col("l_discount").between(0.03, 0.07))
                         & (F.col("l_quantity") < 24))
                .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                     .alias("revenue"),
                     F.count("*").alias("n_items")))

    def topk_orders_per_customer(spark, sf):
        from pyspark.sql import Window
        (orders,) = _tables(spark, sf, "orders")
        w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
        return (orders.withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= 3)
                .select("o_custkey", "o_orderkey",
                        F.round("o_totalprice", 2).alias("totalprice"), "rnk"))

    def events_tumbling(spark, sf):
        (ev,) = _tables(spark, sf, "events")
        return (stream_windows.tumbling_event_counts(ev, minutes=60)
                .select(F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                        "event_type", "n_events", "sum_value_micros"))

    def events_sessionize(spark, sf):
        (ev,) = _tables(spark, sf, "events")
        s = stream_windows.session_windows(ev, gap_minutes=30)
        return s.select("user_id", "session_id",
                        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                        "n_events", "sum_value_micros")

    def events_json_stats(spark, sf):
        (ev,) = _tables(spark, sf, "events")
        # one explicit integer-parse semantic shared with the oracle: only a
        # pure decimal-integer string counts; anything else (missing key,
        # '3.7', quoted junk) is NULL on both engines — never an ANSI throw
        # on Spark or a round-to-int on DuckDB
        ks = F.get_json_object("props", "$.k")
        k = F.when(ks.rlike(r"^-?[0-9]+$"), ks).cast("long")
        return (ev.groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.sum(k).alias("sum_k"),
                     F.min(k).alias("min_k"),
                     F.max(k).alias("max_k"))
                .orderBy("event_type"))

    # ---------------- text / training-data ops ----------------------------

    def dedup_exact_docs(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return dedup_text.dedup_exact_docs(docs).select(
            "doc_id", "content_hash", "canonical_doc_id", "is_canonical", "group_size")

    def fingerprint_docs(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return text_analysis.fingerprint(docs)

    def token_counts(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return docs.select("doc_id",
                           text_analysis.token_count().alias("n_ws_tokens"),
                           text_analysis.bpe_ish_token_count().alias("n_sub_tokens"))

    def text_quality(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return text_analysis.quality_features(docs)

    def lang_id(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return text_analysis.lang_id(docs)

    def ngram_jaccard(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return dedup_text.ngram_jaccard_pairs(docs, n=_NGRAM_N, threshold=_JACCARD_T,
                                              max_df=_MAX_DF)

    def minhash_signatures(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return dedup_text.minhash_signatures(docs, n=_NGRAM_N, num_perm=_NUM_PERM)

    def minhash_lsh_pairs(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return dedup_text.minhash_lsh_pairs(docs, n=_NGRAM_N, num_perm=_NUM_PERM,
                                            bands=_BANDS, threshold=_JACCARD_T,
                                            max_bucket=_MAX_BUCKET)

    def corpus_sample(spark, sf):
        """Stratified deterministic hash sampling — the reproducible,
        pushdown-friendly way to sample at 100 TB (hash mod, not RNG; one
        CASE predicate, zero joins). Rates: keep all of src0, half of src1,
        a fifth of src2, 10% elsewhere."""
        (docs,) = _tables(spark, sf, "documents")
        out = sampling.stratified_hash_sample(
            docs, rates={"src0": 1.0, "src1": 0.5, "src2": 0.2},
            strata_col="source", default_rate=0.1, salt="r3")
        return out.select("doc_id", "source", "lang", "n_chars")

    def vocab_topk(spark, sf):
        """Corpus vocabulary: global top-200 whitespace tokens, map-side
        combined, deterministic (count DESC, token) tie-break."""
        (docs,) = _tables(spark, sf, "documents")
        return sampling.vocab_topk(docs, k=200)

    def corpus_stats(spark, sf):
        """Per-source length distribution with EXACT discrete quantiles
        (rank floor((n-1)q)+1 under (value, id) order — integer math both
        engines agree on; sketch quantiles would not hash-match)."""
        (docs,) = _tables(spark, sf, "documents")
        return sampling.corpus_stats(docs)

    def corpus_weighted_sample(spark, sf):
        """Weight-proportional deterministic sampling: keep each doc with
        probability quality·0.5 (capped at 1) — the data-mixing primitive
        that upsamples high-quality text. One scan, zero joins, a pushable
        integer hash predicate; the weight is the rounded quality score
        both engines already hash-agree on (corpus_clean)."""
        from quadtree_block_compression_spark.operators.text_analysis import (
            _quality_score_expr)
        (docs,) = _tables(spark, sf, "documents")
        # deliberately NOT spread (r6): the plan-audit pins this query as
        # exchange-free — the zero-shuffle composability property outweighs
        # the ~0.8s the 3-split scan costs at bench scale (at 100 TB the
        # scan has thousands of splits and the point is moot)
        q = docs.select("doc_id",
                        F.round(_quality_score_expr("text"), 6).alias("quality"))
        out = sampling.weighted_hash_sample(q, "quality", base_rate=0.5,
                                            salt="wq", max_weight=2.0)
        return out.select("doc_id", "quality")

    def corpus_mix_sample(spark, sf):
        """Mixture-faithful stratified subsampling (data mixing): largest
        subsample hitting a 1:2:1 short/medium/long length mix exactly —
        quota arithmetic all-integer (floor(w·T/W), T = min over strata of
        floor(n·W/w)), selection by (portable hash, id) rank per stratum.
        The counts/quota side is O(strata) rows (broadcast); only the rank
        window shuffles the corpus, once."""
        from quadtree_block_compression_spark.operators.text_analysis import (
            token_count)
        (docs,) = _tables(spark, sf, "documents")
        tok = token_count("text")
        strat = docs.select(
            "doc_id",
            F.when(tok < 40, "short").when(tok < 70, "medium")
            .otherwise("long").alias("stratum"))
        out = sampling.mixture_sample(
            strat, targets={"short": 1, "medium": 2, "long": 1},
            strata_col="stratum", key_col="doc_id", salt="mx")
        return out.select("doc_id", "stratum",
                          F.col("pick_rank").cast("long").alias("pick_rank"))

    def pack_docs(spark, sf):
        """Concat-then-split sequence packing: assign every document its
        (shard, pack, offset) under a 64-token context budget across 8
        independent hash shards — the pretraining batch-assembly step as
        one windowed plan (per-shard running sums; deliberately NO global
        order, which would be a partitionless window)."""
        from quadtree_block_compression_spark.operators.packing import (
            pack_sequences)
        (docs,) = _tables(spark, sf, "documents")
        return pack_sequences(docs, budget=64, n_parts=8)

    def events_funnel(spark, sf):
        """Click→purchase conversion funnel composed from the as-of join:
        per purchase hour, how many purchases had a click by the same user
        within the preceding 30 minutes. Same zero-join as-of plan plus
        one aggregate."""
        from quadtree_block_compression_spark.streaming.windows import asof_join
        (events,) = _tables(spark, sf, "events")
        a = asof_join(events, left_type="purchase", right_type="click")
        conv = (F.col("asof_ts").isNotNull()
                & ((F.unix_timestamp("left_ts")
                    - F.unix_timestamp("asof_ts")) <= 1800))
        return (a.groupBy(F.date_format(F.date_trunc("hour", "left_ts"),
                                        "yyyy-MM-dd HH:mm:ss")
                          .alias("win_start"))
                .agg(F.count(F.lit(1)).alias("n_purchases"),
                     F.sum(conv.cast("long")).cast("long").alias("n_converted"))
                .withColumn("conv_rate",
                            F.round(F.col("n_converted")
                                    / F.col("n_purchases"), 6)))

    def dedup_components(spark, sf):
        """Duplicate CLUSTERS from the MinHash-LSH pair edges: connected
        components via min-label propagation (components.py), singletons
        included — the principled per-component canonical election that the
        greedy drop-doc_b rule approximates. Oracle: DuckDB recursive CTE
        (min reachable id). algorithm is pinned to "propagation" so this
        query keeps grading the distributed propagation tier at gate size
        (auto's small-graph union-find tier is graded by the five
        default-auto component queries, alternating by _logn)."""
        from quadtree_block_compression_spark.operators.components import (
            connected_components)
        (docs,) = _tables(spark, sf, "documents")
        pairs = dedup_text.minhash_lsh_pairs(docs, n=_NGRAM_N, num_perm=_NUM_PERM,
                                             bands=_BANDS, threshold=_JACCARD_T,
                                             max_bucket=_MAX_BUCKET)
        return connected_components(docs, pairs, algorithm="propagation")

    def dedup_components_logn(spark, sf):
        """Same duplicate clusters, computed by the large-star/small-star
        alternation (Kiveris et al. SoCC'14) — the O(log² n)-round tier
        whose shuffle count is independent of component diameter (the
        100-TB path for adversarial chain graphs; VERDICT r3 #3). Output
        is identical to the propagation tier, so the SAME recursive-CTE
        oracle grades both: two independent Spark algorithms and one
        independent SQL semantics, all hash-equal."""
        from quadtree_block_compression_spark.operators.components import (
            connected_components)
        (docs,) = _tables(spark, sf, "documents")
        pairs = dedup_text.minhash_lsh_pairs(docs, n=_NGRAM_N, num_perm=_NUM_PERM,
                                             bands=_BANDS, threshold=_JACCARD_T,
                                             max_bucket=_MAX_BUCKET)
        return connected_components(docs, pairs, algorithm="alternating")

    def dedup_incremental(spark, sf):
        """Append-only ingest dedup: classify a NEW batch (docs ≥ 250 plus
        ten re-keyed exact copies of corpus docs) against the existing
        corpus (docs < 250) and within itself — exact hash tier, LSH near
        tier vs corpus, within-batch near tier, with corpus×corpus
        candidates never generated. The production per-batch operation an
        incremental 100-TB pipeline runs instead of re-deduping the
        world."""
        (docs,) = _tables(spark, sf, "documents")
        corpus = docs.where("doc_id < 250")
        newb = (docs.where("doc_id < 10")
                .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
                .unionByName(docs.where("doc_id >= 250")
                             .select("doc_id", "text")))
        return dedup_text.dedup_incremental(
            newb, corpus, n=_NGRAM_N, num_perm=_NUM_PERM, bands=_BANDS,
            threshold=_JACCARD_T, max_bucket=_MAX_BUCKET)

    def simhash_docs(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return dedup_text.simhash64(docs)

    def simhash_pairs(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return dedup_text.simhash_pairs(docs, max_hamming=30,
                                        max_bucket=_MAX_BUCKET)

    # ---------------- embeddings / ANN ------------------------------------

    def ann_topk(spark, sf):
        (emb,) = _tables(spark, sf, "embeddings")
        q = (emb.where(F.col("vec_id") < 10)
             .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")))
        return ann.cosine_topk_bruteforce(emb, q, k=5)

    def _gate_checked_planes(emb, target):
        # ADVICE r3: the oracle hard-embeds _LSH_PLANES hyperplanes (the
        # auto_num_planes value at the sf0.01 gate, n=500). Derive the live
        # count ONCE here and fail loudly if the derivation ever drifts from
        # the oracle's constant at the gate size (e.g. a changed
        # auto_num_planes heuristic) — the oracle SQL side carries the
        # matching n≠500 error() guard.
        n = emb.count()
        derived = ann.auto_num_planes(n, target_bucket=target)
        if n == _LSH_GATE_N and derived != _LSH_PLANES:
            raise AssertionError(
                f"auto_num_planes({n}, target_bucket={target}) = {derived}, "
                f"but the DuckDB oracle embeds {_LSH_PLANES} hyperplanes — "
                "regenerate the oracle plane set (_lsh_keyed_sql) in the "
                "same change")
        return derived

    def ann_lsh_topk(spark, sf):
        (emb,) = _tables(spark, sf, "embeddings")
        q = (emb.where(F.col("vec_id") < 10)
             .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")))
        # multiprobe (Hamming-1 neighbor buckets) + degenerate-bucket cap +
        # size-derived plane count (== _LSH_PLANES at the sf0.01 gate), all
        # mirrored in the oracle
        planes = _gate_checked_planes(emb, _LSH_TOPK_TARGET)
        return ann.cosine_topk_lsh(emb, q, k=5, dim=64, num_planes=planes,
                                   max_bucket=_LSH_TOPK_MAX_BUCKET,
                                   multiprobe=True,
                                   target_bucket=_LSH_TOPK_TARGET)

    def ann_ivf_topk(spark, sf):
        (emb,) = _tables(spark, sf, "embeddings")
        q = (emb.where(F.col("vec_id") < 10)
             .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")))
        # list count derived from table size (~√n; == _IVF_CLUSTERS at the
        # sf0.01 gate) so per-probe work stays ~nprobe·√n as the table
        # grows; the oracle embeds the gate value behind an error() guard
        n = emb.count()
        derived = ann.auto_n_clusters(n)
        if n == _LSH_GATE_N and derived != _IVF_CLUSTERS:
            raise AssertionError(
                f"auto_n_clusters({n}) = {derived}, but the DuckDB oracle "
                f"unrolls a {_IVF_CLUSTERS}-cluster Lloyd build — regenerate "
                "_ivf_sql's constant (_IVF_CLUSTERS) in the same change")
        return ann.cosine_topk_ivf(emb, q, k=5, n_clusters=derived,
                                   nprobe=6, iters=3)

    def embedding_near_dup(spark, sf):
        # LSH-bucketed tier (scale-safe: banded bucket equi-joins replace the
        # quadratic cross join; the oracle replicates the deterministic
        # hyperplane buckets). The exact brute-force tier remains available
        # as ann.cosine_topk_bruteforce / tests' cross-check.
        (emb,) = _tables(spark, sf, "embeddings")
        # plane count derived from table size (== _LSH_PLANES at the
        # sf0.01 gate, more planes as the table grows); max_bucket guards the
        # degenerate-bucket n² residue — both mirrored in the oracle
        planes = _gate_checked_planes(emb, 32)
        return ann.embedding_near_dup_pairs(emb, threshold=_NEAR_DUP_COS,
                                            dim=_LSH_DIM, num_planes=planes,
                                            max_bucket=_LSH_MAX_BUCKET)

    # ---------------- spatial layer ----------------------------------------

    def cell_assign(spark, sf):
        pts = _customer_points(spark, sf)
        return pts.select(F.col("image_id").alias("point_id"), "cell")

    def spatial_join_rects(spark, sf):
        pts = _customer_points(spark, sf)
        rects = _nation_rects(spark, sf)
        hits = spatial_join.spatial_join_broadcast(pts, rects)
        return hits.select(F.col("image_id").alias("point_id"), "geom_id")

    def spatial_join_salted_rects(spark, sf):
        pts = _customer_points(spark, sf)
        rects = _nation_rects(spark, sf)
        hits = spatial_join.spatial_join_salted(pts, rects, hot_threshold=100, salt=4)
        return hits.select(F.col("image_id").alias("point_id"), "geom_id")

    def spatial_join_triangles(spark, sf):
        pts = _customer_points(spark, sf)
        tris = _nation_triangles(spark, sf)
        hits = spatial_join.spatial_join_broadcast(pts, tris)
        return hits.select(F.col("image_id").alias("point_id"), "geom_id")

    def rasterize_rects(spark, sf):
        """Vector→raster burn-in: each nation rect → the res-8 grid cells
        whose CENTERS lie inside (exact-cover refinement of the bbox
        polygon_cover). Two JVM sequence/explode projections bound the
        fan-out to |geoms|·bbox-cells; the shared Arrow PIP kernel verifies
        centers. Centers (multiples of 4096 plus 2048) can never sit on a
        rect boundary (boundaries at X.5), so the center-in rule is
        float-exact on both engines; the oracle replays the grid arithmetic
        with the identical Morton packing as cell_assign's."""
        rects = _nation_rects(spark, sf)
        return raster.rasterize(rects, res=_RES)

    def zonal_stats_rects(spark, sf):
        """Raster→vector zonal statistics: per nation rect, exact-integer
        aggregates (count/sum/min/max of the world coordinates) over the
        customer points inside it — broadcast cell-prefiltered PIP join +
        ONE map-side-combining aggregation; empty zones kept via a left
        join from the dimension-sized geometry table, min/max coalesced to
        the -1 sentinel on both engines (nullable BIGINT would widen to
        float64 through pandas otherwise)."""
        pts = _customer_points(spark, sf)
        rects = _nation_rects(spark, sf)
        return raster.zonal_stats(pts, rects)

    def blocks_pip_join(spark, sf):
        """The north rule's block-to-polygon join END TO END on the LIVE
        kernel output: fixture images → quadtree leaf blocks →
        world-frame centroids + cell keys (the batched Arrow affine+encode)
        → broadcast cell-prefiltered PIP join against strip rects. Oracle
        replays the identical affine arithmetic over the frozen golden
        blocks table (kernel drift → hash fail) with open-interval
        containment; centroid coordinates are exact multiples of 64, so
        the half-integer rect bounds admit no boundary ambiguity."""
        images = _fixture_images(spark, 16)
        blocks = tiling.assign_tiles(images).where("is_leaf")
        pts = spatial_join.block_centroids(blocks, res=_RES)
        rects = _strip_rects(spark, sf)
        hits = spatial_join.spatial_join_broadcast(pts, rects)
        return hits.select("image_id", "tile_id", "geom_id",
                           F.round("wx", 6).alias("wx"),
                           F.round("wy", 6).alias("wy"))

    def compact_cover_rects(spark, sf):
        """Minimal quadtree cover (H3 `compact` on the Z-order grid): the
        rasterized nation rects compacted bottom-up — every complete
        4-sibling set replaced by its parent, res rounds of (parent
        aggregate + anti-join) on a strictly shrinking frame. The uniform-
        region-as-one-coarse-block idea IS the reference's quadtree leaf
        rule, re-expressed relationally. Oracle: the identical rounds
        unrolled as chained CTEs (DuckDB ANTI JOIN per level)."""
        rects = _nation_rects(spark, sf)
        cells = raster.rasterize(rects, res=_RES)
        return raster.compact_cells(cells, res=_RES)

    def rect_overlap_join(spark, sf):
        """Distributed strict-AABB overlap join — RectanglesCollide
        (comparisonUtils.go:115-120) at table scale: customer rects
        (integer bounds) × nation rects (the PIP fixtures' half-integer
        bounds, so no boundary ever coincides), grid-bucketed with
        reference-point exactly-once emission (no distinct shuffle).
        inter_area_x4 is an exact BIGINT on both engines (quarter-unit
        products are float-exact at these magnitudes)."""
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        ck = F.col("c_custkey").cast("long")
        cxa = (ck * _PX % _W).cast("double")
        cya = (ck * _PY % _W).cast("double")
        hwa = (F.lit(2000) + (ck % 5) * 1000).cast("double")
        hha = (F.lit(3000) + (ck % 7) * 1000).cast("double")
        a = cust.select(ck.cast("string").alias("id"),
                        (cxa - hwa).alias("x0"), (cya - hha).alias("y0"),
                        (cxa + hwa).alias("x1"), (cya + hha).alias("y1"))
        nat = spark.read.parquet(f"{sf}/nation.parquet")
        nk = F.col("n_nationkey").cast("long")
        cxb = ((nk * _PX * 7919 + 12345) % _W).cast("double")
        cyb = ((nk * _PY * 104729 + 54321) % _W).cast("double")
        hwb = (F.lit(30000) + (nk % 7) * 20000).cast("double") + F.lit(0.5)
        hhb = (F.lit(30000) + (nk % 5) * 25000).cast("double") + F.lit(0.5)
        b = nat.select(
            F.concat(F.lit("poly_"), F.lpad(nk.cast("string"), 5, "0")).alias("id"),
            (cxb - hwb).alias("x0"), (cyb - hhb).alias("y0"),
            (cxb + hwb).alias("x1"), (cyb + hhb).alias("y1"))
        return spatial_join.overlap_join(a, b, res=_RES)

    def spatial_distance_join(spark, sf):
        """All customer-point pairs within radius 20,000 (world 2^20): grid
        cells of side r, 3×3-neighborhood equi-join on the two grid
        coordinates, exact d² filter — never quadratic, no theta-join.
        d² is emitted as EXACT BIGINT (integer-valued coordinates), so the
        oracle hash needs no float rounding."""
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        pts = cust.select(
            F.col("c_custkey").cast("long").alias("point_id"),
            ((F.col("c_custkey") * _PX) % _W).cast("double").alias("wx"),
            ((F.col("c_custkey") * _PY) % _W).cast("double").alias("wy"))
        return spatial_join.distance_join(pts, radius=20_000.0)

    def events_asof_join(spark, sf):
        """Event-time AS-OF join (purchase ← latest click at-or-before, per
        user): union + ONE key shuffle + running last(ignorenulls) window —
        the merge-sorted as-of with zero joins. NULL asof columns (no prior
        click) are coalesced to sentinels on both engines (pandas turns a
        nullable BIGINT oracle column into float64 otherwise)."""
        from quadtree_block_compression_spark.streaming.windows import asof_join
        (events,) = _tables(spark, sf, "events")
        out = asof_join(events, left_type="purchase", right_type="click")
        return out.select(
            "left_event_id", "user_id",
            F.date_format("left_ts", "yyyy-MM-dd HH:mm:ss").alias("left_ts"),
            F.coalesce("asof_event_id", F.lit(-1)).alias("asof_event_id"),
            F.coalesce(F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss"),
                       F.lit("1970-01-01 00:00:00")).alias("asof_ts"))

    def knn_points(spark, sf):
        import pandas as pd
        nat = spark.read.parquet(f"{sf}/nation.parquet").select("n_nationkey").collect()
        qrows = [{"query_id": f"q_{int(r.n_nationkey):03d}",
                  "x": float((int(r.n_nationkey) * 131071 + 7) % _W),
                  "y": float((int(r.n_nationkey) * 524287 + 11) % _W),
                  "k": 5} for r in nat]
        queries_df = spark.createDataFrame(pd.DataFrame(qrows))
        pts = _customer_points(spark, sf)
        # the query set is the 25 nations by construction — pin the
        # broadcast tier rather than paying auto's query-side count action
        out = knn.knn_ring(pts, queries_df, res=_RES, max_ring=8,
                           strategy="broadcast")
        return out.select("query_id", F.col("image_id").alias("point_id"),
                          F.round("distance", 6).alias("distance"), "rank")

    def knn_corpus(spark, sf):
        """kNN for EVERY corpus point — the training-pipeline shape that
        motivated the r5 shuffle tier (VERDICT r4 #1): the query side is
        the whole point set, kept distributed end to end (cell equi-joins,
        anti-join-maintained pending set, nothing query-sized on the
        driver). Oracle: brute-force |P|² SQL with the same
        (distance, id) tie-break — the strict ring-termination bound makes
        the ring result exactly the brute-force result, ties included."""
        pts = _customer_points(spark, sf)
        queries_df = pts.select(
            F.concat(F.lit("c_"), F.col("image_id")).alias("query_id"),
            F.col("wx").alias("x"), F.col("wy").alias("y"),
            F.lit(3).alias("k"))
        out = knn.knn_ring(pts, queries_df, res=_RES, max_ring=8,
                           strategy="shuffle")
        return out.select("query_id", F.col("image_id").alias("point_id"),
                          F.round("distance", 6).alias("distance"), "rank")

    # ---------------- quadtree / pixel ops (rows-only checks) --------------

    def quadtree_tile_assign(spark, sf):
        images = _fixture_images(spark, 16)
        blocks = tiling.assign_tiles(images)
        # rule-1/2 leaves never compute similarity (NULL through Arrow);
        # -1.0 sentinel keeps the cross-engine hash null-representation-free
        return blocks.select("image_id", "tile_id", "level", "x0", "y0", "x1", "y1",
                             "is_leaf", "oob",
                             F.coalesce(F.round("similarity", 9), F.lit(-1.0))
                             .alias("similarity"),
                             "block_hash", "morton")

    def quadtree_roundtrip(spark, sf):
        from quadtree_block_compression_spark.operators.reassembly import roundtrip_report
        images = _fixture_images(spark, 16)
        rep = roundtrip_report(images)
        return rep.select("image_id", "n_blocks", F.round("psnr", 3).alias("psnr"),
                          "exact", "caption_ok")

    def block_dedup_exact(spark, sf):
        images = _fixture_images(spark, 16)
        blocks = tiling.assign_tiles(images)
        d = dedup_blocks.dedup_exact(blocks)
        return d.select("image_id", "tile_id", "block_hash", "is_canonical",
                        "canonical_image_id", "canonical_tile_id")

    def block_near_dedup(spark, sf):
        images = _fixture_images(spark, 16)
        blocks = tiling.assign_tiles(images)
        return dedup_blocks.near_dedup(blocks).select(
            "image_id", "tile_id", "dup_image_id", "dup_tile_id",
            F.round("similarity", 9).alias("similarity"))

    def block_dedup_clusters(spark, sf):
        """The reference's dedup GROUPS (symlink clusters keyed by a
        canonical block, quadtreeElement.go:176-221) as connected components
        over the near-dup pair edges — a chain A~B~C is ONE cluster with one
        canonical even when A~C was never scored. Oracle: recursive CTE over
        the frozen blocks golden + near-dedup snapshot."""
        from quadtree_block_compression_spark.operators.components import (
            connected_components)
        images = _fixture_images(spark, 16)
        blocks = tiling.assign_tiles(images)
        pairs = dedup_blocks.near_dedup(blocks)
        nodes = blocks.select(
            F.concat_ws("|", "image_id", "tile_id").alias("block_key"))
        edges = pairs.select(
            F.concat_ws("|", "image_id", "tile_id").alias("a"),
            F.concat_ws("|", "dup_image_id", "dup_tile_id").alias("b"))
        return connected_components(nodes, edges, id_col="block_key",
                                    a_col="a", b_col="b")

    def image_features(spark, sf):
        images = _fixture_images(spark, 16)
        out = multimodal.image_features(images)
        return out.select("image_id", "w", "h", F.round("mean_r", 4).alias("mean_r"),
                          F.round("mean_g", 4).alias("mean_g"),
                          F.round("mean_b", 4).alias("mean_b"), "phash")

    def interpolator_matrix(spark, sf):
        from quadtree_block_compression_spark.operators.calibration import (
            interpolator_matrix as matrix)
        images = _fixture_images(spark, 8)
        return matrix(images).select("image_id", "down", "up",
                                     F.round("similarity", 9).alias("similarity"))

    def archive_roundtrip(spark, sf):
        from quadtree_block_compression_spark.sources.archive import (
            write_archives, read_archives)
        images = _fixture_images(spark, 8)
        blocks = tiling.assign_tiles(images)
        back = read_archives(write_archives(blocks, images))
        return (back.groupBy("image_id", "w", "h", "tree_height")
                .agg(F.count("*").alias("n_blocks"),
                     F.sum(F.col("is_symlink").cast("int")).alias("n_symlinks")))

    def versioned_read(spark, sf):
        """Iceberg-lite snapshot semantics, graded: commit snapshot 1 (the
        first 8 fixture meta rows), APPEND snapshot 2 (the next 8), then
        time-travel-read snapshot 1 — rows committed later must be
        invisible — with the LATEST snapshot's row count riding along as a
        constant column so append visibility grades in the same result.
        Snapshot 1 is written cluster_by=(w, h) so the gate also drives the
        Z-order layout path (layout changes row order only — the oracle is
        order-insensitive, so values must be untouched by clustering).
        Oracle: the snapshot-1 metadata constants + literal 16."""
        from quadtree_block_compression_spark.fixtures.images import (
            images_meta_pandas)
        from quadtree_block_compression_spark.sources.tables import (
            read_versioned, write_versioned)
        meta = images_meta_pandas(16, seed=42, max_side=128)
        path = _gate_table_dir("qbcs_vgate")
        write_versioned(spark.createDataFrame(meta.iloc[:8]), path,
                        cluster_by=["w", "h"], cluster_files=2)
        write_versioned(spark.createDataFrame(meta.iloc[8:]), path,
                        mode="append")
        v1 = read_versioned(spark, path, version=1)
        latest_n = (read_versioned(spark, path)
                    .agg(F.count("*").alias("latest_rows")))
        return v1.crossJoin(latest_n)

    def versioned_incremental(spark, sf):
        """Iceberg-style incremental read, graded: commit snapshot 1 (first
        8 fixture meta rows), append snapshot 2 (the next 8), then read the
        DIFF 1→2 — pure manifest-file subtraction, so only the appended
        files are scanned. Exactly the appended rows (no old rows rescanned,
        no new rows lost) or the gate mismatches. Oracle: the snapshot-2
        generator constants."""
        from quadtree_block_compression_spark.fixtures.images import (
            images_meta_pandas)
        from quadtree_block_compression_spark.sources.tables import (
            versioned_diff, write_versioned)
        meta = images_meta_pandas(16, seed=42, max_side=128)
        path = _gate_table_dir("qbcs_vdiff")
        write_versioned(spark.createDataFrame(meta.iloc[:8]), path)
        write_versioned(spark.createDataFrame(meta.iloc[8:]), path,
                        mode="append")
        return versioned_diff(spark, path, 1, 2)

    def versioned_merge(spark, sf):
        """Copy-on-write MERGE INTO, graded: commit generator rows 0-7 as
        snapshot 1, merge rows 4-11 with a ' v2' caption suffix (4 updates
        + 4 inserts, one atomic overwrite snapshot), read the result —
        matched keys replaced, unmatched kept, new keys inserted, with the
        PRE-merge snapshot's row count riding along as a constant so
        rollback-readability grades in the same result. Oracle: anti-join
        + union over the indexed generator constants."""
        from quadtree_block_compression_spark.fixtures.images import (
            images_meta_pandas)
        from quadtree_block_compression_spark.sources.tables import (
            merge_versioned, read_versioned, write_versioned)
        meta = images_meta_pandas(16, seed=42, max_side=128) \
            .loc[:, ["image_id", "caption"]]
        path = _gate_table_dir("qbcs_vmerge")
        write_versioned(spark.createDataFrame(meta.iloc[:8]), path)
        upd = meta.iloc[4:12].copy()
        upd["caption"] = upd["caption"] + " v2"
        merge_versioned(spark, path, spark.createDataFrame(upd), "image_id")
        v1_rows = (read_versioned(spark, path, version=1)
                   .agg(F.count("*").alias("v1_rows")))
        return read_versioned(spark, path).crossJoin(v1_rows)

    def boilerplate_removal(spark, sf):
        """Cross-document line dedup (CCNet-style boilerplate strip) over
        the constant fixture: lines recurring in ≥2 documents (normalized
        trim+lower) are removed from every document, original order
        preserved. Oracle: identical df-count + redaction SQL over the
        same (doc_id, pos, line) constants."""
        from quadtree_block_compression_spark.operators.boilerplate import (
            remove_boilerplate_lines)
        rows = [(d, "\n".join(lines)) for d, lines in _boilerplate_fixture()]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        return remove_boilerplate_lines(docs, min_df=2)

    def boilerplate_docs(spark, sf):
        """Boilerplate strip over the REAL documents table — an exact
        identity on the all-distinct single-line corpus, so the gate pins
        the whole explode→df-count→join→rebuild round trip (order,
        whitespace, counts) at table scale."""
        from quadtree_block_compression_spark.operators.boilerplate import (
            remove_boilerplate_lines)
        (docs,) = _tables(spark, sf, "documents")
        return remove_boilerplate_lines(docs.select("doc_id", "text"),
                                        min_df=2)

    def _phash_images(spark):
        """Seeded near-dup image fixture shared by the phash queries:
        the 16 fixture images plus an exact re-encode of row 0 (hamming 0)
        and ±1-noise perturbations of the textured rows (noise/checker
        classes have stable pHashes under small perturbation; flat classes
        do not). Extras carry their source row's caption verbatim (a copy
        keeps its caption), so the multimodal query grades both evidence
        channels. Returns a 20-row (image_id, phash, caption) DataFrame."""
        import numpy as np
        import pandas as pd
        from quadtree_block_compression_spark.kernels.codecs import decode_image
        from quadtree_block_compression_spark.kernels.phash import phash64
        base = _fixture_images(spark, 16).toPandas()
        extra = [{"image_id": base.iloc[0]["image_id"] + "_copy",
                  "phash": int(base.iloc[0]["phash"]),
                  "caption": base.iloc[0]["caption"]}]
        rng = np.random.default_rng(99)
        for i in (2, 7, 11):  # checker_1, noise, checker_1 class rows
            row = base.iloc[i]
            img = decode_image(bytes(row["bytes"]))
            pert = np.clip(img.astype(np.int16)
                           + rng.integers(-1, 2, img.shape), 0, 255).astype(np.uint8)
            extra.append({"image_id": row["image_id"] + "_v2",
                          "phash": int(phash64(pert)),
                          "caption": row["caption"]})
        pdf = pd.concat([base[["image_id", "phash", "caption"]],
                         pd.DataFrame(extra)], ignore_index=True)
        return spark.createDataFrame(pdf)

    def image_near_dup_phash(spark, sf):
        from quadtree_block_compression_spark.operators.dedup_images import (
            phash_near_dup_pairs)
        return phash_near_dup_pairs(_phash_images(spark), max_hamming=10)

    def image_dedup_clusters(spark, sf):
        """Near-dup image CLUSTERS: connected components over the pHash
        pair edges (one canonical survivor per component) — the image-
        modality twin of block_dedup_clusters and corpus_clean_components.
        Oracle: recursive CTE (min reachable id) over the FROZEN
        image_near_dup_phash snapshot edges + the metadata-only fixture id
        list, so the live pair plan AND the live components both grade
        against independently-derived SQL."""
        from quadtree_block_compression_spark.operators.dedup_images import (
            phash_dedup_clusters)
        return phash_dedup_clusters(_phash_images(spark), max_hamming=10)

    def multimodal_dedup_clusters_q(spark, sf):
        """JOINT image dedup: components over pHash pair edges ∪
        same-normalized-caption star edges on the 20-row seeded fixture —
        the cross-modal merge grades transitively (a pixel-near pair and a
        caption-equal pair sharing a node collapse into one cluster).
        Oracle: recursive CTE over the frozen phash pair snapshot UNION
        caption edges derived in SQL from the metadata caption constants."""
        from quadtree_block_compression_spark.operators.dedup_images import (
            multimodal_dedup_clusters)
        return multimodal_dedup_clusters(_phash_images(spark), max_hamming=10)

    def image_caption_dedup(spark, sf):
        """Cross-modal caption dedup over the images table (input_hint
        schema): normalize captions by stripping the trailing bracketed
        annotation, fingerprint with the portable hash, elect one canonical
        image per caption group. Runs over the metadata-only fixture view
        (captions are generator metadata — no pixel synthesis in a text
        op); unicode captions (de/zh/ja + symbols) hash through md5/UTF-8
        identically on both engines."""
        from quadtree_block_compression_spark.fixtures.images import (
            images_meta_pandas)
        from quadtree_block_compression_spark.operators.dedup_images import (
            caption_dedup)
        meta = spark.createDataFrame(
            images_meta_pandas(48, seed=42, max_side=128)
            .loc[:, ["image_id", "caption"]])
        return caption_dedup(meta)

    def audio_features(spark, sf):
        """Real WAV PCM decode (stdlib wave) over deterministic generated
        clips — one per nation key, varied rate/length/channels. rows-only:
        no SQL engine can decode RIFF."""
        import pandas as pd
        from quadtree_block_compression_spark.operators.multimodal import (
            audio_features as afeat, make_wav_pcm16)
        nat = spark.read.parquet(f"{sf}/nation.parquet").select("n_nationkey").collect()
        rows = [{"clip_id": int(r.n_nationkey),
                 "bytes": make_wav_pcm16(int(r.n_nationkey),
                                         sr=8000 * (1 + int(r.n_nationkey) % 3),
                                         n_frames=800 + 160 * int(r.n_nationkey),
                                         nch=1 + int(r.n_nationkey) % 2)}
                for r in nat]
        out = afeat(spark.createDataFrame(pd.DataFrame(rows)))
        return out.select("clip_id", "codec", "sample_rate", "n_channels",
                          "n_frames", F.round("duration_s", 6).alias("duration_s"),
                          F.round("mean_amp", 6).alias("mean_amp"),
                          F.round("peak_amp", 6).alias("peak_amp"),
                          F.round("rms", 6).alias("rms"))

    def video_frame_stats(spark, sf):
        """REAL video decode: MJPEG-in-AVI demux (kernels/avi.py) + JFIF
        frame decode over deterministic generated clips — one per nation
        key, sampled every 4th frame. Snapshot-oracled (no SQL engine can
        demux RIFF): kernel drift → driver-visible hash fail."""
        import pandas as pd
        from quadtree_block_compression_spark.operators.multimodal import (
            make_mjpeg_avi_clip, video_frame_sample)
        nat = spark.read.parquet(f"{sf}/nation.parquet").select("n_nationkey").collect()
        rows = [{"video_id": int(r.n_nationkey),
                 "bytes": make_mjpeg_avi_clip(int(r.n_nationkey),
                                              nf=8 + int(r.n_nationkey) % 5)}
                for r in nat]
        out = video_frame_sample(spark.createDataFrame(pd.DataFrame(rows)),
                                 every_n=4)
        return out.select("video_id", "frame_idx", "w", "h",
                          F.round("mean_r", 6).alias("mean_r"),
                          F.round("mean_g", 6).alias("mean_g"),
                          F.round("mean_b", 6).alias("mean_b"))

    def tile_pyramid_rollup(spark, sf):
        """Tile-pyramid rollup over the LIVE kernel output: every leaf
        block aggregated into all of its quadtree ancestors (count, OOB
        count, bit_xor content digest, subtree bbox) — the map-tile
        serving structure as one relational rollup. Oracle replays the
        identical arithmetic over the frozen golden blocks table."""
        images = _fixture_images(spark, 16)
        return tiling.tile_pyramid(tiling.assign_tiles(images))

    def block_size_extremes(spark, sf):
        from quadtree_block_compression_spark.operators.calibration import (
            block_size_extremes as extremes)
        images = _fixture_images(spark, 16)
        return extremes(tiling.assign_tiles(images))

    def corpus_clean(spark, sf):
        """End-to-end corpus cleaning as ONE oracle-verified plan:
        fingerprint dedup -> minhash-LSH near-dedup drop -> quality filter.
        Annotation is a single projection (no joins) — see text_analysis.annotate."""
        from pyspark.sql import Window
        from quadtree_block_compression_spark.functions.cache import persist_tracked
        (docs,) = _tables(spark, sf, "documents")
        ann = text_analysis.annotate(docs)
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        # persisted: feeds BOTH the near-dedup shingle pipeline and the final
        # anti-join/quality filter — without it the annotate projection and
        # fingerprint-window election compute twice
        exact = persist_tracked(
            ann.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
        pairs = dedup_text.minhash_lsh_pairs(exact, n=_NGRAM_N, num_perm=_NUM_PERM,
                                             bands=_BANDS, threshold=0.5,
                                             max_bucket=_MAX_BUCKET)
        drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        clean = exact.join(drops, "doc_id", "left_anti")
        return (clean.filter(F.col("quality") >= 0.5)
                .select("doc_id", "fingerprint", "quality", "lang_pred"))

    def corpus_clean_components(spark, sf):
        """Corpus cleaning with the PRINCIPLED near-dup election: drop =
        non-canonical members of connected components over the LSH pair
        edges, instead of corpus_clean's greedy drop-doc_b rule (which
        over-keeps nothing but over-DROPS on chains A–B, B–C: the component
        {A,B,C} should keep exactly A; the greedy rule also drops C's
        neighbors that were only transitively similar — components.py:1-9).
        Same exact-dedup prefix and quality filter as corpus_clean, so the
        two graded queries isolate exactly the election semantics
        (VERDICT r4 #5). Oracle: recursive CTE (min reachable id)."""
        from pyspark.sql import Window
        from quadtree_block_compression_spark.functions.cache import persist_tracked
        from quadtree_block_compression_spark.operators.components import (
            connected_components)
        (docs,) = _tables(spark, sf, "documents")
        ann = text_analysis.annotate(docs)
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        exact = persist_tracked(
            ann.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
        pairs = dedup_text.minhash_lsh_pairs(exact, n=_NGRAM_N, num_perm=_NUM_PERM,
                                             bands=_BANDS, threshold=0.5,
                                             max_bucket=_MAX_BUCKET)
        comp = connected_components(exact, pairs)
        keep = comp.filter("is_canonical").select("doc_id")
        clean = exact.join(keep, "doc_id", "left_semi")
        return (clean.filter(F.col("quality") >= 0.5)
                .select("doc_id", "fingerprint", "quality", "lang_pred"))

    def dedup_elect_quality(spark, sf):
        """QUALITY-aware canonical election: per near-dup component keep
        the HIGHEST-quality member (tie → min doc_id) instead of the min-id
        member — the production corpus rule (keep the best copy, not the
        first-crawled one). Same exact-dedup prefix + LSH edges + components
        as corpus_clean_components; only the election criterion differs, so
        the two graded queries isolate it. Ranking orders by round(quality,
        6) on BOTH engines (the 6-dp grid the oracles already hash-agree
        on), never by the raw double."""
        from pyspark.sql import Window
        from quadtree_block_compression_spark.functions.cache import persist_tracked
        from quadtree_block_compression_spark.operators.components import (
            connected_components)
        (docs,) = _tables(spark, sf, "documents")
        ann = text_analysis.annotate(docs)
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        exact = persist_tracked(
            ann.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
        pairs = dedup_text.minhash_lsh_pairs(exact, n=_NGRAM_N, num_perm=_NUM_PERM,
                                             bands=_BANDS, threshold=0.5,
                                             max_bucket=_MAX_BUCKET)
        comp = connected_components(exact, pairs)
        scored = comp.join(
            exact.select("doc_id", F.round("quality", 6).alias("quality")),
            "doc_id")
        we = Window.partitionBy("component_id").orderBy(
            F.desc("quality"), F.asc("doc_id"))
        return (scored.withColumn("_rn", F.row_number().over(we))
                .select("doc_id", "component_id", "component_size", "quality",
                        (F.col("_rn") == 1).alias("is_kept")))

    def corpus_split(spark, sf):
        """LEAKAGE-SAFE train/val/test split: assignment by near-dup
        COMPONENT, not by row — every member of a connected component over
        the LSH pair edges inherits the component's split, so no near-dup
        pair ever straddles train/test (the eval-contamination failure mode
        of row-wise splitting). Same exact-dedup + LSH + components prefix
        as corpus_clean_components; the tail is one pure hash-bucket
        projection (sampling.leakage_safe_split), zero extra shuffles."""
        from pyspark.sql import Window
        from quadtree_block_compression_spark.functions.cache import persist_tracked
        from quadtree_block_compression_spark.operators.components import (
            connected_components)
        from quadtree_block_compression_spark.operators.sampling import (
            leakage_safe_split)
        (docs,) = _tables(spark, sf, "documents")
        ann = text_analysis.annotate(docs)
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        exact = persist_tracked(
            ann.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
        pairs = dedup_text.minhash_lsh_pairs(exact, n=_NGRAM_N, num_perm=_NUM_PERM,
                                             bands=_BANDS, threshold=0.5,
                                             max_bucket=_MAX_BUCKET)
        comp = connected_components(exact, pairs)
        return (leakage_safe_split(comp)
                .select("doc_id", "component_id", "component_size", "split"))

    def pii_redact_docs(spark, sf):
        """PII scrub over the corpus. The word-soup testdata carries no PII,
        so the query SEEDS deterministic PII (emails/phones/SSNs/IPs keyed
        by doc_id residues, mirrored verbatim in the oracle) before running
        the redactor — the gate then grades real detections and real
        replacements, not an all-zeros pass."""
        from quadtree_block_compression_spark.operators.text_analysis import (
            pii_redact)
        (docs,) = _tables(spark, sf, "documents")
        d = F.col("doc_id")
        seeded = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(d % 5 == 0,
                       F.concat(F.lit(" reach me at user"), d.cast("string"),
                                F.lit("@mail.example.com")))
                .otherwise(F.lit("")),
                F.when(d % 7 == 0, F.lit(" call 555-123-4567 now"))
                .otherwise(F.lit("")),
                F.when(d % 11 == 0, F.lit(" ssn 123-45-6789 leaked"))
                .otherwise(F.lit("")),
                F.when(d % 13 == 0,
                       F.concat(F.lit(" host 10.0."), (d % 256).cast("string"),
                                F.lit(".1")))
                .otherwise(F.lit("")),
            ).alias("text"))
        return pii_redact(seeded).select(
            "doc_id", "text_redacted", "n_email", "n_ssn", "n_phone", "n_ip",
            "has_pii")

    def doc_repetition(spark, sf):
        """Gopher-rule repetition signals per doc (top-term dominance +
        duplicate-bigram mass) — one HOF projection, no shuffle."""
        from quadtree_block_compression_spark.operators.text_analysis import (
            repetition_features)
        (docs,) = _tables(spark, sf, "documents")
        return repetition_features(docs)

    def doc_chunks(spark, sf):
        """Context-window packing: 32-token sliding chunks with 8 tokens of
        overlap per document — one HOF projection + bounded explode, no
        shuffle (text_analysis.chunk_documents)."""
        from quadtree_block_compression_spark.operators.text_analysis import (
            chunk_documents)
        (docs,) = _tables(spark, sf, "documents")
        return chunk_documents(docs, chunk_tokens=32, overlap=8)

    def text_embed_hashed(spark, sf):
        """Feature-hashing (hashing-trick) text embeddings — the
        vocabulary-free deterministic vectorizer bridging the text side to
        the ANN tiers; portable-hash dims/signs so DuckDB reproduces the
        vectors bit-for-bit. Output exploded to (doc_id, dim, val) rows —
        scalar columns hash robustly across engines."""
        from quadtree_block_compression_spark.operators.embed_text import (
            hashed_embedding)
        (docs,) = _tables(spark, sf, "documents")
        emb = hashed_embedding(docs, dim=64)
        return (emb.select("doc_id", F.posexplode("embedding")
                           .alias("dim", "val"))
                .select("doc_id", F.col("dim").cast("int").alias("dim"),
                        "val"))

    def decontaminate_docs(spark, sf):
        """Benchmark decontamination: corpus docs sharing any word 8-gram
        with the benchmark set (deterministically, every 50th doc — a
        self-contamination audit, so benchmark members flag themselves).
        Broadcast benchmark shingles; the corpus side is never shuffled."""
        from quadtree_block_compression_spark.operators.contamination import (
            ngram_contamination)
        (docs,) = _tables(spark, sf, "documents")
        bench = docs.where(F.col("doc_id") % 50 == 0)
        return ngram_contamination(docs, bench, n=8)

    def tile_range_query(spark, sf):
        from quadtree_block_compression_spark.operators.tile_range import tile_range_scan
        from quadtree_block_compression_spark.functions.cache import persist_tracked
        images = _fixture_images(spark, 16)
        # persisted: side=None runs a side-discovery action before the scan —
        # uncached, the assign_tiles pixel UDF would execute twice
        blocks = persist_tracked(tiling.assign_tiles(images))
        # window over the upper-left 32×32 px at level 2; canvas sides are
        # auto-derived per image (the fixture mixes 8..128 px canvases)
        return (tile_range_scan(blocks, 0, 0, 32, 32, level=2)
                .select("image_id", "tile_id", "x0", "y0", "x1", "y1", "morton"))

    def lineage_rollup(spark, sf):
        from quadtree_block_compression_spark.plans.lineage import (
            partition_lineage, lineage_summary)
        images = _fixture_images(spark, 16)
        blocks = tiling.assign_tiles(images, repartition=8)
        return lineage_summary(partition_lineage(blocks, "tile_assign")).select(
            "stage", "rows_total")

    # Dict ORDER is deliberate (VERDICT r5 #1): the driver's correctness
    # gate samples the FIRST 50 entries, so the queries with the least
    # driver evidence lead — first the 12 never driver-graded (r5-new),
    # then the entries last graded in r3/r4, then the r5-graded block
    # (all 50 of which are green in CORRECTNESS_r05.json) rotated to the
    # tail to re-enter the sample in later rounds. Same 80 queries, same
    # oracle SQL — rotation changes evidence coverage, not computation.
    out = {
        # --- never driver-graded (r5-new) ---
        "blocks_pip_join": blocks_pip_join,
        "compact_cover_rects": compact_cover_rects,
        "rect_overlap_join": rect_overlap_join,
        "knn_corpus": knn_corpus,
        "image_dedup_clusters": image_dedup_clusters,
        "image_caption_dedup": image_caption_dedup,
        "multimodal_dedup_clusters": multimodal_dedup_clusters_q,
        "versioned_read": versioned_read,
        "versioned_incremental": versioned_incremental,
        "versioned_merge": versioned_merge,
        "boilerplate_removal": boilerplate_removal,
        "boilerplate_docs": boilerplate_docs,
        # --- last driver-graded in r3/r4 ---
        "spatial_distance_join": spatial_distance_join,
        "events_asof_join": events_asof_join,
        "knn_points": knn_points,
        "quadtree_tile_assign": quadtree_tile_assign,
        "quadtree_roundtrip": quadtree_roundtrip,
        "block_dedup_exact": block_dedup_exact,
        "block_near_dedup": block_near_dedup,
        "block_dedup_clusters": block_dedup_clusters,
        "image_features": image_features,
        "interpolator_matrix": interpolator_matrix,
        "archive_roundtrip": archive_roundtrip,
        "block_size_extremes": block_size_extremes,
        "tile_pyramid_rollup": tile_pyramid_rollup,
        "image_near_dup_phash": image_near_dup_phash,
        "audio_features": audio_features,
        "video_frame_stats": video_frame_stats,
        "tile_range_query": tile_range_query,
        "lineage_rollup": lineage_rollup,
        # --- driver-graded green in r5 (rotated to the tail) ---
        "q1_pricing_summary": q1_pricing_summary,
        "q3_revenue_by_order": q3_revenue_by_order,
        "q10_returned_revenue": q10_returned_revenue,
        "q18_large_orders": q18_large_orders,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q6_forecast_revenue": q6_forecast_revenue,
        "events_rollup": events_rollup,
        "topk_orders_per_customer": topk_orders_per_customer,
        "events_tumbling": events_tumbling,
        "events_sessionize": events_sessionize,
        "events_json_stats": events_json_stats,
        "dedup_exact_docs": dedup_exact_docs,
        "fingerprint_docs": fingerprint_docs,
        "corpus_clean": corpus_clean,
        "corpus_clean_components": corpus_clean_components,
        "dedup_elect_quality": dedup_elect_quality,
        "corpus_split": corpus_split,
        "pii_redact": pii_redact_docs,
        "decontaminate": decontaminate_docs,
        "doc_repetition": doc_repetition,
        "doc_chunks": doc_chunks,
        "text_embed_hashed": text_embed_hashed,
        "token_counts": token_counts,
        "text_quality": text_quality,
        "lang_id": lang_id,
        "ngram_jaccard": ngram_jaccard,
        "minhash_signatures": minhash_signatures,
        "minhash_lsh_pairs": minhash_lsh_pairs,
        "dedup_components": dedup_components,
        "dedup_incremental": dedup_incremental,
        "corpus_weighted_sample": corpus_weighted_sample,
        "corpus_mix_sample": corpus_mix_sample,
        "pack_docs": pack_docs,
        "events_funnel": events_funnel,
        "dedup_components_logn": dedup_components_logn,
        "corpus_sample": corpus_sample,
        "vocab_topk": vocab_topk,
        "corpus_stats": corpus_stats,
        "simhash_docs": simhash_docs,
        "simhash_pairs": simhash_pairs,
        "ann_topk": ann_topk,
        "ann_lsh_topk": ann_lsh_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "embedding_near_dup": embedding_near_dup,
        "cell_assign": cell_assign,
        "spatial_join_rects": spatial_join_rects,
        "spatial_join_salted_rects": spatial_join_salted_rects,
        "spatial_join_triangles": spatial_join_triangles,
        "rasterize_rects": rasterize_rects,
        "zonal_stats_rects": zonal_stats_rects,
    }
    # Release the previous query's tracked caches at each query boundary: a
    # long-lived driver session running the whole suite would otherwise pin
    # every operator's persisted intermediates (shingle/bucket/signature/kNN
    # tables) in the block manager for the session lifetime. Unpersist is
    # correctness-safe mid-plan (blocks recompute from lineage), so releasing
    # at the START of the next query never breaks a not-yet-collected result.
    # Caveat (accepted trade): a driver that BUILDS many lazy queries before
    # evaluating any would see earlier queries' caches released pre-execution
    # — still correct, just recomputed; the observed driver interleaves
    # build+collect per query, which this is tuned for.
    return {name: _with_cache_release(fn) for name, fn in out.items()}


def _with_cache_release(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(spark, sf):
        from quadtree_block_compression_spark.functions.cache import release_caches
        release_caches()
        return fn(spark, sf)

    return wrapper


# ----------------------------------------------------------------- oracle --


def oracle_sql() -> dict[str, str]:
    from quadtree_block_compression_spark.operators.components import (
        components_recursive_sql)
    from quadtree_block_compression_spark.operators.text_analysis import (
        PII_PATTERNS)
    h64 = portable_hash64_sql
    # the IDENTICAL Java∩RE2 regexes the engine applies (text_analysis
    # guarantees the common subset) — interpolated, never retyped
    _pii = dict(PII_PATTERNS)
    _EM, _SSNP, _PH, _IPP = (_pii[k] for k in ("EMAIL", "SSN", "PHONE", "IP"))

    morton_sql = ("(SELECT CAST(sum(((ix >> i.i) & 1)::BIGINT * power(2, 2*i.i)::BIGINT "
                  "+ ((iy >> i.i) & 1)::BIGINT * power(2, 2*i.i+1)::BIGINT) AS BIGINT) "
                  "FROM range(8) i(i))")

    # (geom_id, ix, iy) of the res-8 cells whose centers lie inside each
    # nation rect — shared by the rasterize_rects and compact_cover_rects
    # oracles (cell width 4096 = 2^20/2^8; centers ix*4096+2048 can never
    # sit on the half-integer rect boundaries)
    raster_cells_sql = f"""
        WITH rr AS ({_RECT_SQL}),
        bb AS (SELECT geom_id, cx, cy, hw, hh,
                      greatest(CAST(floor((cx - hw - 0.5) / 4096) AS BIGINT), 0) AS ix0,
                      least(CAST(floor((cx + hw + 0.5) / 4096) AS BIGINT), 255) AS ix1,
                      greatest(CAST(floor((cy - hh - 0.5) / 4096) AS BIGINT), 0) AS iy0,
                      least(CAST(floor((cy + hh + 0.5) / 4096) AS BIGINT), 255) AS iy1
               FROM rr
               WHERE greatest(CAST(floor((cx - hw - 0.5) / 4096) AS BIGINT), 0)
                     <= least(CAST(floor((cx + hw + 0.5) / 4096) AS BIGINT), 255)
                 AND greatest(CAST(floor((cy - hh - 0.5) / 4096) AS BIGINT), 0)
                     <= least(CAST(floor((cy + hh + 0.5) / 4096) AS BIGINT), 255)),
        ggx AS (SELECT geom_id, cx, cy, hw, hh, iy0, iy1,
                       unnest(range(ix0, ix1 + 1)) AS ix FROM bb),
        gg AS (SELECT geom_id, cx, cy, hw, hh, ix,
                      unnest(range(iy0, iy1 + 1)) AS iy FROM ggx)
        SELECT geom_id, ix, iy
        FROM gg
        WHERE ix * 4096 + 2048 > cx - hw - 0.5 AND ix * 4096 + 2048 < cx + hw + 0.5
          AND iy * 4096 + 2048 > cy - hh - 0.5 AND iy * 4096 + 2048 < cy + hh + 0.5
    """

    # compact_cells unrolled: res rounds of (complete-sibling aggregate →
    # promote parents, anti-join out their children), identical to the
    # engine's loop
    _cc_parts = [f"cur{_RES} AS (SELECT DISTINCT geom_id, ix, iy "
                 f"FROM ({raster_cells_sql}))"]
    _cc_sels = []
    for _r in range(_RES, 0, -1):
        _cc_parts.append(
            f"full{_r} AS (SELECT geom_id, "
            f"CAST(floor(ix / 2) AS BIGINT) AS pix, "
            f"CAST(floor(iy / 2) AS BIGINT) AS piy "
            f"FROM cur{_r} GROUP BY 1, 2, 3 HAVING count(*) = 4)")
        _cc_parts.append(
            f"kept{_r} AS (SELECT c.geom_id, {_r} AS res, c.ix, c.iy "
            f"FROM cur{_r} c ANTI JOIN full{_r} f "
            f"ON f.geom_id = c.geom_id "
            f"AND f.pix = CAST(floor(c.ix / 2) AS BIGINT) "
            f"AND f.piy = CAST(floor(c.iy / 2) AS BIGINT))")
        _cc_parts.append(
            f"cur{_r - 1} AS (SELECT geom_id, pix AS ix, piy AS iy "
            f"FROM full{_r})")
        _cc_sels.append(f"SELECT * FROM kept{_r}")
    _cc_sels.append("SELECT geom_id, 0 AS res, ix, iy FROM cur0")
    compact_rounds_sql = ",\n".join(_cc_parts)
    compact_union_sql = " UNION ALL ".join(_cc_sels)

    simhash_bits_sql = " + ".join(
        f"(CASE WHEN sum(((h >> {i}) & 1) * 2 - 1) > 0 THEN CAST({1 << i} AS BIGINT) "
        f"ELSE 0 END)" for i in range(60))

    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q10_returned_revenue": """
            SELECT c_custkey, c_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
            SELECT c_custkey, c_name, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice,
                   round(total_qty, 2) AS total_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY total_qty DESC, o_orderkey
            LIMIT 20
        """,
        "q3_revenue_by_order": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM region
            JOIN nation ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "events_rollup": """
            SELECT coalesce(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
                   coalesce(event_type, 'ALL') AS event_type,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
                     AS sum_value_micros
            FROM events
            GROUP BY ROLLUP (strftime(ts, '%Y-%m-%d'), event_type)
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24
        """,
        "topk_orders_per_customer": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
            FROM orders
            QUALIFY rnk <= 3
        """,
        "events_tumbling": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
                   event_type, count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
                     AS sum_value_micros
            FROM events GROUP BY 1, 2
        """,
        "corpus_weighted_sample": f"""
            -- weight-proportional hash sampling: the SAME quality CASE
            -- product as the corpus_clean oracle, rounded to 6 on both
            -- engines BEFORE the threshold, so the floor() sees identical
            -- doubles; threshold = min(quality*0.5*1e6, 1e6)
            WITH q AS (
              SELECT doc_id, round(
                CASE WHEN length(text) >= 50 AND length(text) <= 10000 THEN 1.0 ELSE 0.3 END
                * CASE WHEN length(regexp_replace(text, '[^\\.,;:!\\?''\"]', '', 'g'))
                            / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.5 END
                * CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        w -> list_contains(['the','a','and','of','to','in','is','that','for','it'], w)))
                        / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END,
                                   1) >= 0.05
                       THEN 1.0 ELSE 0.6 END, 6) AS quality
              FROM documents)
            SELECT doc_id, quality FROM q
            WHERE {portable_hash64_sql("'wq:' || CAST(doc_id AS VARCHAR)")} % 1000000
                  < least(CAST(floor(quality * 0.5 * 1000000.0) AS BIGINT), 1000000)
        """,
        "events_funnel": """
            -- click->purchase conversion within 30 min, via DuckDB's
            -- native ASOF JOIN (right side pre-deduped per (user, ts)).
            -- ts IS NOT NULL on BOTH sides pins the engine's no-event-time-
            -- no-as-of rule (windows.py asof_join) rather than relying on
            -- the generator never emitting null timestamps (ADVICE r4).
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase' AND ts IS NOT NULL),
            r AS (SELECT user_id, ts, max(event_id) AS event_id FROM events
                  WHERE event_type = 'click' AND ts IS NOT NULL
                  GROUP BY user_id, ts),
            a AS (SELECT l.user_id, l.ts AS lts, r.ts AS rts
                  FROM l ASOF LEFT JOIN r
                    ON l.user_id = r.user_id AND l.ts >= r.ts),
            g AS (SELECT strftime(date_trunc('hour', lts), '%Y-%m-%d %H:%M:%S') AS win_start,
                         count(*) AS n_purchases,
                         CAST(sum(CASE WHEN rts IS NOT NULL
                                        AND epoch(lts) - epoch(rts) <= 1800
                                       THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
                  FROM a GROUP BY 1)
            SELECT win_start, n_purchases, n_converted,
                   round(n_converted / n_purchases, 6) AS conv_rate
            FROM g
        """,
        "events_asof_join": """
            -- independent semantics: DuckDB's NATIVE ASOF JOIN vs the
            -- Spark union+window merge-sorted plan. Right side pre-deduped
            -- to max(event_id) per (user, ts) — the tie rule both engines
            -- then share; sentinels replace NULLs (nullable BIGINT becomes
            -- float64 through pandas otherwise). ts IS NOT NULL on both
            -- sides pins the engine's null-ts-drop rule (ADVICE r4).
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase' AND ts IS NOT NULL),
            r AS (SELECT user_id, ts, max(event_id) AS event_id FROM events
                  WHERE event_type = 'click' AND ts IS NOT NULL
                  GROUP BY user_id, ts)
            SELECT l.event_id AS left_event_id, l.user_id,
                   strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS left_ts,
                   coalesce(r.event_id, -1) AS asof_event_id,
                   coalesce(strftime(r.ts, '%Y-%m-%d %H:%M:%S'),
                            '1970-01-01 00:00:00') AS asof_ts
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "spatial_distance_join": f"""
            -- brute-force O(n²) reference for the grid-bucketed radius
            -- join: every pair within 20,000; d² exact in BIGINT
            WITH p AS (
              SELECT CAST(c_custkey AS BIGINT) AS point_id,
                     CAST((CAST(c_custkey AS BIGINT) * {_PX}) % {_W} AS DOUBLE) AS wx,
                     CAST((CAST(c_custkey AS BIGINT) * {_PY}) % {_W} AS DOUBLE) AS wy
              FROM customer)
            SELECT a.point_id AS point_a, b.point_id AS point_b,
                   CAST((a.wx - b.wx) * (a.wx - b.wx)
                        + (a.wy - b.wy) * (a.wy - b.wy) AS BIGINT) AS d2
            FROM p a JOIN p b ON a.point_id < b.point_id
            WHERE (a.wx - b.wx) * (a.wx - b.wx)
                  + (a.wy - b.wy) * (a.wy - b.wy) <= 20000.0 * 20000.0
        """,
        "events_sessionize": """
            WITH marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
              -- window sum(INT) is HUGEINT in DuckDB (surfaces as float64
              -- through pandas); Spark's is BIGINT — cast to match
              SELECT user_id, ts, value,
                     CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
              FROM marked)
            SELECT user_id, session_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
                     AS sum_value_micros
            FROM sess GROUP BY user_id, session_id
        """,
        "events_json_stats": """
            -- sums of BIGINT are HUGEINT in DuckDB (float64 via pandas):
            -- CAST back to BIGINT so the driver sees int64 on both engines
            WITH kk AS (
              SELECT event_type,
                     CASE WHEN regexp_matches(
                              coalesce(json_extract_string(props, '$.k'), ''),
                              '^-?[0-9]+$')
                          THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                     END AS k
              FROM events)
            SELECT event_type, count(*) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   min(k) AS min_k, max(k) AS max_k
            FROM kk GROUP BY event_type ORDER BY event_type
        """,
        "dedup_exact_docs": f"""
            SELECT doc_id, {h64('text')} AS content_hash,
                   min(doc_id) OVER (PARTITION BY {h64('text')}) AS canonical_doc_id,
                   doc_id = min(doc_id) OVER (PARTITION BY {h64('text')}) AS is_canonical,
                   count(*) OVER (PARTITION BY {h64('text')}) AS group_size
            FROM documents
        """,
        "fingerprint_docs": f"""
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                         '\\s+', ' ', 'g')) AS n
              FROM documents)
            SELECT doc_id, {h64('n')} AS fingerprint, length(n) AS norm_len FROM norm
        """,
        "corpus_clean": f"""
            WITH norm AS (
              SELECT doc_id, text,
                     trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                         '\\s+', ' ', 'g')) AS n
              FROM documents),
            ann AS (
              SELECT doc_id, text, {portable_hash64_sql('n')} AS fingerprint FROM norm),
            exact AS (
              SELECT * FROM (
                SELECT doc_id, text, fingerprint,
                       row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
                FROM ann) WHERE rn = 1),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(arr) - {_NGRAM_N} + 1, 0) + 1),
                              i -> array_to_string(arr[i:i + {_NGRAM_N - 1}], ' '))) AS shingle
                FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr FROM exact)
              ) WHERE length(shingle) > 0),
            hashed AS (SELECT doc_id, {portable_hash64_sql('shingle')} AS h FROM sh),
            sig AS (SELECT doc_id, {_minhash_sql_select()} FROM hashed GROUP BY doc_id),
            bucketed0 AS (
              SELECT DISTINCT doc_id, band, key FROM (
                SELECT doc_id, 0 AS band, {portable_hash64_sql("CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band, {portable_hash64_sql("CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 2 AS band, {portable_hash64_sql("CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 3 AS band, {portable_hash64_sql("CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR)")} AS key FROM sig)),
            bucketed AS (
              SELECT b.* FROM bucketed0 b
              JOIN (SELECT band, key FROM bucketed0
                    GROUP BY band, key HAVING count(*) <= {_MAX_BUCKET}) s
                USING (band, key)),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bucketed a JOIN bucketed b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS i
              FROM cand c
              JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
              GROUP BY 1, 2),
            drops AS (
              SELECT DISTINCT doc_b AS doc_id FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE i / (sa.sz + sb.sz - i) >= 0.5),
            kept AS (
              SELECT e.doc_id, e.text, e.fingerprint FROM exact e
              LEFT JOIN drops d ON e.doc_id = d.doc_id WHERE d.doc_id IS NULL),
            quality AS (
              SELECT doc_id,
                CASE WHEN length(text) >= 50 AND length(text) <= 10000 THEN 1.0 ELSE 0.3 END
                * CASE WHEN length(regexp_replace(text, '[^\\.,;:!\\?''\"]', '', 'g'))
                            / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.5 END
                * CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        w -> list_contains(['the','a','and','of','to','in','is','that','for','it'], w)))
                        / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END,
                                   1) >= 0.05
                       THEN 1.0 ELSE 0.6 END AS q
              FROM kept),
            langs AS (
              SELECT k.doc_id,
                CASE WHEN greatest(s_de, s_en, s_fr) = 0 THEN 'und'
                     WHEN s_de >= s_en AND s_de >= s_fr THEN 'de'
                     WHEN s_en >= s_fr THEN 'en' ELSE 'fr' END AS lang_pred
              FROM (
                SELECT doc_id,
                  round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], x))) / greatest(len(regexp_split_to_array(lower(text), '\\s+')), 1), 6) AS s_de,
                  round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> list_contains(['the','a','and','of','to','in','is','that','for','it'], x))) / greatest(len(regexp_split_to_array(lower(text), '\\s+')), 1), 6) AS s_en,
                  round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> list_contains(['le','la','les','et','est','un','une','pas','pour','que'], x))) / greatest(len(regexp_split_to_array(lower(text), '\\s+')), 1), 6) AS s_fr
                FROM kept) k)
            SELECT k.doc_id, k.fingerprint, CAST(round(q.q, 6) AS DOUBLE) AS quality, l.lang_pred
            FROM kept k JOIN quality q ON k.doc_id = q.doc_id
            JOIN langs l ON k.doc_id = l.doc_id
            WHERE q.q >= 0.5
        """,
        "corpus_clean_components": f"""
            -- same prefix as corpus_clean; election swapped: kept = the
            -- MIN-ID CANONICAL of each connected component over the LSH
            -- pair edges (recursive CTE, min reachable id), not the greedy
            -- drop-every-doc_b rule
            WITH RECURSIVE {_components_prefix_sql()}
            kept AS (
              SELECT e.doc_id, e.text, e.fingerprint FROM exact e
              JOIN comp c ON c.doc_id = e.doc_id AND c.component_id = e.doc_id),
            quality AS (
              SELECT doc_id,
                CASE WHEN length(text) >= 50 AND length(text) <= 10000 THEN 1.0 ELSE 0.3 END
                * CASE WHEN length(regexp_replace(text, '[^\\.,;:!\\?''\\"]', '', 'g'))
                            / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.5 END
                * CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        w -> list_contains(['the','a','and','of','to','in','is','that','for','it'], w)))
                        / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END,
                                   1) >= 0.05
                       THEN 1.0 ELSE 0.6 END AS q
              FROM kept),
            langs AS (
              SELECT k.doc_id,
                CASE WHEN greatest(s_de, s_en, s_fr) = 0 THEN 'und'
                     WHEN s_de >= s_en AND s_de >= s_fr THEN 'de'
                     WHEN s_en >= s_fr THEN 'en' ELSE 'fr' END AS lang_pred
              FROM (
                SELECT doc_id,
                  round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], x))) / greatest(len(regexp_split_to_array(lower(text), '\\s+')), 1), 6) AS s_de,
                  round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> list_contains(['the','a','and','of','to','in','is','that','for','it'], x))) / greatest(len(regexp_split_to_array(lower(text), '\\s+')), 1), 6) AS s_en,
                  round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> list_contains(['le','la','les','et','est','un','une','pas','pour','que'], x))) / greatest(len(regexp_split_to_array(lower(text), '\\s+')), 1), 6) AS s_fr
                FROM kept) k)
            SELECT k.doc_id, k.fingerprint, CAST(round(q.q, 6) AS DOUBLE) AS quality, l.lang_pred
            FROM kept k JOIN quality q ON k.doc_id = q.doc_id
            JOIN langs l ON k.doc_id = l.doc_id
            WHERE q.q >= 0.5
        """,
        "dedup_elect_quality": f"""
            -- same prefix as corpus_clean_components through comp; the tail
            -- swaps the min-id election for argmax round(quality,6) (tie →
            -- min doc_id) per component — both engines rank on the same
            -- 6-dp grid the corpus_clean oracles already hash-agree on
            WITH RECURSIVE {_components_prefix_sql()}
            quality AS (
              SELECT doc_id,
                CASE WHEN length(text) >= 50 AND length(text) <= 10000 THEN 1.0 ELSE 0.3 END
                * CASE WHEN length(regexp_replace(text, '[^\\.,;:!\\?''\\"]', '', 'g'))
                            / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.5 END
                * CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        w -> list_contains(['the','a','and','of','to','in','is','that','for','it'], w)))
                        / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END,
                                   1) >= 0.05
                       THEN 1.0 ELSE 0.6 END AS q
              FROM exact),
            ranked AS (
              SELECT c.doc_id, c.component_id,
                     CAST(count(*) OVER (PARTITION BY c.component_id) AS BIGINT)
                       AS component_size,
                     CAST(round(q.q, 6) AS DOUBLE) AS quality,
                     row_number() OVER (PARTITION BY c.component_id
                                        ORDER BY round(q.q, 6) DESC, c.doc_id) AS rn
              FROM comp c JOIN quality q ON q.doc_id = c.doc_id)
            SELECT doc_id, component_id, component_size, quality,
                   rn = 1 AS is_kept
            FROM ranked
        """,
        "corpus_split": f"""
            -- same prefix as corpus_clean_components through comp; the tail
            -- assigns train/val/test by COMPONENT via the portable hash
            -- (hash('split0:' || component_id) mod 1e6 vs cumulative 0.8 /
            -- 0.9 thresholds) — leakage-safe: near-dup members share a split
            WITH RECURSIVE {_components_prefix_sql()}
            buck AS (
              SELECT doc_id, component_id,
                     {portable_hash64_sql("'split0:' || component_id")} % 1000000 AS m
              FROM comp)
            SELECT doc_id, component_id,
                   CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
                     AS component_size,
                   CASE WHEN m < 800000 THEN 'train'
                        WHEN m < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM buck
        """,
        "pii_redact": f"""
            -- identical seeding + identical Java∩RE2 patterns (interpolated
            -- from text_analysis.PII_PATTERNS), applied in the same order
            WITH seeded AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 5 = 0 THEN ' reach me at user'
                             || CAST(doc_id AS VARCHAR) || '@mail.example.com'
                        ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567 now'
                        ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789 leaked'
                        ELSE '' END
                     || CASE WHEN doc_id % 13 = 0 THEN ' host 10.0.'
                             || CAST(doc_id % 256 AS VARCHAR) || '.1'
                        ELSE '' END
                     AS text
              FROM documents)
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                     text, '{_EM}', '<EMAIL>', 'g'),
                     '{_SSNP}', '<SSN>', 'g'),
                     '{_PH}', '<PHONE>', 'g'),
                     '{_IPP}', '<IP>', 'g') AS text_redacted,
                   CAST(len(regexp_extract_all(text, '{_EM}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text, '{_SSNP}')) AS BIGINT) AS n_ssn,
                   CAST(len(regexp_extract_all(text, '{_PH}')) AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(text, '{_IPP}')) AS BIGINT) AS n_ip,
                   (len(regexp_extract_all(text, '{_EM}'))
                    + len(regexp_extract_all(text, '{_SSNP}'))
                    + len(regexp_extract_all(text, '{_PH}'))
                    + len(regexp_extract_all(text, '{_IPP}'))) > 0 AS has_pii
            FROM seeded
        """,
        "decontaminate": """
            -- word 8-gram overlap vs the every-50th-doc benchmark set;
            -- same split/slice shingling as the minhash oracles
            WITH dsh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(arr) - 8 + 1, 0) + 1),
                              i -> array_to_string(arr[i:i + 7], ' '))) AS shingle
                FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr
                      FROM documents)
              ) WHERE length(shingle) > 0),
            bsh AS (
              SELECT DISTINCT doc_id AS bench_doc, shingle FROM dsh
              WHERE doc_id % 50 = 0),
            hits AS (
              SELECT d.doc_id,
                     CAST(count(DISTINCT d.shingle) AS BIGINT) AS n_shared_ngrams,
                     CAST(min(b.bench_doc) AS BIGINT) AS bench_doc
              FROM dsh d JOIN bsh b USING (shingle)
              GROUP BY d.doc_id)
            SELECT doc.doc_id,
                   h.doc_id IS NOT NULL AS contaminated,
                   CAST(coalesce(h.n_shared_ngrams, 0) AS BIGINT) AS n_shared_ngrams,
                   CAST(coalesce(h.bench_doc, -1) AS BIGINT) AS bench_doc
            FROM documents doc LEFT JOIN hits h ON doc.doc_id = h.doc_id
        """,
        "text_embed_hashed": f"""
            -- identical hashing-trick arithmetic: dim = h mod 64, sign =
            -- bit 6 of the portable hash; cell sums are exact small
            -- integers so the norm (sum of exact integer squares) is
            -- order-independent across engines
            WITH toks AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents)
              WHERE length(tok) > 0),
            hs AS (SELECT doc_id, {portable_hash64_sql('tok')} AS h FROM toks),
            cells AS (
              SELECT doc_id, h % 64 AS d,
                     sum(CASE WHEN ((h >> 6) & 1) = 0 THEN 1.0 ELSE -1.0 END)
                       AS v
              FROM hs GROUP BY 1, 2),
            grid AS (SELECT doc_id, i
                     FROM (SELECT DISTINCT doc_id FROM documents), range(0, 64) t(i)),
            raw AS (SELECT g.doc_id, g.i, coalesce(c.v, 0.0) AS val
                    FROM grid g LEFT JOIN cells c
                      ON c.doc_id = g.doc_id AND c.d = g.i),
            nrm AS (SELECT doc_id, greatest(sqrt(sum(val * val)), 1e-12) AS n
                    FROM raw GROUP BY doc_id)
            SELECT r.doc_id, CAST(r.i AS INT) AS dim,
                   round(r.val / n.n, 6) AS val
            FROM raw r JOIN nrm n USING (doc_id)
        """,
        "doc_chunks": r"""
            -- sliding 32-token windows, stride 24 (overlap 8): window i
            -- covers tokens [i*24+1 .. min(i*24+32, n)]; count =
            -- ceil((n-8)/24) min 1 for non-blank docs, 0 for blank
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0
                          THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(trim(text), '\s+') END
                       AS toks
              FROM documents),
            c AS (SELECT doc_id, toks, len(toks) AS n FROM t),
            e AS (SELECT doc_id, toks, n,
                         unnest(range(0, CASE WHEN n = 0 THEN 0
                                              ELSE greatest(CAST(ceil((n - 8) / 24.0) AS BIGINT), 1)
                                         END)) AS i
                  FROM c)
            SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                   CAST(least(32, n - i * 24) AS INT) AS chunk_n_tokens,
                   array_to_string(toks[CAST(i * 24 + 1 AS BIGINT)
                                        :CAST(least(i * 24 + 32, n) AS BIGINT)],
                                   ' ') AS chunk_text
            FROM e
        """,
        "doc_repetition": r"""
            -- same token array, same HOF shapes as the engine projection
            WITH w AS (
              SELECT doc_id, trim(lower(text)) AS t,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS words
              FROM documents),
            b AS (
              SELECT doc_id, t, words,
                     list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                                    i -> array_to_string(words[i:i + 1], ' '))
                       AS bigrams
              FROM w)
            SELECT doc_id,
                   CASE WHEN length(t) = 0 THEN 0
                        ELSE CAST(len(words) AS BIGINT) END AS n_words,
                   CASE WHEN length(t) = 0 THEN 0.0
                        ELSE round(list_max(list_transform(list_distinct(words),
                               d -> len(list_filter(words, x -> x = d))))
                               / len(words), 6) END AS top_word_ratio,
                   CASE WHEN length(t) = 0 THEN 0.0
                        ELSE round((len(bigrams) - len(list_distinct(bigrams)))
                               / greatest(len(bigrams), 1), 6) END
                     AS dup_bigram_ratio
            FROM b
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_sub_tokens
            FROM documents
        """,
        "text_quality": r"""
            -- toks mirrors the Spark token_count() spec exactly: split
            -- TRIMMED text, 0 for blank/whitespace-only documents
            WITH f AS (
              SELECT doc_id, text, length(text) AS n_chars,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
                     len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> list_contains(['the','a','and','of','to','in','is','that','for','it'], w))) AS n_stop,
                     length(regexp_replace(text, '[^\.,;:!\?''"]', '', 'g')) AS punct,
                     length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
                     length(regexp_replace(text, '[^A-Z]', '', 'g')) AS upper
              FROM documents)
            SELECT doc_id, n_chars AS n_chars_calc, toks AS n_tokens,
                   round(punct / greatest(n_chars, 1), 6) AS punct_ratio,
                   round(n_stop / greatest(toks, 1), 6) AS stopword_ratio,
                   round(digits / greatest(n_chars, 1), 6) AS digit_ratio,
                   round(upper / greatest(n_chars, 1), 6) AS upper_ratio,
                   round((n_chars - toks + 1) / greatest(toks, 1), 6) AS mean_word_len
            FROM f
        """,
        "lang_id": r"""
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words,
                     greatest(len(regexp_split_to_array(lower(text), '\s+')), 1) AS n
              FROM documents),
            scored AS (
              SELECT doc_id,
                round(len(list_filter(words, x -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], x))) / n, 6) AS s_de,
                round(len(list_filter(words, x -> list_contains(['the','a','and','of','to','in','is','that','for','it'], x))) / n, 6) AS s_en,
                round(len(list_filter(words, x -> list_contains(['le','la','les','et','est','un','une','pas','pour','que'], x))) / n, 6) AS s_fr
              FROM w)
            SELECT doc_id,
                   CASE WHEN greatest(s_de, s_en, s_fr) = 0 THEN 'und'
                        WHEN s_de >= s_en AND s_de >= s_fr THEN 'de'
                        WHEN s_en >= s_fr THEN 'en'
                        ELSE 'fr' END AS lang_pred,
                   greatest(s_de, s_en, s_fr) AS lang_score
            FROM scored
        """,
        "ngram_jaccard": f"""
            WITH sh0 AS ({_SHINGLE_SQL}),
            -- df cap mirrors ngram_jaccard_pairs(max_df={_MAX_DF}): Jaccard is
            -- computed over the capped shingle sets on both sides
            sh AS (
              SELECT doc_id, shingle FROM (
                SELECT doc_id, shingle,
                       count(*) OVER (PARTITION BY shingle) AS df
                FROM sh0) WHERE df <= {_MAX_DF}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(i / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE i / (sa.sz + sb.sz - i) >= {_JACCARD_T}
        """,
        "minhash_signatures": _MINHASH_SIG_SQL,
        "minhash_lsh_pairs": _minhash_pairs_sql,
        # connected components over the SAME minhash pair edges: DuckDB
        # recursive CTE (min reachable id per node) — independent semantics
        # for the Spark min-label propagation loop
        "dedup_components": components_recursive_sql(
            "SELECT doc_id FROM documents", _minhash_pairs_sql),
        "dedup_incremental": f"""
            -- batch-vs-corpus dedup: corpus = doc_id < 250, batch = doc_id
            -- >= 250 plus ten re-keyed (+10000) exact copies of corpus
            -- docs. Same portable-hash minhash machinery as
            -- minhash_lsh_pairs, over the corpus∪batch union; candidates
            -- restricted to pairs whose LARGER member is a batch doc
            -- (ids order corpus < batch, so this excludes exactly
            -- corpus×corpus); election precedence exact > near(corpus) >
            -- near_new(batch), sentinel -1
            WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
            newb AS (SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 10
                     UNION ALL
                     SELECT doc_id, text FROM documents WHERE doc_id >= 250),
            alldocs AS (SELECT * FROM corpus UNION ALL SELECT * FROM newb),
            sig AS ({_minhash_sig_sql('alldocs')}),
            bucketed0 AS (
              SELECT DISTINCT doc_id, band, key FROM (
                SELECT doc_id, 0 AS band, {portable_hash64_sql("CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band, {portable_hash64_sql("CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 2 AS band, {portable_hash64_sql("CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)")} AS key FROM sig
                UNION ALL
                SELECT doc_id, 3 AS band, {portable_hash64_sql("CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR)")} AS key FROM sig)),
            bucketed AS (
              SELECT b.* FROM bucketed0 b
              JOIN (SELECT band, key FROM bucketed0
                    GROUP BY band, key HAVING count(*) <= {_MAX_BUCKET}) s
                USING (band, key)),
            cand AS (
              SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
              FROM bucketed a JOIN bucketed b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
              WHERE b.doc_id >= 250),
            shv AS ({_shingle_sql('alldocs')}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM shv GROUP BY doc_id),
            inter AS (
              SELECT c.a, c.b, count(*) AS i
              FROM cand c
              JOIN shv x ON x.doc_id = c.a
              JOIN shv y ON y.doc_id = c.b AND y.shingle = x.shingle
              GROUP BY 1, 2),
            near AS (
              SELECT a, b FROM inter
              JOIN sizes sa ON sa.doc_id = a
              JOIN sizes sb ON sb.doc_id = b
              WHERE i / (sa.sz + sb.sz - i) >= {_JACCARD_T}),
            exact AS (
              SELECT n.doc_id AS b, min(c.doc_id) AS exact_of
              FROM newb n JOIN corpus c
                ON {portable_hash64_sql('n.text')} = {portable_hash64_sql('c.text')}
              GROUP BY 1),
            near_cor AS (SELECT b, min(a) AS near_of FROM near
                         WHERE a < 250 GROUP BY b),
            near_new AS (SELECT b, min(a) AS nearnew_of FROM near
                         WHERE a >= 250 GROUP BY b)
            SELECT nb.doc_id,
                   CASE WHEN e.exact_of IS NOT NULL THEN 'exact'
                        WHEN nc.near_of IS NOT NULL THEN 'near'
                        WHEN nn.nearnew_of IS NOT NULL THEN 'near_new'
                        ELSE 'unique' END AS dup_tier,
                   coalesce(e.exact_of, nc.near_of, nn.nearnew_of, -1) AS dup_of
            FROM newb nb
            LEFT JOIN exact e ON e.b = nb.doc_id
            LEFT JOIN near_cor nc ON nc.b = nb.doc_id
            LEFT JOIN near_new nn ON nn.b = nb.doc_id
        """,

        # the large-star/small-star tier computes the IDENTICAL clusters, so
        # it grades against the same independent recursive-CTE semantics
        "dedup_components_logn": components_recursive_sql(
            "SELECT doc_id FROM documents", _minhash_pairs_sql),
        "corpus_sample": f"""
            -- mirrors stratified_hash_sample(salt='r3', mod 1e6): the
            -- selection is a pure hash predicate, identical on both engines
            SELECT doc_id, source, lang, n_chars FROM documents
            WHERE {portable_hash64_sql("'r3:' || CAST(doc_id AS VARCHAR)")} % 1000000
                  < CASE source WHEN 'src0' THEN 1000000
                                WHEN 'src1' THEN 500000
                                WHEN 'src2' THEN 200000
                                ELSE 100000 END
        """,
        "corpus_mix_sample": f"""
            -- mixture_sample replica: all-integer quota arithmetic
            -- (T = min floor(n_s*W/w_s); t_s = floor(w_s*T/W)), selection =
            -- first t_s rows per stratum by (portable hash, doc_id)
            WITH sized AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
              FROM documents),
            strat AS (
              SELECT doc_id,
                     CASE WHEN n < 40 THEN 'short'
                          WHEN n < 70 THEN 'medium'
                          ELSE 'long' END AS stratum
              FROM sized),
            counts AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_s
                       FROM strat GROUP BY stratum),
            weights(stratum, w_s) AS (VALUES ('long', 1), ('medium', 2), ('short', 1)),
            caps AS (
              SELECT w.stratum, w.w_s, coalesce(c.n_s, 0) AS n_s
              FROM weights w LEFT JOIN counts c ON c.stratum = w.stratum),
            tt AS (SELECT min((n_s * 4) // w_s) AS t_total FROM caps),
            quotas AS (
              SELECT stratum, (w_s * (SELECT t_total FROM tt)) // 4 AS t_s
              FROM caps),
            ranked AS (
              SELECT s.doc_id, s.stratum,
                     row_number() OVER (
                       PARTITION BY s.stratum
                       ORDER BY {portable_hash64_sql("'mx:' || CAST(s.doc_id AS VARCHAR)")},
                                s.doc_id) AS pick_rank
              FROM strat s)
            SELECT r.doc_id, r.stratum, CAST(r.pick_rank AS BIGINT) AS pick_rank
            FROM ranked r JOIN quotas q ON q.stratum = r.stratum
            WHERE r.pick_rank <= q.t_s
        """,
        "pack_docs": f"""
            -- pack_sequences replica: shard = hash(id) % 8, per-shard
            -- running token sum (HUGEINT window sum cast to BIGINT), pack =
            -- start DIV 64 within the shard, globally keyed pack*8+part
            WITH sized AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                     {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % 8 AS part
              FROM documents),
            started AS (
              SELECT doc_id, n_tokens, part,
                     CAST(sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS s
              FROM sized)
            SELECT doc_id, n_tokens, part,
                   (s // 64) * 8 + part AS pack_id,
                   s % 64 AS pack_offset
            FROM started
        """,
        "vocab_topk": """
            WITH toks AS (
              SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents),
            counts AS (
              SELECT token, CAST(count(*) AS BIGINT) AS n
              FROM toks WHERE length(token) > 0 GROUP BY token)
            SELECT token, n,
                   CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank
            FROM counts QUALIFY rank <= 200
        """,
        "corpus_stats": """
            -- exact discrete quantiles: element at rank floor((n-1)q)+1
            -- under (value, id) total order — identical integer math
            WITH ranked AS (
              SELECT source, n_chars, doc_id,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars, doc_id) AS rn,
                     count(*) OVER (PARTITION BY source) AS cnt
              FROM documents)
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total,
                   min(n_chars) AS min_v,
                   max(n_chars) AS max_v,
                   max(CASE WHEN rn = CAST(floor((cnt - 1) * 0.5) AS BIGINT) + 1
                            THEN n_chars END) AS p50,
                   max(CASE WHEN rn = CAST(floor((cnt - 1) * 0.95) AS BIGINT) + 1
                            THEN n_chars END) AS p95
            FROM ranked GROUP BY source
        """,
        "simhash_docs": f"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
              FROM documents),
            hashed AS (
              SELECT doc_id, {h64('tok')} AS h FROM toks WHERE length(tok) > 0)
            SELECT doc_id, {simhash_bits_sql} AS simhash
            FROM hashed GROUP BY doc_id
        """,
        "simhash_pairs": f"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
              FROM documents),
            hashed AS (
              SELECT doc_id, {h64('tok')} AS h FROM toks WHERE length(tok) > 0),
            sig AS (
              SELECT doc_id, {simhash_bits_sql} AS simhash
              FROM hashed GROUP BY doc_id),
            keyed0 AS (
              SELECT doc_id, simhash, 0 AS si, (simhash >> 0) & 32767 AS sv FROM sig
              UNION ALL
              SELECT doc_id, simhash, 1, (simhash >> 15) & 32767 FROM sig
              UNION ALL
              SELECT doc_id, simhash, 2, (simhash >> 30) & 32767 FROM sig
              UNION ALL
              SELECT doc_id, simhash, 3, (simhash >> 45) & 32767 FROM sig),
            -- mirrors max_bucket={_MAX_BUCKET} on the segment buckets
            keyed AS (
              SELECT k.* FROM keyed0 k
              JOIN (SELECT si, sv FROM keyed0
                    GROUP BY si, sv HAVING count(*) <= {_MAX_BUCKET}) g
                USING (si, sv)),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.simhash AS ha, b.simhash AS hb
              FROM keyed a JOIN keyed b
                ON a.si = b.si AND a.sv = b.sv AND a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, bit_count(xor(ha, hb)) AS hamming
            FROM pairs WHERE bit_count(xor(ha, hb)) <= 30
        """,
        "ann_topk": f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            en AS (SELECT vec_id, {_UNIT_SQL.format(v='v')} AS vn FROM e),
            q AS (SELECT vec_id AS q_id, vn AS qn FROM en WHERE vec_id < 10),
            cand AS (
              SELECT q.q_id, en.vec_id,
                     {_NDOT_SQL.format(d=_LSH_DIM, a='en.vn', b='q.qn')} AS cos
              FROM en, q WHERE en.vec_id <> q.q_id)
            SELECT q_id, vec_id, cos,
                   CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INT) AS rank
            FROM cand QUALIFY rank <= 5
        """,
        "ann_lsh_topk": f"""
            -- mirrors cosine_topk_lsh(multiprobe=True, target_bucket=
            -- {_LSH_TOPK_TARGET}, max_bucket={_LSH_TOPK_MAX_BUCKET}):
            -- auto_num_planes(500, {_LSH_TOPK_TARGET}) == {_LSH_PLANES} at this gate SF;
            -- per-tier degenerate buckets are dropped from the DATA side; each
            -- query probes its half-key bucket and every Hamming-1 neighbor,
            -- i.e. candidates with bit_count(xor(half keys)) <= 1
            WITH {_lsh_keyed_sql()},
            k1t AS (SELECT vec_id, k1 AS kk FROM kb
                    QUALIFY count(*) OVER (PARTITION BY k1) <= {_LSH_TOPK_MAX_BUCKET}),
            k2t AS (SELECT vec_id, k2 AS kk FROM kb
                    QUALIFY count(*) OVER (PARTITION BY k2) <= {_LSH_TOPK_MAX_BUCKET}),
            q AS (SELECT vec_id AS q_id, vn AS qn, k1, k2 FROM kb WHERE vec_id < 10),
            cand AS (
              SELECT DISTINCT vec_id, q_id FROM (
                SELECT e.vec_id, q.q_id FROM k1t e, q
                WHERE bit_count(xor(e.kk, q.k1)) <= 1
                UNION ALL
                SELECT e.vec_id, q.q_id FROM k2t e, q
                WHERE bit_count(xor(e.kk, q.k2)) <= 1)
              WHERE vec_id <> q_id),
            scored AS (
              SELECT c.q_id, c.vec_id,
                     {_NDOT_SQL.format(d=_LSH_DIM, a='e.vn', b='q.qn')} AS cos
              FROM cand c JOIN kb e ON e.vec_id = c.vec_id
                          JOIN q ON q.q_id = c.q_id)
            SELECT q_id, vec_id, cos,
                   CAST(row_number() OVER (PARTITION BY q_id
                        ORDER BY cos DESC, vec_id) AS INT) AS rank
            FROM scored QUALIFY rank <= 5
        """,
        "embedding_near_dup": f"""
            -- mirrors embedding_near_dup_pairs(num_planes=auto, max_bucket=
            -- {_LSH_MAX_BUCKET}): auto_num_planes(500, 32) == {_LSH_PLANES} at this gate SF
            -- (the embedded hyperplane constants), and per-tier buckets larger
            -- than the cap are dropped before the self-join
            WITH {_lsh_keyed_sql()},
            k1t AS (SELECT vec_id, k1 AS kk FROM kb
                    QUALIFY count(*) OVER (PARTITION BY k1) <= {_LSH_MAX_BUCKET}),
            k2t AS (SELECT vec_id, k2 AS kk FROM kb
                    QUALIFY count(*) OVER (PARTITION BY k2) <= {_LSH_MAX_BUCKET}),
            cand AS (
              SELECT DISTINCT vec_a, vec_b FROM (
                SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
                FROM k1t a JOIN k1t b ON a.kk = b.kk AND a.vec_id < b.vec_id
                UNION ALL
                SELECT a.vec_id, b.vec_id
                FROM k2t a JOIN k2t b ON a.kk = b.kk AND a.vec_id < b.vec_id)),
            scored AS (
              SELECT c.vec_a, c.vec_b,
                     {_NDOT_SQL.format(d=_LSH_DIM, a='a.vn', b='b.vn')} AS cos
              FROM cand c JOIN kb a ON a.vec_id = c.vec_a
                          JOIN kb b ON b.vec_id = c.vec_b)
            SELECT vec_a, vec_b, cos FROM scored WHERE cos >= {_NEAR_DUP_COS}
        """,
        "cell_assign": f"""
            WITH p AS (
              SELECT CAST(c_custkey AS VARCHAR) AS point_id,
                     (c_custkey * {_PX}) % {_W} AS px,
                     (c_custkey * {_PY}) % {_W} AS py
              FROM customer),
            g AS (SELECT point_id, px >> 12 AS ix, py >> 12 AS iy FROM p)
            SELECT point_id,
                   {morton_sql} + CAST({_RES} AS BIGINT) * 288230376151711744 AS cell
            FROM g
        """,
        "spatial_join_rects": f"""
            WITH p AS ({_POINT_SQL}), r AS ({_RECT_SQL})
            SELECT p.point_id, r.geom_id
            FROM p, r
            WHERE p.px > r.cx - r.hw - 0.5 AND p.px < r.cx + r.hw + 0.5
              AND p.py > r.cy - r.hh - 0.5 AND p.py < r.cy + r.hh + 0.5
        """,
        "spatial_join_salted_rects": f"""
            WITH p AS ({_POINT_SQL}), r AS ({_RECT_SQL})
            SELECT p.point_id, r.geom_id
            FROM p, r
            WHERE p.px > r.cx - r.hw - 0.5 AND p.px < r.cx + r.hw + 0.5
              AND p.py > r.cy - r.hh - 0.5 AND p.py < r.cy + r.hh + 0.5
        """,
        "spatial_join_triangles": f"""
            WITH p AS ({_POINT_SQL}), t AS ({_TRI_SQL})
            SELECT p.point_id, t.geom_id
            FROM p, t
            WHERE (t.bx-t.ax)*(p.py-t.ay) - (t.by-t.ay)*(p.px-t.ax) > 0
              AND (t.cx-t.bx)*(p.py-t.by) - (t.cy-t.by)*(p.px-t.bx) > 0
              AND (t.ax-t.cx)*(p.py-t.cy) - (t.ay-t.cy)*(p.px-t.cx) > 0
        """,
        "rasterize_rects": f"""
            -- vector→raster: res-8 grid (cell width 4096 = 2^20/2^8), the
            -- cells whose CENTERS (ix*4096+2048) fall strictly inside each
            -- rect; Morton packing identical to cell_assign's. Two staged
            -- unnests inside raster_cells_sql (DuckDB zips same-SELECT
            -- unnests, so the cross product needs two CTEs).
            SELECT geom_id, CAST(ix AS INT) AS ix, CAST(iy AS INT) AS iy,
                   {morton_sql} + CAST({_RES} AS BIGINT) * 288230376151711744 AS cell
            FROM ({raster_cells_sql}) g
        """,
        "compact_cover_rects": f"""
            -- H3-compact on the Z-order grid: the engine's bottom-up loop
            -- (complete 4-sibling sets promoted to their parent, children
            -- anti-joined out) unrolled as {_RES} rounds of chained CTEs
            -- over the shared rasterized cell set. Morton over range(8)
            -- bits is exact at every res (high bits are zero for coarse
            -- cells), matching kernels.geometry.cell_from_grid.
            WITH {compact_rounds_sql},
            u AS ({compact_union_sql})
            SELECT geom_id, CAST(res AS INT) AS res,
                   CAST(ix AS INT) AS ix, CAST(iy AS INT) AS iy,
                   {morton_sql} + CAST(res AS BIGINT) * 288230376151711744 AS cell
            FROM u
        """,
        "blocks_pip_join": f"""
            -- the block→polygon join replayed over the FROZEN golden
            -- blocks: identical mosaic affine (idx from image_id digits,
            -- canvas scaled onto one 16384-wide mosaic cell — all powers
            -- of two, so wx/wy are float-exact multiples of 64), then
            -- open-interval rect containment. Kernel drift (different
            -- leaves → different centroids) fails the hash.
            WITH leaves AS (
              SELECT image_id, tile_id, level, x0, y0, x1, y1
              FROM read_parquet('{_BLOCKS_GOLDEN}') WHERE is_leaf),
            pts AS (
              SELECT image_id, tile_id,
                     CAST(regexp_extract(image_id, '(\\d+)$', 1) AS BIGINT) AS idx,
                     (x1 - x0) * power(2.0, level) AS side,
                     x0, y0, x1, y1
              FROM leaves),
            w AS (
              SELECT image_id, tile_id,
                     (idx % 64) * 16384.0
                       + ((x0 + x1) / 2.0) * 16384.0 / side AS wx,
                     (CAST(floor(idx / 64) AS BIGINT) % 64) * 16384.0
                       + ((y0 + y1) / 2.0) * 16384.0 / side AS wy
              FROM pts),
            r AS ({_STRIP_RECT_SQL})
            SELECT w.image_id, w.tile_id, r.geom_id,
                   round(wx, 6) AS wx, round(wy, 6) AS wy
            FROM w, r
            WHERE wx > r.cx - r.hw - 0.5 AND wx < r.cx + r.hw + 0.5
              AND wy > r.cy - r.hh - 0.5 AND wy < r.cy + r.hh + 0.5
        """,
        "rect_overlap_join": f"""
            -- strict-AABB overlap join (RectanglesCollide semantics:
            -- touching edges do NOT collide); customer bounds are integer,
            -- nation bounds half-integer, so no boundary coincidence can
            -- probe the strict-vs-nonstrict seam. inter_area_x4 = 4× the
            -- intersection area, exactly integer at these magnitudes.
            WITH a AS (
              SELECT CAST(c_custkey AS VARCHAR) AS rect_a,
                     CAST((c_custkey * {_PX}) % {_W}
                          - (2000 + (c_custkey % 5) * 1000) AS DOUBLE) AS ax0,
                     CAST((c_custkey * {_PY}) % {_W}
                          - (3000 + (c_custkey % 7) * 1000) AS DOUBLE) AS ay0,
                     CAST((c_custkey * {_PX}) % {_W}
                          + (2000 + (c_custkey % 5) * 1000) AS DOUBLE) AS ax1,
                     CAST((c_custkey * {_PY}) % {_W}
                          + (3000 + (c_custkey % 7) * 1000) AS DOUBLE) AS ay1
              FROM customer),
            b AS (
              SELECT geom_id AS rect_b,
                     cx - hw - 0.5 AS bx0, cy - hh - 0.5 AS by0,
                     cx + hw + 0.5 AS bx1, cy + hh + 0.5 AS by1
              FROM ({_RECT_SQL}))
            SELECT rect_a, rect_b,
                   CAST((least(ax1, bx1) - greatest(ax0, bx0))
                        * (least(ay1, by1) - greatest(ay0, by0)) * 4
                        AS BIGINT) AS inter_area_x4
            FROM a JOIN b
              ON ax0 < bx1 AND ax1 > bx0 AND ay0 < by1 AND ay1 > by0
        """,
        "zonal_stats_rects": f"""
            -- raster→vector zonal statistics: exact-integer aggregates per
            -- rect over the contained customer points; LEFT JOIN keeps
            -- empty zones; DuckDB sum(BIGINT) is HUGEINT → CAST BIGINT
            -- (CLAUDE.md); min/max coalesce to -1 so no nullable column
            -- widens to float64 through pandas.
            WITH p AS ({_POINT_SQL}), r AS ({_RECT_SQL})
            SELECT r.geom_id,
                   CAST(count(p.px) AS BIGINT) AS n_points,
                   CAST(coalesce(sum(CAST(p.px AS BIGINT)), 0) AS BIGINT) AS sum_wx,
                   CAST(coalesce(sum(CAST(p.py AS BIGINT)), 0) AS BIGINT) AS sum_wy,
                   CAST(coalesce(min(CAST(p.px AS BIGINT)), -1) AS BIGINT) AS min_wx,
                   CAST(coalesce(max(CAST(p.px AS BIGINT)), -1) AS BIGINT) AS max_wx,
                   CAST(coalesce(min(CAST(p.py AS BIGINT)), -1) AS BIGINT) AS min_wy,
                   CAST(coalesce(max(CAST(p.py AS BIGINT)), -1) AS BIGINT) AS max_wy
            FROM r LEFT JOIN p
              ON p.px > r.cx - r.hw - 0.5 AND p.px < r.cx + r.hw + 0.5
             AND p.py > r.cy - r.hh - 0.5 AND p.py < r.cy + r.hh + 0.5
            GROUP BY r.geom_id
        """,
        "knn_points": f"""
            WITH p AS ({_POINT_SQL}),
            q AS (
              SELECT 'q_' || lpad(CAST(n_nationkey AS VARCHAR), 3, '0') AS query_id,
                     CAST((n_nationkey * 131071 + 7) % {_W} AS DOUBLE) AS qx,
                     CAST((n_nationkey * 524287 + 11) % {_W} AS DOUBLE) AS qy
              FROM nation),
            cand AS (
              SELECT q.query_id, p.point_id,
                     sqrt((p.px - q.qx) * (p.px - q.qx) + (p.py - q.qy) * (p.py - q.qy)) AS d
              FROM p, q)
            SELECT query_id, point_id, round(d, 6) AS distance,
                   CAST(row_number() OVER (PARTITION BY query_id ORDER BY d, point_id) AS INT) AS rank
            FROM cand QUALIFY rank <= 5
        """,
        "knn_corpus": f"""
            -- brute-force reference for the shuffle-tier ring expansion
            -- with the corpus itself as the query set (self-match at
            -- distance 0 included, exactly like the engine)
            WITH p AS ({_POINT_SQL}),
            cand AS (
              SELECT 'c_' || a.point_id AS query_id, b.point_id,
                     sqrt((b.px - a.px) * (b.px - a.px)
                          + (b.py - a.py) * (b.py - a.py)) AS d
              FROM p a, p b)
            SELECT query_id, point_id, round(d, 6) AS distance,
                   CAST(row_number() OVER (PARTITION BY query_id ORDER BY d, point_id) AS INT) AS rank
            FROM cand QUALIFY rank <= 3
        """,
        # ---- pixel path: DuckDB runs the downstream relational semantics
        # over the frozen kernel-output fixture (see _BLOCKS_GOLDEN note) ----
        "quadtree_tile_assign": f"""
            SELECT image_id, tile_id, level, x0, y0, x1, y1, is_leaf, oob,
                   coalesce(round(similarity, 9), -1.0) AS similarity,
                   block_hash, morton
            FROM read_parquet('{_BLOCKS_GOLDEN}')
        """,
        "block_dedup_exact": f"""
            SELECT image_id, tile_id, block_hash,
                   (row_number() OVER w) = 1 AS is_canonical,
                   first_value(image_id) OVER w AS canonical_image_id,
                   first_value(tile_id) OVER w AS canonical_tile_id
            FROM read_parquet('{_BLOCKS_GOLDEN}')
            WINDOW w AS (PARTITION BY block_hash ORDER BY image_id, tile_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        "tile_range_query": f"""
            -- exact window semantics; independently validates the Spark
            -- plan's Morton-range prefilter (a dropped tile would mismatch)
            SELECT image_id, tile_id, x0, y0, x1, y1, morton
            FROM read_parquet('{_BLOCKS_GOLDEN}')
            WHERE level = 2
              AND x0 < 32 AND x1 > 0 AND y0 < 32 AND y1 > 0
        """,
        "lineage_rollup": f"""
            SELECT 'tile_assign' AS stage, count(*) AS rows_total
            FROM read_parquet('{_BLOCKS_GOLDEN}')
        """,
        "ann_ivf_topk": _ivf_sql(n_clusters=_IVF_CLUSTERS),
        # a 4-ary quadtree's leaf count is always ≡ 1 (mod 3) — pure tree
        # arithmetic, independent of any kernel; captions must all verify
        "quadtree_roundtrip": _snapshot_sql(
            "quadtree_roundtrip",
            "n_blocks % 3 = 1 AND n_blocks >= 1 AND caption_ok"),
        # every near-dup edge must point at a node that EXISTS in the
        # independently-frozen blocks golden (the scan covers internal nodes
        # too), similarity within the weighted kernel's range (weights sum
        # 0.9999)
        "block_near_dedup": _snapshot_sql(
            "block_near_dedup",
            f"""similarity > 0 AND similarity <= 0.9999
             AND EXISTS (SELECT 1 FROM read_parquet('{_BLOCKS_GOLDEN}') b
                         WHERE b.image_id = dup_image_id
                           AND b.tile_id = dup_tile_id)"""),
        # dedup groups = reachability over the frozen near-dup edges,
        # restricted to the frozen blocks node set — fully independent
        # relational semantics (recursive CTE) over the pinned fixtures
        "block_dedup_clusters": components_recursive_sql(
            f"""SELECT image_id || '|' || tile_id AS block_key
                FROM read_parquet('{_BLOCKS_GOLDEN}')""",
            "SELECT image_id || '|' || tile_id AS a, "
            "dup_image_id || '|' || dup_tile_id AS b "
            f"FROM read_parquet('{_NEAR_DEDUP_SNAP}')",
            id_col="block_key", a_col="a", b_col="b"),
        # dims must equal the fixture generator's metadata (no pixel kernel)
        "image_features": _snapshot_sql(
            "image_features",
            f"""(image_id, w, h) IN
                (SELECT (m.i, m.w, m.h) FROM (VALUES {_fixture_dims_values(16)})
                 AS m(i, w, h))
             AND mean_r BETWEEN 0 AND 255 AND mean_g BETWEEN 0 AND 255
             AND mean_b BETWEEN 0 AND 255"""),
        "interpolator_matrix": _snapshot_sql(
            "interpolator_matrix",
            "down IN ('NearestNeighbor', 'ApproxBiLinear', 'BiLinear', "
            "'CatmullRom') AND up IN ('NearestNeighbor', 'ApproxBiLinear', "
            "'BiLinear', 'CatmullRom') AND similarity <= 0.9999"),
        "image_near_dup_phash": _snapshot_sql(
            "image_near_dup_phash",
            "hamming BETWEEN 0 AND 10 AND image_a < image_b"),
        # components derived IN SQL (recursive CTE, min reachable id) from
        # the frozen pair edges + the metadata-only fixture id list — the
        # live pair plan, the live CC, and the singleton handling all grade
        "image_dedup_clusters": components_recursive_sql(
            f"SELECT i AS image_id FROM (VALUES {_phash_fixture_ids_values()})"
            " AS m(i)",
            "SELECT image_a, image_b FROM ("
            + _snapshot_sql("image_near_dup_phash",
                            "hamming BETWEEN 0 AND 10 AND image_a < image_b")
            + ")",
            id_col="image_id", a_col="image_a", b_col="image_b"),
        # the engine writes/reads real manifested snapshots; the oracle pins
        # WHAT snapshot 1 must contain (generator constants) and that the
        # latest snapshot holds all 16 — time travel returning anything from
        # snapshot 2, or the append losing rows, mismatches
        "versioned_read": f"""
            SELECT image_id, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
                   caption, CAST(16 AS BIGINT) AS latest_rows
            FROM (VALUES {_versioned_v1_values()}) AS m(image_id, w, h, caption)
        """,
        # incremental read 1→2 must surface EXACTLY the appended rows —
        # an old file rescanned, or an appended file missed, mismatches
        "versioned_incremental": f"""
            SELECT image_id, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
                   caption
            FROM (VALUES {_versioned_values(8, 16)}) AS m(image_id, w, h, caption)
        """,
        # MERGE semantics replayed relationally: base = generator rows 0-7,
        # updates = rows 4-11 with the ' v2' suffix; result = base minus
        # updated keys, union updates; v1_rows pins the pre-merge snapshot
        "versioned_merge": f"""
            WITH imgs AS (
              SELECT * FROM (VALUES {_caption_values_indexed(16)})
                AS m(i, image_id, caption)),
            base AS (SELECT image_id, caption FROM imgs WHERE i < 8),
            upd AS (SELECT image_id, caption || ' v2' AS caption
                    FROM imgs WHERE i >= 4 AND i < 12)
            SELECT image_id, caption, CAST(8 AS BIGINT) AS v1_rows FROM (
              SELECT * FROM base
              WHERE image_id NOT IN (SELECT image_id FROM upd)
              UNION ALL SELECT * FROM upd)
        """,
        "boilerplate_removal": _boilerplate_oracle_sql(
            f"SELECT * FROM (VALUES {_boilerplate_line_values()}) "
            "AS t(doc_id, pos, line)"),
        # same semantics over the REAL documents table (single-line
        # all-distinct word soup → the op must be an exact identity:
        # a false positive, or any reassembly drift, mismatches)
        "boilerplate_docs": _boilerplate_oracle_sql("""
            SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                   arr[CAST(i AS BIGINT)] AS line
            FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i
                  FROM (SELECT doc_id, string_split(text, chr(10)) AS arr
                        FROM documents))"""),
        # joint components over BOTH edge channels: the frozen phash pair
        # snapshot UNION ALL caption star-edges derived in SQL (normalize →
        # min-id canonical per non-empty group) — transitive cross-modal
        # merges grade against fully independent relational semantics
        "multimodal_dedup_clusters": components_recursive_sql(
            f"SELECT i AS image_id FROM (VALUES {_phash_fixture_ids_values()})"
            " AS m(i)",
            "SELECT image_a, image_b FROM ("
            + _snapshot_sql("image_near_dup_phash",
                            "hamming BETWEEN 0 AND 10 AND image_a < image_b")
            + """)
            UNION ALL
            SELECT canon AS image_a, image_id AS image_b FROM (
              SELECT image_id, cn, min(image_id) OVER (PARTITION BY cn) AS canon
              FROM (SELECT image_id,
                           trim(regexp_replace(caption, '\\s*\\[[^\\]]*\\]$', ''))
                             AS cn
                    FROM (VALUES """ + _phash_fixture_caption_values() + """)
                         AS c(image_id, caption))
              WHERE cn <> '')
            WHERE image_id <> canon""",
            id_col="image_id", a_col="image_a", b_col="image_b"),
        "image_caption_dedup": f"""
            -- identical normalize (strip trailing bracketed annotation) +
            -- portable hash + window election over the metadata caption
            -- constants; unicode captions exercise md5/UTF-8 parity
            WITH imgs(image_id, caption) AS (VALUES {_caption_values(48)}),
            keyed AS (
              -- coalesce pins the engine's NULL-caption → '' singleton rule
              SELECT image_id,
                     coalesce(trim(regexp_replace(caption,
                                   '\\s*\\[[^\\]]*\\]$', '')), '')
                       AS caption_norm
              FROM imgs),
            hashed AS (
              SELECT image_id, caption_norm,
                     {portable_hash64_sql('caption_norm')} AS caption_fp
              FROM keyed)
            -- empty-caption singleton rule pinned on both engines: an
            -- untitled image is its own group, never elected across
            SELECT image_id, caption_norm, caption_fp,
                   CAST(count(*) OVER w AS BIGINT) AS group_size,
                   min(image_id) OVER w AS canonical_id,
                   image_id = min(image_id) OVER w AS is_canonical
            FROM hashed
            WINDOW w AS (PARTITION BY caption_fp,
                         CASE WHEN caption_norm = '' THEN image_id
                              ELSE '' END)
        """,
        # pure function of the (SF-constant) nation keys; no SQL engine can
        # decode RIFF, but the frozen output pins the decoder driver-visibly
        # PCM algebra recomputable in SQL: duration = frames/rate; the
        # generator's rate/channel schedule is a nation-key function
        "audio_features": _snapshot_sql(
            "audio_features",
            "codec = 'wav_pcm' AND sample_rate = 8000 * (1 + clip_id % 3)"
            " AND n_channels = 1 + clip_id % 2"
            " AND n_frames = 800 + 160 * clip_id"
            " AND abs(duration_s - CAST(n_frames AS DOUBLE) / sample_rate)"
            "     < 1e-6"
            " AND peak_amp >= rms AND peak_amp <= 1.0"),
        # clip geometry + sampling stride are generator constants
        "video_frame_stats": _snapshot_sql(
            "video_frame_stats",
            "w = 48 AND h = 32 AND frame_idx % 4 = 0"
            " AND frame_idx < 8 + video_id % 5"
            " AND mean_r BETWEEN 0 AND 255 AND mean_g BETWEEN 0 AND 255"
            " AND mean_b BETWEEN 0 AND 255"),
        "archive_roundtrip": f"""
            -- archives carry one member per leaf + pseudo-symlinks for
            -- within-image duplicate hashes: both derivable in SQL from the
            -- frozen blocks table + the fixture-image metadata constants
            WITH meta(image_id, w, h, tree_height) AS (
              VALUES {_archive_meta_values()}),
            b AS (SELECT image_id, block_hash
                  FROM read_parquet('{_BLOCKS_GOLDEN}') WHERE is_leaf),
            agg AS (
              SELECT image_id, count(*) AS n_blocks,
                     CAST(count(*) - count(DISTINCT block_hash) AS BIGINT)
                       AS n_symlinks
              FROM b GROUP BY image_id)
            SELECT m.image_id, m.w, m.h, m.tree_height,
                   a.n_blocks, a.n_symlinks
            FROM meta m JOIN agg a USING (image_id)
        """,
        "tile_pyramid_rollup": f"""
            -- pyramid rollup replayed over the frozen golden blocks:
            -- unnest each leaf's ancestor levels 0..level, prefix by
            -- substring, aggregate per (image, level, prefix); bit_xor
            -- digest matches Spark's (sum would overflow under ANSI)
            WITH leaves AS (
              SELECT image_id, tile_id, level, x0, y0, x1, y1, oob, block_hash
              FROM read_parquet('{_BLOCKS_GOLDEN}') WHERE is_leaf),
            anc AS (
              SELECT image_id,
                     CAST(a AS INT) AS anc_level,
                     tile_id[1:CAST(a AS INT)] AS anc,
                     x0, y0, x1, y1, oob, block_hash
              FROM leaves, unnest(generate_series(0, level)) AS t(a))
            SELECT image_id, anc_level, anc,
                   count(*) AS n_leaves,
                   CAST(sum(CAST(oob AS BIGINT)) AS BIGINT) AS n_oob,
                   bit_xor(block_hash) AS content_digest,
                   min(x0) AS bx0, min(y0) AS by0,
                   max(x1) AS bx1, max(y1) AS by1
            FROM anc GROUP BY 1, 2, 3
        """,
        "block_size_extremes": f"""
            WITH s AS (
              SELECT enc_bytes, image_id || '/' || tile_id AS key
              FROM read_parquet('{_SIZES_GOLDEN}'))
            SELECT
              (SELECT min(enc_bytes) FROM s) AS min_bytes,
              (SELECT max(enc_bytes) FROM s) AS max_bytes,
              (SELECT min(key) FROM s
                WHERE enc_bytes = (SELECT min(enc_bytes) FROM s)) AS min_block,
              (SELECT max(key) FROM s
                WHERE enc_bytes = (SELECT max(enc_bytes) FROM s)) AS max_block,
              (SELECT count(*) FROM s) AS n_blocks
        """,
    }
