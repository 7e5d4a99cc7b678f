"""kNN block lookup via cell-ring expansion (SURVEY.md §2.12).

No reference counterpart — this is the engine-mandated nearest-neighbor
operator over block centroids. Strategy (the H3 ``grid_ring`` pattern, run
with Z-order cells):

1. queries carry a cell at the index resolution;
2. iteratively expand each *unsatisfied* query's candidate set with the
   cells at Chebyshev ring r = 0, 1, 2, … (an equi-join per ring on the cell
   key — a shuffle-free broadcast join while the query side is small);
3. a query terminates when its kth-best distance so far is STRICTLY below
   ``ring · c`` (cell width c): any point in shell ``ring+1`` or beyond lies
   ≥ ``ring · c`` away (Chebyshev shell R is ≥ (R−1)·c in Euclidean distance
   from anywhere in the query's cell), so no unseen point can beat — or,
   because the bound is strict, even tie — the current top-k;
4. exact Euclidean distance + ``row_number() ≤ k`` window top-k, ties broken
   deterministically by (distance, image_id, tile_id).

The ring loop is driver-side control flow only; what each round touches
depends on the tier (``knn_ring(strategy=)``): the ``broadcast`` tier
broadcasts the unsatisfied-query set into every ring join and severs its
lineage through the driver (right when queries are interactively small);
the ``shuffle`` tier keeps the query side distributed end to end — cell
equi-joins and an anti-join-maintained pending set with per-round local
checkpoints — so "kNN for every corpus item" works without ever
materializing the query set on the driver. In both tiers the big blocks
side is scanned from one persisted projection and never re-shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.pandas.functions import pandas_udf

from ..config import EngineConfig, DEFAULT_CONFIG


def _query_cells(queries: DataFrame, res: int) -> DataFrame:
    @pandas_udf("long")
    def enc(x, y):  # type: ignore[misc]
        import pandas as pd
        from ..kernels.geometry import cell_encode
        return pd.Series(cell_encode(x.to_numpy(dtype=float), y.to_numpy(dtype=float), res))
    return queries.withColumn("cell", enc("x", "y"))


def _ring_cells(queries: DataFrame, ring: int, prev_ring: int) -> DataFrame:
    """Explode each query to the shell of cells at Chebyshev distance in
    ``(prev_ring, ring]`` — the disk difference, so already-joined cells are
    never re-joined."""
    @pandas_udf("array<long>")
    def ring_of(cell):  # type: ignore[misc]
        import numpy as np
        import pandas as pd
        from ..kernels.geometry import cell_ring
        if len(cell) == 0:
            return pd.Series([], dtype=object)
        full = cell_ring(cell.to_numpy(dtype=np.int64), ring)
        if prev_ring < 0:
            return pd.Series([np.unique(f).tolist() for f in full])
        inner = cell_ring(cell.to_numpy(dtype=np.int64), prev_ring)
        return pd.Series([np.setdiff1d(f, i).tolist() for f, i in zip(full, inner)])
    return (queries.withColumn("join_cell", F.explode(ring_of("cell")))
            .select("query_id", "x", "y", "k", "join_cell"))


def knn_ring(points: DataFrame, queries: DataFrame,
             cfg: EngineConfig = DEFAULT_CONFIG, res: int | None = None,
             max_ring: int = 8, initial_ring: int | None = None,
             strategy: str = "auto",
             broadcast_query_limit: int = 50_000) -> DataFrame:
    """kNN of each query point over block centroids.

    ``points``: cell-keyed centroids (image_id, tile_id, wx, wy, cell) —
    output of ``spatial_join.block_centroids``. ``queries``: (query_id, x,
    y, k). Returns ``(query_id, image_id, tile_id, distance, rank)`` with
    rank ≤ k.

    Two tiers share the ring schedule and the final election (VERDICT r4
    #1 — "kNN for every corpus item" breaks a broadcast-only design):

    * ``broadcast`` — the query side is broadcast into every ring join and
      the pending set round-trips through the driver (lineage severed by
      ``createDataFrame``). Right when queries are interactively small.
    * ``shuffle`` — the query side stays distributed: cell-keyed and
      equi-joined (plain shuffle join, AQE free to pick sides), the
      pending set maintained as an anti-joined DataFrame whose lineage is
      severed by a local checkpoint per round. Nothing query-sized ever
      visits the driver, so |queries| ~ |points| works.
    * ``auto`` (default) — one count of the query side picks the tier
      (≤ ``broadcast_query_limit`` → broadcast).
    """
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        strategy = ("broadcast"
                    if queries.count() <= broadcast_query_limit else "shuffle")
    use_broadcast = strategy == "broadcast"

    from ..kernels.geometry import WORLD
    res = res if res is not None else cfg.spatial.cell_resolution
    cell_width = WORLD / (1 << res)
    spark = queries.sparkSession
    # persist: the density count plus every ring join rescans this side —
    # without it any upstream work (scan, cell-encode UDF) reruns per round.
    # Tracked so the big side is released at the next query boundary rather
    # than pinned in the block manager for the session lifetime.
    from ..functions.cache import persist_tracked
    pts = persist_tracked(points.select("image_id", "tile_id", "wx", "wy", "cell"))
    q = _query_cells(queries.select("query_id", "x", "y", "k"), res).localCheckpoint(eager=True)
    q_schema = "query_id string, x double, y double, k int, cell long"

    pending = q
    gathered: DataFrame | None = None
    results: list[DataFrame] = []  # per-round top-k of queries finished there
    # density-aware initial radius: expect k candidates within a disk of
    # radius √(k̄/(π·density)) cells, so most queries finish in ONE round —
    # each extra round is a full Spark job, the dominant cost at small k
    if initial_ring is None:
        # count the PERSISTED projection: this first action populates the
        # cache every ring join then reads, instead of an extra uncached
        # pass over the upstream (incl. the cell-encode UDF)
        n_points = pts.count()
        density = max(n_points / float((1 << res) ** 2), 1e-9)
        k_max = queries.agg(F.max("k")).collect()[0][0] or 1
        initial_ring = int(min(max((k_max / (3.14159 * density)) ** 0.5 + 1, 1),
                               max(max_ring, 1)))
    # then 4× radius per round: log-many iterations instead of one per shell
    radii = [initial_ring]
    while radii[-1] < max_ring:
        radii.append(min(radii[-1] * 4, max_ring))
    prev = -1
    if pending.isEmpty():  # vacuous query set — checked ONCE, not per round
        radii = []
    for ring in radii:
        ring_q = _ring_cells(pending, ring, prev)
        cand = (pts.join(broadcast(ring_q) if use_broadcast else ring_q,
                         pts["cell"] == F.col("join_cell"))
                .select("query_id", "image_id", "tile_id",
                        F.sqrt(F.pow(F.col("wx") - F.col("x"), 2)
                               + F.pow(F.col("wy") - F.col("y"), 2)).alias("distance"))
                # checkpoint the DELTA only: checkpointing the growing union
                # re-materialized every prior round's candidate rows once
                # per round (O(rounds · |gathered|) writes); a union of
                # per-round checkpoints keeps lineage one node deep per leg
                # at O(|gathered|) total writes (r6)
                .localCheckpoint(eager=True))
        gathered = cand if gathered is None else gathered.unionByName(cand)
        # kth-best distance per query so far; done ⇔ dk < ring·c STRICTLY:
        # an unseen point beyond shell `ring` is ≥ ring·c away, so with
        # dk < ring·c nothing unseen can beat OR TIE the current top-k. The
        # non-strict bound admitted a tie hazard — integer-valued world
        # coordinates make distance == ring·c realizable (e.g. dx=ring·c,
        # dy=0 from a shell corner), and an unseen equal-distance point
        # with a smaller id would deterministically displace rank k under
        # the (distance, id) tie-break. Strict costs at most one extra
        # ring for the measure-zero exact-equality queries.
        # The window ranks only rows of still-PENDING queries (semi-join):
        # a finished query can never un-finish, so re-ranking its rows
        # every later round was pure waste — round 2+ touches the small
        # unsatisfied tail instead of every query's candidates (r6).
        wq = Window.partitionBy("query_id").orderBy("distance", "image_id", "tile_id")
        wp = Window.partitionBy("query_id")
        g_pend = gathered.join(
            (broadcast(pending) if use_broadcast else pending).select("query_id"),
            "query_id", "left_semi")
        # ONE ranking serves done-detection AND the finished queries' final
        # answer (r6): a finished query's candidate set can never grow
        # (later rings explode only still-pending queries), so its rn ≤ k
        # rows AT FINISH TIME are exactly what the old post-loop election
        # re-ranked from the whole gathered set. The _done flag rides a
        # partition-only window over the already-ranked rows — same
        # partitioning, no extra exchange or sort. Candidate (query, point)
        # pairs are unique by construction (shells are disjoint setdiff1d
        # disk differences; a point lives in one cell), so no dedup —
        # pytest-pinned via many-rounds equality with brute force.
        flagged = (g_pend.withColumn("_rn", F.row_number().over(wq))
                   .join(q.select("query_id", "k"), "query_id")
                   .withColumn("_done", F.max(
                       F.when((F.col("_rn") == F.col("k"))
                              & (F.col("distance")
                                 < F.lit(float(ring) * cell_width)),
                              F.lit(1)).otherwise(F.lit(0))).over(wp)))
        res_r = (flagged
                 .filter((F.col("_done") == 1) & (F.col("_rn") <= F.col("k")))
                 .select("query_id", "image_id", "tile_id", "distance",
                         F.col("_rn").alias("rank"))
                 .localCheckpoint(eager=True))
        results.append(res_r)
        done = res_r.select("query_id").distinct()
        if use_broadcast:
            # sever pending's lineage: the query set is tiny by contract, so
            # a driver round-trip is cheaper than a growing anti-join chain
            still = pending.join(done, "query_id", "left_anti").toPandas()
            if len(still) == 0:
                pending = spark.createDataFrame([], q_schema)
                break
            pending = spark.createDataFrame(still)
        else:
            # shuffle tier: the pending set never visits the driver — the
            # anti-join result is checkpointed so its lineage (and hence
            # every later ring's plan) stays one node deep
            pending = (pending.join(done, "query_id", "left_anti")
                       .localCheckpoint(eager=True))
            if pending.isEmpty():
                break
        prev = ring

    # queries still pending after max_ring (deep in empty regions) fall back
    # to brute force — the tail is tiny by construction (in EITHER tier:
    # max_ring covers a (2·max_ring+1)²-cell disk, so only queries in
    # near-empty regions remain), so the cross join touches
    # |pending| × |points|, not |queries| × |points|.
    if results:
        ringed = results[0]
        for r in results[1:]:
            ringed = ringed.unionByName(r)
    else:
        ringed = spark.createDataFrame(
            [], "query_id string, image_id string, tile_id string, "
                "distance double, rank int")
    if pending.isEmpty():
        return ringed
    # broadcast of the tail is a broadcast-tier privilege: in the shuffle
    # tier the caller chose "queries may be corpus-sized", and a pathological
    # input (max_ring too small for the density) could leave a large pending
    # set — never materialize it driver-side there
    fallback = knn_bruteforce(points, pending.select("query_id", "x", "y", "k"),
                              broadcast_queries=use_broadcast)
    return ringed.unionByName(fallback)


def knn_bruteforce(points: DataFrame, queries: DataFrame,
                   broadcast_queries: bool = True) -> DataFrame:
    """Oracle-shaped baseline: cross join + window top-k. Correct at any
    scale but O(|P|·|Q|) — used to verify ``knn_ring`` and for tiny inputs.
    ``broadcast_queries=False`` drops the broadcast hint (AQE picks the
    strategy) for callers whose query side may not fit an executor."""
    q = queries.select("query_id", "x", "y", "k")
    cand = (points.select("image_id", "tile_id", "wx", "wy")
            .crossJoin(broadcast(q) if broadcast_queries else q)
            .withColumn("distance",
                        F.sqrt(F.pow(F.col("wx") - F.col("x"), 2)
                               + F.pow(F.col("wy") - F.col("y"), 2))))
    w = Window.partitionBy("query_id").orderBy("distance", "image_id", "tile_id")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "image_id", "tile_id", "distance", "rank"))
