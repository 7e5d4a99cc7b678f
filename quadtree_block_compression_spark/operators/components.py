"""Connected components over near-duplicate pair edges → dedup clusters.

The pairwise dedup tiers (MinHash/SimHash/embedding — ``dedup_text``,
``ann``) emit *edges*; production corpus cleaning needs the *clusters* those
edges imply, so one canonical document survives per component instead of the
greedy drop-the-higher-id heuristic (which over-drops on chains A–B, B–C:
the component {A,B,C} should keep exactly A, the greedy pair rule drops B
and C even when A–C was never verified — same result here, but on star
graphs the greedy rule keeps non-canonical members).

Generalizes the reference's dedup *group* notion (symlink groups keyed by a
canonical block, ``pkg/quadtreeImage/quadtreeElement.go:176-221``) from
pointer identity to any pair relation.

Algorithm: iterative min-label propagation (each node adopts the minimum
label in its closed neighborhood) — converges to the component-minimum id in
``diameter`` rounds, each round ONE shuffle join + ONE aggregation over the
edge list. Near-dup components are small and shallow by construction
(boilerplate clusters are stars around the earliest copy), so 2–3 rounds
is typical; the loop stops at the first fixpoint and lineage is bounded by
a local checkpoint per round. For adversarial long-chain graphs at 10^12
edges the O(log n) large-star/small-star variant drops in behind the same
signature; the simple propagation is the right default for dedup shapes.

Deterministic (min over ids), so the whole computation is replicated in the
DuckDB oracle as a recursive CTE (min reachable id per node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         a_col: str = "doc_a", b_col: str = "doc_b",
                         max_iters: int = 25) -> DataFrame:
    """Component id (= min member id) per node.

    ``nodes``: one row per entity (singletons become their own component).
    ``pairs``: undirected edges, any extra columns ignored.
    Returns (``id_col``, component_id, component_size, is_canonical).
    """
    spark = nodes.sparkSession
    node_ids = nodes.select(F.col(id_col).alias("x")).distinct()
    # symmetric closed edge list: x→y for every pair, both directions.
    # Edges are RESTRICTED to the node set (semi-joins on both endpoints):
    # an edge through an id absent from ``nodes`` (e.g. a doc filtered out
    # upstream of the component step) must not act as a bridge — without
    # the restriction the label join silently drops such edges here while
    # a reachability-based oracle would follow them, and the "component"
    # could even be labeled by an id that no longer exists.
    a = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    b = pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y"))
    edges = (a.unionByName(b).distinct()
             .join(node_ids, "x", "left_semi")
             .join(node_ids.withColumnRenamed("x", "y"), "y", "left_semi")
             .localCheckpoint(eager=True))

    labels = (node_ids
              .withColumn("label", F.col("x"))
              .localCheckpoint(eager=True))

    converged = False
    for _ in range(max_iters):
        # min label among neighbors; closed neighborhood via the outer join
        nbr_min = (edges.join(labels.withColumnRenamed("x", "y"), "y")
                   .groupBy("x").agg(F.min("label").alias("nbr_label")))
        new = (labels.join(nbr_min, "x", "left")
               .select("x", F.least(F.col("label"),
                                    F.coalesce("nbr_label", "label"))
                       .alias("label"))
               .localCheckpoint(eager=True))  # bound plan growth per round
        changed = (new.join(labels.withColumnRenamed("label", "old"), "x")
                   .where(F.col("label") != F.col("old")).limit(1).count())
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently-wrong labels would poison the dedup election downstream;
        # a graph needing >max_iters rounds (diameter ≫ dedup shapes) should
        # use the large-star/small-star O(log n) variant instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds the propagation budget)")

    w = Window.partitionBy("label")
    return (labels
            .withColumn("component_size", F.count(F.lit(1)).over(w))
            .select(F.col("x").alias(id_col),
                    F.col("label").alias("component_id"),
                    "component_size",
                    (F.col("x") == F.col("label")).alias("is_canonical")))


def components_recursive_sql(nodes_sql: str, pairs_sql: str,
                             id_col: str = "doc_id",
                             a_col: str = "doc_a",
                             b_col: str = "doc_b") -> str:
    """DuckDB oracle: min reachable id per node via a recursive CTE —
    independent semantics for :func:`connected_components` (UNION dedup
    terminates the recursion on cycles). Edges are restricted to the node
    set on both endpoints, mirroring the operator: an id absent from
    ``nodes`` never bridges two components."""
    return f"""
      WITH RECURSIVE
      nodes AS ({nodes_sql}),
      rawp AS ({pairs_sql}),
      edges AS (SELECT x, y FROM (
                  SELECT {a_col} AS x, {b_col} AS y FROM rawp
                  UNION SELECT {b_col}, {a_col} FROM rawp)
                WHERE x IN (SELECT {id_col} FROM nodes)
                  AND y IN (SELECT {id_col} FROM nodes)),
      reach(src, node) AS (
        SELECT {id_col}, {id_col} FROM nodes
        UNION
        SELECT r.src, e.y FROM reach r JOIN edges e ON e.x = r.node),
      comp AS (SELECT src AS {id_col}, min(node) AS component_id
               FROM reach GROUP BY src)
      SELECT {id_col}, component_id,
             CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
               AS component_size,
             {id_col} = component_id AS is_canonical
      FROM comp
    """
