"""Temporal property-graph operators (SURVEY.md §2.6 G1-G15).

The reference's 128-shard adjacency maps (pkg/core/graph.go:15-59)
become one edge-list DataFrame ``edges(src, dst, rel, weight,
created_at, deleted_at)``. Time travel is a plain predicate
(graph.go:350-362); traversals are bounded iterative self-joins where
each round is one equi-join on the frontier — at scale the edges table
is bucketed/partitioned by ``src`` so frontier joins co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def active_at(edges: DataFrame, at_time: int | None) -> DataFrame:
    """G3 time-travel predicate: created_at<=t AND (deleted_at=0 OR
    deleted_at>t) (pkg/core/graph.go:350-362). ``None`` = now = only
    deleted_at=0 filter."""
    if at_time is None:
        return edges.where(F.col("deleted_at") == 0)
    return edges.where(
        (F.col("created_at") <= at_time)
        & ((F.col("deleted_at") == 0) | (F.col("deleted_at") > at_time))
    )


def time_travel_pred_sql(at_time: int | None) -> str:
    """Same predicate as SQL text (shared by engine and oracle)."""
    if at_time is None:
        return "deleted_at = 0"
    return f"(created_at <= {at_time} AND (deleted_at = 0 OR deleted_at > {at_time}))"


def out_edges(edges: DataFrame, node: str, rel: str | None = None, at_time: int | None = None) -> DataFrame:
    e = active_at(edges, at_time).where(F.col("src") == node)
    if rel:
        e = e.where(F.col("rel") == rel)
    return e


def in_edges(edges: DataFrame, node: str, rel: str | None = None, at_time: int | None = None) -> DataFrame:
    e = active_at(edges, at_time).where(F.col("dst") == node)
    if rel:
        e = e.where(F.col("rel") == rel)
    return e


def degrees(edges: DataFrame, at_time: int | None = None, direction: str = "out") -> DataFrame:
    """Degree aggregation (A9/A16 building block)."""
    e = active_at(edges, at_time)
    key = "src" if direction == "out" else "dst"
    return e.groupBy(F.col(key).alias("node")).agg(F.count(F.lit(1)).alias("degree"))


def bfs(
    edges: DataFrame,
    roots: DataFrame,
    max_depth: int,
    relations: list[str] | None = None,
    direction: str = "out",
    at_time: int | None = None,
) -> DataFrame:
    """G8/F8 bounded BFS: returns (node, depth) with depth = shortest
    hop count from any root (min-depth dedup, pathfinding.go pattern).

    ``roots`` is a DataFrame with column ``node``. Depth is clamped to
    1..5 like the reference (graph.go:173-246). Each round joins the
    (small) frontier against the edge table — broadcast the frontier,
    keep edges partitioned; lineage stays shallow because depth <= 5.
    """
    max_depth = max(1, min(max_depth, 5))
    e = active_at(edges, at_time)
    if relations:
        e = e.where(F.col("rel").isin(relations))
    if direction == "out":
        pairs = e.select(F.col("src").alias("from_n"), F.col("dst").alias("to_n"))
    elif direction == "in":
        pairs = e.select(F.col("dst").alias("from_n"), F.col("src").alias("to_n"))
    else:  # both
        pairs = e.select(F.col("src").alias("from_n"), F.col("dst").alias("to_n")).unionAll(
            e.select(F.col("dst").alias("from_n"), F.col("src").alias("to_n"))
        )
    # Whole BFS as ONE declarative plan: level d = distinct successors
    # of level d-1; min-depth = groupBy(node).min over the union of all
    # levels. No driver-side actions (isEmpty/collect) between rounds —
    # the bounded unroll (depth<=5) keeps lineage shallow, the per-level
    # distinct bounds each frontier by |V| so there is no path explosion,
    # and Catalyst/AQE schedules the whole traversal as one job. Each
    # expansion joins edges on from_n — at scale, bucket/partition the
    # edge table by src so these joins co-locate without re-shuffle.
    levels = [roots.select(F.col("node"), F.lit(0).alias("depth"))]
    frontier = levels[0]
    for d in range(1, max_depth + 1):
        frontier = (
            pairs.join(frontier.select(F.col("node").alias("from_n")), "from_n")
            .select(F.col("to_n").alias("node"))
            .distinct()
            .withColumn("depth", F.lit(d))
        )
        levels.append(frontier)
    visited = levels[0]
    for lvl in levels[1:]:
        visited = visited.unionAll(lvl)
    return visited.groupBy("node").agg(F.min("depth").alias("depth"))


def bfs_oracle_sql(
    roots: list[str],
    max_depth: int,
    at_time: int | None,
    relations: list[str] | None = None,
) -> str:
    """DuckDB recursive-CTE oracle for BFS min-depth reachability over
    the ``edges`` view. Safe because the derived edge topology is a DAG
    (tables.py) and depth is bounded."""
    max_depth = max(1, min(max_depth, 5))
    tt = time_travel_pred_sql(at_time)
    rel_pred = (
        "AND e.rel IN (" + ", ".join(f"'{r}'" for r in relations) + ")" if relations else ""
    )
    root_list = ", ".join(f"'{r}'" for r in roots)
    return f"""
WITH RECURSIVE reach(node, depth) AS (
  SELECT unnest([{root_list}]) AS node, 0 AS depth
  UNION ALL
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.depth < {max_depth} AND {tt} {rel_pred}
)
SELECT node, CAST(min(depth) AS INT) AS depth
FROM reach GROUP BY node
""".strip()
