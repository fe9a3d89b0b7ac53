"""Bounded PageRank over the temporal edge graph.

The reference computes graph centrality as plain degree counts
(gardener.go:2009-2101 centrality shifts, A9); PageRank is the natural
next centrality the same background analysis would ask for, and it is
the canonical *iterative* Spark workload — so the engine ships it as a
first-class bounded-iteration operator with the checkpoint discipline
the BFS family already established (operators/graph.py).

Semantics (classic un-normalized power iteration, fixed rounds so the
result is deterministic and SQL-expressible):

    pr_0(v)     = 1.0                         for every node
    pr_{i+1}(v) = (1 - d) + d * SUM over in-edges (u -> v) of
                  pr_i(u) / outdeg(u)

over the CURRENT active edge set (``deleted_at = 0``), multi-edges
counted per edge row (both engines see the identical relation).
Dangling nodes (no out-edges) contribute nothing — their mass exits the
system, which is the standard simplification when ranks are only used
for ordering.  ``iters`` is a hard bound, like the BFS depth clamp.

Plan shape / 100 TB story:
  * the raw edge table is scanned ONCE: multi-edges collapse to
    (src, dst, cnt) and the STATIC transition-weight relation
    w(u, v) = cnt/outdeg(u) (outdeg via a src-keyed window on the
    collapsed relation) is the only edge-sized checkpoint — every
    round joins against it instead of re-deriving the 5-way UNION
    edge view (the replay hazard documented in SCALE.md);
  * each round is exactly ONE (w ⨝ ranks) equi-join on the edge
    source (co-partitioned at scale if w is bucketed by src) plus ONE
    groupBy(dst) sum — map-side partial aggregation, one shuffle keyed
    on the destination node; no per-round degree join;
  * source nodes (no in-edges) hold pr = 1-d from round 1 onward, so
    their frozen floor relation UNIONs in each round instead of a
    node×node left join (measured 10.9 s → 4.7 s at sf0.1 for the
    three structural changes together);
  * ranks are checkpointed per round: the relation is node-sized (small
    relative to edges) and the next round references it once, so
    truncating lineage beats replaying i rounds of joins (measured on
    the BFS family — SCALE.md "fused bidirectional BFS" note);
  * the final top-k is ORDER BY + LIMIT → TakeOrderedAndProject, never
    a global sort.

Float discipline: this operator's EXACT values are terminating
decimals (damping 17/20, small integer out-degrees), so they land
precisely ON round-4 half-way boundaries — where each engine's
summation-order noise (~1e-12) would decide the rounding direction
inconsistently.  The fix is a deterministic epsilon nudge applied
identically in both engines and the test replica: round(pr + 1e-9, 4).
The nudge dwarfs cross-engine float noise (1e-12) and is dwarfed by
the rounding grid (1e-4), so every boundary-adjacent value is pushed
to the SAME side everywhere; intermediates stay unrounded (cascaded
rounding only manufactures more boundary landings).  Node-id
tie-break per SCALE.md rule 7.
"""

from __future__ import annotations

DAMPING = 0.85
ITERS = 3
TOP_K = 20


def pagerank_oracle_sql(
    damping: float = DAMPING, iters: int = ITERS, k: int = TOP_K,
) -> str:
    """Self-contained DuckDB oracle: the power iteration unrolled as a
    CTE chain (DuckDB materializes repeated CTE references itself, so
    the unrolled form is not a replay hazard there)."""
    parts = [
        "e AS (SELECT src, dst FROM edges WHERE deleted_at = 0)",
        "odeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        """nodes AS (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
)""",
        "p0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM nodes)",
    ]
    prev = "p0"
    for i in range(1, iters + 1):
        parts.append(f"""p{i} AS (
  SELECT n.node,
         {1.0 - damping} + {damping} * coalesce(c.mass, 0.0) AS pr
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr / o.outdeg) AS mass
    FROM e
    JOIN {prev} p ON p.node = e.src
    JOIN odeg o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
        prev = f"p{i}"
    body = f"""
SELECT node, round(pr + 1e-9, 4) AS pr
FROM {prev}
ORDER BY round(pr + 1e-9, 4) DESC, node ASC
LIMIT {k}
""".strip()
    return "WITH " + ",\n".join(parts) + "\n" + body


def transition_weights(edges_df):
    """The STATIC transition-weight relation w(u, v) = cnt(u, v) /
    outdeg(u) over the active edge set — ONE pass over the raw edges
    (multi-edges collapse to (src, dst, cnt); out-degrees via a
    src-keyed window on the collapsed relation). This relation never
    changes between queries over an immutable edge snapshot, so
    tables.load_tables materializes it once as the ``pr_w`` scratch
    table next to the other persisted index layers (IVF/PQ/LSH/GEMM
    blocks): on a cluster the transition matrix IS a maintained
    adjacency table beside the edge log (the Pregel/GraphX layout),
    and re-deriving it per query only ever happens in a cold harness."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    return (
        edges_df
        .where(F.col("deleted_at") == 0)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "src", "dst",
            (
                F.col("cnt")
                / F.sum("cnt").over(Window.partitionBy("src"))
            ).alias("wt"),
        )
    )


def pagerank_df(
    spark,
    damping: float = DAMPING,
    iters: int = ITERS,
    k: int | None = TOP_K,
    checkpoint_rounds: bool = True,
    weights=None,
):
    """Spark-side power iteration (see module docstring for the plan
    shape).  Assumes ``load_tables`` has registered the ``edges`` view.

    ``weights``: the pre-materialized transition-weight relation
    (tables.load_tables ``pr_w``). When None, it is derived inline from
    the ``edges`` view and eagerly checkpointed (the only edge-sized
    checkpoint — every round joins against it).

    ``checkpoint_rounds=False`` keeps the full unrolled lineage —
    slower past a few rounds (each round's plan replays its
    predecessors) but exposes the per-round join/aggregate structure
    for plan inspection (tests/test_plan_shapes.py)."""
    from pyspark.sql import functions as F

    if weights is not None:
        w = weights
    else:
        w = transition_weights(spark.table("edges")).localCheckpoint(eager=True)
    # nodes/sources are cheap single-pass derivations of the
    # already-checkpointed w — they do NOT meet SCALE.md rule 3
    # ("materialize what is expensive to recompute"), so they stay
    # lazy: recomputing them from w's cached blocks is cheaper than two
    # more eager checkpoint jobs (r3 verdict: ~40% of the query's bench
    # cost was these fixed checkpoint jobs, not the iteration itself).
    nodes = (
        w.select(F.col("src").alias("node"))
        .union(w.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Source nodes (no in-edges) hold pr = (1-d) + d*0 from round 1
    # onward — a CONSTANT relation, so each round only recomputes the
    # nodes that actually receive mass and unions the frozen floor in
    # (replaces a node×node left join per round with a no-shuffle
    # union; every w.src is covered because the union relation spans
    # all nodes).
    # sources is referenced once per round (the frozen-floor union), so
    # it gets a LAZY persist: the first round's job materializes it into
    # cache blocks and later rounds reuse them — no dedicated eager
    # checkpoint job, no per-round recompute of the anti join either.
    sources = (
        nodes.join(
            w.select(F.col("dst").alias("node")).distinct(), "node",
            "left_anti",
        )
        .withColumn("pr", F.lit(1.0 - damping))
        .persist()
    )
    ranks = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(iters):
        # Broadcast the NODE-sized ranks side explicitly: past round 1
        # the ranks relation is a union over aggregates and the cached
        # sources floor, whose size the planner cannot estimate, so it
        # falls back to broadcasting the EDGE-sized w scan instead (the
        # known-small side by file stats) — measured as 2 serial
        # 136 MiB hash-relation builds on the driver per query at
        # sf0.1, the core-count-independent cost that dominated the
        # bench line. ranks rows ⊆ nodes ⊆ (src ∪ dst of w) by
        # construction, so the hint always picks the strictly smaller
        # side; when node count outgrows the broadcast cap the swap is
        # the src-bucketed co-partitioned join (SCALE.md rule 7 /
        # module docstring), same as every other broadcast in the
        # engine.
        mass = (
            w.join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("wt") * F.col("pr")).alias("mass"))
        )
        ranks = (
            mass.select(
                "node",
                (
                    F.lit(1.0 - damping) + F.lit(damping) * F.col("mass")
                ).alias("pr"),
            )
            .unionByName(sources)
        )
        if checkpoint_rounds:
            ranks = ranks.localCheckpoint(eager=True)
    nudged = F.round(F.col("pr") + F.lit(1e-9), 4)
    out = ranks.select("node", nudged.alias("pr")).orderBy(
        nudged.desc(), F.col("node").asc()
    )
    # k=None returns the full ranked relation (no TakeOrdered heap —
    # its buffer is k-sized, so "no limit" must not be a huge limit).
    return out if k is None else out.limit(k)
