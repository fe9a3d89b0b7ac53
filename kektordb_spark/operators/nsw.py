"""Graph-based ANN (V8): a batch-built k-NN navigable graph + an
iterative beam-search serve path — the Spark-first answer to the
reference's HNSW index (pkg/core/index/hnsw_index.go), closing the one
inventory row previously marked n/a-by-design.

The reference builds HNSW incrementally (insert-time neighbor
heuristics, hierarchical layers) because it serves online point
queries. A batch engine flips the build/serve split: the BUILD is one
exact tiled-GEMM all-pairs top-M pass (blockgemm.knn_all — embarrassingly
parallel, the honest cost at 100 TB is one corpus x corpus tile sweep,
or an NN-descent / LSH-seeded approximation when even that is too
much), persisted as the adjacency relation ``nng(src, dst)`` — the
flat navigable-small-world layer-0 the hierarchy approximates. The
SERVE is synchronous beam search:

  frontier_0 = {entry = min vec_id}          (one-row relation)
  per hop:  expand   = frontier JOIN nng (equi-join on src)
            new      = expand EXCEPT visited (never re-score a node)
            scored   = new JOIN emb (one index-order distance fold)
            visited += scored
            frontier = per-query top-BEAM of scored (rank window)
  answer = per-query top-k of visited (self excluded)

Greedy best-first (the paper's searchLayer, hnsw_index.go:390-430)
expands ONE node per step — inherently sequential, latency-optimal for
one query; the synchronous beam expands a bounded frontier per hop for
ALL queries at once, which is the batch-throughput trade: H hops = H
Spark jobs regardless of query count. Measured recall@10 vs exact on
the fixtures: 1.0 at sf0.01, 0.98 at sf0.1 (M=8, BEAM=16, HOPS=8;
asserted >= NSW_RECALL_FLOOR = 0.9 in tests/test_ann_recall.py, the
same quality-gate discipline as IVF/PQ/LSH).

Determinism / oracle: every hop ranks on the RAW distance fold
(bit-identical across engines — index-order aggregate, tables.dot_sql)
with vec_id tie-break; EXCEPT is set-exact on integer ids. The DuckDB
oracle unrolls the hop chain with MATERIALIZED CTEs (visited and
scored each have 2 consumers per hop — naive inlining compounds
per-level like the kcore oracle); the Spark runner checkpoints each
hop's scored relation, accumulates visited as a union of checkpointed
pieces, and early-exits when a hop discovers nothing new.

At scale: the adjacency index shuffles once at build; per hop the
frontier is <= BEAM x n_queries rows (broadcast side of the expand
join), scored is <= BEAM x M x n_queries rows, and the distance folds
run inside whole-stage codegen over the vector join — the corpus is
touched only through the (vec_id -> v) hash join on discovered ids,
never scanned per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kektordb_spark.tables import dot_sql

NSW_M = 8        # out-degree of the persisted k-NN graph
NSW_BEAM = 16    # per-query frontier width
NSW_HOPS = 8     # synchronous expansion rounds
NSW_K = 10
NSW_NQ = 5       # query batch: vec_id < NSW_NQ (the ivf_knn convention)
NSW_RECALL_FLOOR = 0.9


def _dist(dialect: str) -> str:
    d = dot_sql(dialect, "q.v", "c.v")
    return f"(1.0 - ({d}) / (q.norm * c.norm))"


def nng_build_sql(dialect: str, m: int = NSW_M) -> str:
    """Adjacency build: exact all-pairs cosine top-``m`` per node,
    ranked by (round(dist,6), neighbor id) — the SAME total order the
    tiled-GEMM builder uses (blockgemm.knn_all), so the persisted
    Spark-side index and this SQL derivation are row-identical
    (pinned by tests/test_ann_recall.py::test_nng_gemm_equals_sql)."""
    d = _dist(dialect)
    return f"""
SELECT query_id AS src, neighbor_id AS dst FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY round({d}, 6) ASC, c.vec_id ASC) AS rk
  FROM emb q JOIN emb c ON c.vec_id <> q.vec_id
) t WHERE rk <= {m}
""".strip()


def nsw_init_sql(
    dialect: str,
    n_queries: int = NSW_NQ,
    query_pred: str | None = None,
) -> str:
    """Hop-0 visited relation: every query scored against the entry
    node (global min vec_id — a one-row broadcast subquery).
    ``query_pred`` overrides the default id-prefix batch (used by the
    ann_graph_merge insert path)."""
    d = _dist(dialect)
    pred = query_pred if query_pred is not None else f"q.vec_id < {n_queries}"
    return f"""
SELECT q.vec_id AS query_id, c.vec_id AS node, {d} AS dist
FROM emb q JOIN emb c ON c.vec_id = (SELECT min(vec_id) FROM emb)
WHERE {pred}
""".strip()


def nsw_new_sql(frontier: str, visited: str, adj: str) -> str:
    """Nodes discovered this hop and never scored before."""
    return f"""
SELECT DISTINCT f.query_id, g.dst AS node
FROM {frontier} f JOIN {adj} g ON g.src = f.node
EXCEPT
SELECT query_id, node FROM {visited}
""".strip()


def nsw_scored_sql(dialect: str, new: str) -> str:
    """Distance fold for the hop's new (query, node) pairs."""
    d = _dist(dialect)
    return f"""
SELECT n.query_id, n.node, {d} AS dist
FROM {new} n
JOIN emb q ON q.vec_id = n.query_id
JOIN emb c ON c.vec_id = n.node
""".strip()


def nsw_frontier_sql(scored: str, beam: int = NSW_BEAM) -> str:
    """Next frontier: per-query top-``beam`` of the hop's new nodes."""
    return f"""
SELECT query_id, node FROM (
  SELECT query_id, node,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, node ASC) AS rk
  FROM {scored}
) t WHERE rk <= {beam}
""".strip()


def nsw_final_sql(
    visited: str, k: int = NSW_K, exclude_self: bool = True,
) -> str:
    """Answer: per-query top-``k`` of everything scored, self excluded
    (display distance on round-6, ranking on the raw fold)."""
    where = "WHERE node <> query_id" if exclude_self else ""
    return f"""
SELECT query_id, node AS neighbor_id, CAST(rk AS INT) AS rank,
       round(dist, 6) + 0.0 AS dist
FROM (
  SELECT query_id, node, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, node ASC) AS rk
  FROM {visited} {where}
) t WHERE rk <= {k}
""".strip()


def nsw_oracle_sql(
    dialect: str,
    m: int = NSW_M,
    beam: int = NSW_BEAM,
    hops: int = NSW_HOPS,
    k: int = NSW_K,
    n_queries: int = NSW_NQ,
    adj_source: str | None = None,
    query_pred: str | None = None,
    exclude_self: bool = True,
) -> str:
    """Single-text unrolled form: graph build + ``hops`` beam rounds +
    final top-k. MATERIALIZED CTEs for the multi-consumer relations
    (see module docstring); ``adj_source`` lets the Spark side serve
    the adjacency from the persisted index while the oracle derives it
    end-to-end."""
    mat = " MATERIALIZED" if dialect == "duckdb" else ""
    adj = (f"nng AS{mat} (\n{nng_build_sql(dialect, m)}\n)"
           if adj_source is None
           else f"nng AS (SELECT src, dst FROM {adj_source})")
    parts = [adj,
             f"v0 AS{mat} "
             f"(\n{nsw_init_sql(dialect, n_queries, query_pred)}\n)",
             "f0 AS (SELECT query_id, node FROM v0)"]
    for i in range(hops):
        parts.append(
            f"n{i} AS{mat} (\n{nsw_new_sql(f'f{i}', f'v{i}', 'nng')}\n)")
        parts.append(
            f"s{i} AS{mat} (\n{nsw_scored_sql(dialect, f'n{i}')}\n)")
        parts.append(
            f"v{i + 1} AS{mat} (SELECT * FROM v{i} "
            f"UNION ALL SELECT * FROM s{i})")
        parts.append(
            f"f{i + 1} AS{mat} (\n{nsw_frontier_sql(f's{i}', beam)}\n)")
    return ("WITH " + ",\n".join(parts) + "\n"
            + nsw_final_sql(f"v{hops}", k, exclude_self))


def nsw_search(
    spark: SparkSession,
    adj_source: str = "nng",
    beam: int = NSW_BEAM,
    hops: int = NSW_HOPS,
    k: int = NSW_K,
    n_queries: int = NSW_NQ,
    query_pred: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Spark runner: per-hop checkpointed loop over the persisted
    adjacency, early-exit when a hop discovers nothing new."""
    visited_parts = []
    v = spark.sql(
        nsw_init_sql("spark", n_queries, query_pred)
    ).localCheckpoint(eager=True)
    visited_parts.append(v)
    frontier = v.select("query_id", "node")
    for i in range(hops):
        visited = visited_parts[0]
        for p in visited_parts[1:]:
            visited = visited.unionAll(p)
        frontier.createOrReplaceTempView("_nsw_f")
        visited.createOrReplaceTempView("_nsw_v")
        new = spark.sql(nsw_new_sql("_nsw_f", "_nsw_v", adj_source))
        new.createOrReplaceTempView("_nsw_n")
        scored = spark.sql(
            nsw_scored_sql("spark", "_nsw_n")).localCheckpoint(eager=True)
        if scored.count() == 0:
            break
        visited_parts.append(scored)
        scored.createOrReplaceTempView("_nsw_s")
        frontier = spark.sql(nsw_frontier_sql("_nsw_s", beam))
    visited = visited_parts[0]
    for p in visited_parts[1:]:
        visited = visited.unionAll(p)
    visited.createOrReplaceTempView("_nsw_vf")
    return spark.sql(nsw_final_sql("_nsw_vf", k, exclude_self))
