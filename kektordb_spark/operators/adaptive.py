"""Adaptive retrieval (SURVEY.md §3.3 — pkg/rag/adaptive_retriever.go).

Reference pipeline (RetrieveWithContext, adaptive_retriever.go:101-411):
seed k-NN → graph expansion (greedy 1-hop; per-hop score =
parent_score x edge weight, default 0.3) → assembled context score =
w_sem * derived + w_graph * depthPenalty(1 - 0.15*depth, floor 0.3)
+ w_dens * normalizedDensity, where normalizedDensity =
clamp((density - 0.3) / 0.6, 0, 1) (adaptive_retriever.go:311-316) →
greedy fill under a token budget (running chars/CharsPerToken
estimate).

Spark shape — ONE declarative plan, no driver loops:
  * seeds: exact k-NN (broadcast query);
  * expansion: one more k-NN hop FROM the seeds (the fixture's
    similarity graph; on a property graph this is an edge equi-join —
    same plan shape);
  * dedup keep-best: groupBy(id) max(score) — one shuffle of k*fanout
    rows;
  * token budget: running sum over a Window ORDER BY final score —
    Catalyst evaluates it in the same stage as the sort.

The whole thing has a DuckDB oracle (dialect-parameterized SQL below).
"""

from __future__ import annotations

from kektordb_spark.tables import dot_sql

W_SEM, W_GRAPH, W_DENS = 0.6, 0.25, 0.15
EDGE_WEIGHT = 0.3          # default edge-type weight (retriever default)
DEPTH_PENALTY = 0.15       # 1 - 0.15*depth, floor 0.3
SEED_K = 5
EXPAND_K = 3


def adaptive_retrieve_sql(
    dialect: str,
    query_id: int = 0,
    token_budget: int = 400,
) -> str:
    """Full adaptive retrieval for one query vector; candidate doc =
    emb vec_id (the fixture's 1:1 doc<->embedding mapping)."""
    dot_q = dot_sql(dialect, "q.v", "c.v")
    dot_s = dot_sql(dialect, "s.v", "c.v")
    size = "size" if dialect == "spark" else "len"
    dist = "array_distinct" if dialect == "spark" else "list_distinct"
    return f"""
WITH q AS (SELECT * FROM emb WHERE vec_id = {query_id}),
seed_d AS (
  SELECT c.vec_id, c.v, c.norm,
         1.0 / (1.0 + (1.0 - ({dot_q}) / (q.norm * c.norm))) AS score
  FROM q CROSS JOIN emb c WHERE c.vec_id <> {query_id}
),
seeds AS (
  SELECT vec_id, v, norm, score, 0 AS depth FROM (
    SELECT *, row_number() OVER (ORDER BY score DESC, vec_id ASC) AS rk FROM seed_d
  ) t WHERE rk <= {SEED_K}
),
exp_d AS (
  SELECT c.vec_id,
         s.score * {EDGE_WEIGHT} AS score,
         1 AS depth,
         row_number() OVER (
           PARTITION BY s.vec_id
           ORDER BY 1.0 - ({dot_s}) / (s.norm * c.norm) ASC, c.vec_id ASC
         ) AS rk
  FROM seeds s CROSS JOIN emb c
  WHERE c.vec_id <> s.vec_id AND c.vec_id <> {query_id}
),
cand AS (
  SELECT vec_id, score, depth FROM seeds
  UNION ALL
  SELECT vec_id, score, depth FROM exp_d WHERE rk <= {EXPAND_K}
),
best AS (
  -- dedup keep-best: a doc reached both as seed and expansion keeps
  -- the higher score / smaller depth (shortest-path dedup semantics,
  -- adaptive_retriever.go:213-297)
  SELECT vec_id, max(score) AS score, min(depth) AS depth
  FROM cand GROUP BY vec_id
),
scored AS (
  SELECT b.vec_id AS doc_id, d.source,
         CAST({size}(d.toks) AS INT) AS n_toks,
         {W_SEM} * b.score
       + {W_GRAPH} * greatest(0.3, 1.0 - {DEPTH_PENALTY} * b.depth)
       + {W_DENS} * least(1.0, greatest(0.0,
           ((CASE WHEN {size}(d.toks) = 0 THEN 0.0
              ELSE CAST({size}({dist}(d.toks)) AS DOUBLE) / {size}(d.toks) END)
            - 0.3) / 0.6))
         AS final
  FROM best b JOIN docs_tok d ON d.doc_id = b.vec_id
),
budgeted AS (
  SELECT doc_id, source, n_toks, round(final, 6) AS final,
         sum(n_toks) OVER (
           ORDER BY round(final, 6) DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_toks
  FROM scored
)
SELECT doc_id, source, n_toks, final, CAST(cum_toks AS INT) AS cum_toks
FROM budgeted WHERE cum_toks <= {token_budget}
""".strip()
