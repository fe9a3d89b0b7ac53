"""Redundant-cluster consolidation (A5) + knowledge-gap detection (A6).

Reference (gardener.go:781-937, 2295-2426):
  * A5 walks nodes greedily: k-NN(10) per node, cluster = members with
    score >= 0.90, consolidate clusters of >= 5. Greedy iteration is
    order-dependent and single-node-bound (SURVEY.md §7 risk note), so
    the Spark-native re-expression is CONNECTED COMPONENTS over the
    similarity-threshold graph with min-label propagation: a fixed
    number of rounds of "label = min(own, neighbors')" joins —
    deterministic, fully distributed, and oracle-checkable. After k
    rounds labels are exact for components of diameter <= k (documented
    approximation; the fixture components are small).
  * A6 flags pairs that are semantically close but share NO graph
    connection — re-anchored on the fixture: similar part embeddings
    (vec i <-> part p_i) that never co-occur in any order (the
    co-occurrence edge is the anti-join side).

Scale notes: the pair-generation step here is the exact O(N^2)
baseline; at corpus scale swap in the LSH bucket join
(operators/knn.py) — the propagation/anti-join stages are unchanged.
Label propagation shuffles only (node, label) pairs per round.
"""

from __future__ import annotations

from kektordb_spark.tables import dot_sql


def _pairs_cte(dialect: str, threshold: float) -> str:
    dot = dot_sql(dialect, "a.v", "b.v")
    return f"""pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS w
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE ({dot}) / (a.norm * b.norm) >= {threshold}
),
und AS (
  SELECT u, w FROM pairs UNION ALL SELECT w AS u, u AS w FROM pairs
)"""


def consolidation_sql(
    dialect: str, threshold: float = 0.40, iters: int = 4, min_size: int = 3,
) -> str:
    """A5 as bounded min-label propagation over the similarity graph."""
    parts = [_pairs_cte(dialect, threshold)]
    parts.append("l0 AS (SELECT DISTINCT u AS node, u AS label FROM und)")
    prev = "l0"
    for i in range(1, iters + 1):
        parts.append(f"""l{i} AS (
  SELECT n.node, least(n.label, coalesce(min(p.label), n.label)) AS label
  FROM {prev} n
  LEFT JOIN und e ON e.u = n.node
  LEFT JOIN {prev} p ON p.node = e.w
  GROUP BY n.node, n.label
)""")
        prev = f"l{i}"
    body = ",\n".join(parts)
    # members sorted numerically then joined
    if dialect == "spark":
        members = "array_join(transform(array_sort(collect_list(node)), x -> CAST(x AS STRING)), ',')"
    else:
        members = "array_to_string(list_transform(list_sort(list(node)), x -> CAST(x AS VARCHAR)), ',')"
    return f"""
WITH {body}
SELECT label AS cluster_master, CAST(count(*) AS INT) AS size,
       {members} AS members
FROM {prev}
GROUP BY label
HAVING count(*) >= {min_size}
""".strip()


def consolidation_df(
    spark, threshold: float = 0.40, iters: int = 4, min_size: int = 3,
):
    """Spark-side A5: the similarity edge list comes from the blocked
    float64 GEMM kernel (operators/blockgemm.py — each tile one numpy
    matmul, threshold applied in-kernel so only surviving pairs shuffle)
    and is MATERIALIZED once (persist) because the label-propagation
    rounds re-reference it. Semantics identical to consolidation_sql —
    the DuckDB oracle runs that SQL."""
    from pyspark.sql import functions as F

    from kektordb_spark.operators import blockgemm as BG

    # Eager localCheckpoint (not persist): materializes AND truncates
    # lineage, so no later stage re-enters the Python mapInPandas kernel
    # and every round's job starts from the (tiny) checkpointed edge set.
    pairs = (
        BG.cosine_pairs(spark, threshold=threshold)
        .select("u", "w")
        .localCheckpoint(eager=True)
    )
    und = (
        pairs.unionAll(pairs.select(F.col("w").alias("u"), F.col("u").alias("w")))
        .repartition("u")
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        labels = (
            labels.alias("n")
            .join(und.alias("e"), F.col("n.node") == F.col("e.u"), "left")
            .join(labels.alias("p"), F.col("p.node") == F.col("e.w"), "left")
            .groupBy(F.col("n.node").alias("node"), F.col("n.label").alias("l0"))
            .agg(F.min(F.col("p.label")).alias("lmin"))
            .select("node", F.least(F.col("l0"), F.coalesce("lmin", "l0")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("int").alias("size"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("node")),
                            lambda x: x.cast("string")), ",",
            ).alias("members"),
        )
        .where(F.col("size") >= min_size)
        .select(F.col("label").alias("cluster_master"), "size", "members")
    )


def knowledge_gaps_sql(dialect: str, threshold: float = 0.42) -> str:
    """A6: similar part-embedding pairs with NO co-occurrence in any
    order — similarity join (LSH at scale) anti-joined against the
    relationship evidence."""
    dot = dot_sql(dialect, "a.v", "b.v")
    return f"""
WITH sim AS (
  SELECT a.vec_id AS u, b.vec_id AS w,
         round(({dot}) / (a.norm * b.norm), 6) AS sim
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE ({dot}) / (a.norm * b.norm) >= {threshold}
),
cooc AS (
  SELECT DISTINCT la.l_partkey AS u, lb.l_partkey AS w
  FROM lineitem la JOIN lineitem lb
    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
)
SELECT s.u AS part_a, s.w AS part_b, s.sim
FROM sim s
LEFT JOIN cooc c ON c.u = s.u AND c.w = s.w
WHERE c.u IS NULL
""".strip()
