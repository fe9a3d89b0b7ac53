"""Bucketed-table layout for the edge list — the storage half of the
100 TB graph story (SCALE.md: "bucket edges by src so frontier joins
co-locate").

A bucketed, sort-within-bucket table gives Catalyst a guaranteed
hash-partitioning on disk: groupBy/join/window keyed on the bucket
column skip their Exchange entirely (the scan IS the shuffle output).
For the temporal edge table that means degree aggregations (A9/A16),
adjacency joins, and repeated BFS expansions read pre-clustered
buckets instead of re-shuffling the edge list per query — at 100 TB
the edge shuffle is the single biggest recurring cost a traversal
workload pays, and bucketing pays it once at write time.

tests/test_bucketed.py asserts the plan property (zero Exchange nodes
for a bucket-keyed aggregation; one for the same plan on plain
parquet), so the claim regresses loudly rather than living in prose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_edges_bucketed(
    edges: DataFrame, table: str, buckets: int = 32
) -> None:
    """Persist the edge relation bucketed + sorted by src. Bucket count
    is a layout decision: target ~128 MB per bucket file at the
    expected edge volume (32 here matches the local fixture; thousands
    at 100 TB). Delta/iceberg deployments express the same thing as
    clustering/partition specs."""
    (
        edges.write.bucketBy(buckets, "src")
        .sortBy("src")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def degrees_from_table(spark: SparkSession, table: str) -> DataFrame:
    """Out-degree aggregation over a (possibly bucketed) edge table —
    used by the bucketing plan test and the A9/A16 pipelines."""
    from pyspark.sql import functions as F

    return (
        spark.table(table)
        .where(F.col("deleted_at") == 0)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
