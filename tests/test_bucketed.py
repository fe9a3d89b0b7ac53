"""Bucketed edge layout: the bucket-keyed aggregation must run with
ZERO Exchange nodes (the bucketed scan already provides the hash
partitioning), while the same plan over plain parquet needs one.
This is the verifiable form of SCALE.md's "bucket edges by src"."""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL


def _n_exchanges(df) -> int:
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return len(re.findall(r"- Exchange \(", plan))


def test_bucketed_degree_agg_has_no_exchange(spark, tmp_path):
    from kektordb_spark.sources.bucketed import (
        degrees_from_table,
        write_edges_bucketed,
    )
    from kektordb_spark.tables import load_tables

    # warehouse dir is a static conf (defaults to ./spark-warehouse in
    # the repo); the table is dropped in the finally block below.
    load_tables(spark, SF_SMALL)
    edges = spark.table("edges")

    # plain parquet baseline: one shuffle for the groupBy
    plain = (tmp_path / "plain_edges").as_posix()
    edges.write.mode("overwrite").parquet(plain)
    spark.read.parquet(plain).createOrReplaceTempView("_plain_edges")
    base = degrees_from_table(spark, "_plain_edges")
    assert _n_exchanges(base) == 1

    # bucketed: the scan IS the hash partitioning — zero exchanges
    write_edges_bucketed(edges, "bucketed_edges_test", buckets=8)
    try:
        bucketed = degrees_from_table(spark, "bucketed_edges_test")
        assert _n_exchanges(bucketed) == 0
        # same answer, of course
        a = {(r["src"], r["degree"]) for r in base.collect()}
        b = {(r["src"], r["degree"]) for r in bucketed.collect()}
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_edges_test")
