"""Partition-order independence of the shuffled-aggregate queries.

The r2/r3 flake class: a GROUP BY sum of doubles reduces in an order
that varies with the shuffle partitioning (AQE coalesces differently
under load), and a value landing within float noise of a round-6
half-way boundary flips the emitted 6th decimal — failing the oracle
hash once per few hundred runs. The fix quantizes each term to an
integer grid before summing (exactly associative); this test pins the
property by running the affected queries under deliberately different
shuffle-partition counts and AQE settings and requiring bit-identical
output.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

STRESSED = [
    "proxy_hyde_dual_rag",
    "knn_pq_top10",
    "ivfpq_knn",
    "text_unigram_logprob",  # r4: ln-term mean moved onto the integer grid
    "text_quality_score",  # r5: ratios moved onto the floor micro-grid (_grid6)
    "text_token_count",  # r5: chars_per_token on the floor micro-grid
    "sketch_distinct_kmv",  # r5: floor-based est + rel_error grid
]


@pytest.mark.parametrize("name", STRESSED)
def test_output_invariant_under_partitioning(spark, name):
    from kektordb_spark.plans.registry import queries

    q = queries()[name]
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    outs = []
    try:
        for parts, aqe in (("2", "true"), ("7", "false"), ("64", "true")):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            outs.append(sorted(map(tuple, q(spark, SF_SMALL).collect())))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    assert outs[0] == outs[1] == outs[2]
