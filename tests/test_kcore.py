"""k-core peeling (operators/kcore.py): fixpoint result vs an
independent sequential-peel replica, the idempotence the unrolled
oracle relies on, and the convergence assertion's raise path."""

from __future__ import annotations

import collections

import pytest

from tests.conftest import SF_SMALL


def _peel_replica(edges, k):
    """Sequential reference peel: returns {node: in-core degree}."""
    adj: dict[int, set[int]] = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, s in adj.items() if len(s) < k]:
            changed = True
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(s) for n, s in adj.items()}


def _edges(spark):
    from kektordb_spark.operators.kcore import kcore_edges_sql

    return [(r.pa, r.pb) for r in spark.sql(kcore_edges_sql()).collect()]


def test_kcore_matches_sequential_peel(spark):
    from kektordb_spark.operators.kcore import KCORE_K, kcore
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    want = _peel_replica(_edges(spark), KCORE_K)

    rows = kcore(spark).collect()
    assert {r.part_id: r.core_degree for r in rows} == want
    # deterministic ordering: core_degree desc, part_id asc
    keys = [(-r.core_degree, r.part_id) for r in rows]
    assert keys == sorted(keys)


def test_kcore_oracle_idempotent_past_fixpoint(spark):
    """The oracle unrolls MORE rounds than convergence needs; peeling a
    fixpoint must be the identity or the unrolled form would diverge
    from the early-exiting Spark runner."""
    import duckdb

    from kektordb_spark.operators.kcore import (
        KCORE_MAX_ROUNDS, kcore_oracle_sql)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    short = con.sql(kcore_oracle_sql(rounds=KCORE_MAX_ROUNDS)).fetchall()
    longer = con.sql(kcore_oracle_sql(rounds=KCORE_MAX_ROUNDS + 4)).fetchall()
    assert short == longer


def test_kcore_convergence_assertion_raises(spark):
    """max_rounds too small to reach the fixpoint -> RAISE, never a
    half-peeled core (the components/LSH-lattice discipline). K above
    the max degree forces every round to keep shrinking until empty;
    max_rounds=1 cannot get there on the fixture graph."""
    from kektordb_spark.operators.kcore import kcore
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    if not _edges(spark):
        pytest.skip("fixture graph empty at this sf")
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(spark, k=10**9, max_rounds=1)
