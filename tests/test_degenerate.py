"""Degenerate-input sweep: every registered query must run (not
necessarily return rows) over an EMPTY corpus with the fixture
schemas. Catches the failure class value-parity tests cannot: .first()
assumptions, divide-by-zero surfacing as exceptions instead of nulls,
empty-aggregate folds, explode-of-null, train-on-empty ANN paths —
the reference handles empty indexes gracefully everywhere (a fresh
instance has no data), so must we."""

from __future__ import annotations

import os

import duckdb
import pytest

from kektordb_spark.plans import registry
from tests.conftest import SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SF_SMALL}/{t}.parquet' LIMIT 0) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return out


def test_all_queries_run_on_empty_corpus(spark, empty_sf):
    failures = {}
    for name, fn in sorted(registry.queries().items()):
        try:
            fn(spark, empty_sf).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the sweep
            failures[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
    assert not failures, f"{len(failures)} queries crash on empty corpus: {failures}"


def test_kmv_estimator_accuracy(spark):
    """The KMV sketch's harmonic estimator lands within 3/sqrt(K) of the
    exact distinct count (rel. error bound for K independent mins), and
    its plan has no Generate node (the r4 explode is gone)."""
    from kektordb_spark.operators.analytics import KMV_K
    from kektordb_spark.plans.registry import queries

    df = queries()["sketch_distinct_kmv"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    rows = df.collect()
    assert rows, "expected per-type rows"
    bound = 3.0 / KMV_K ** 0.5
    for r in rows:
        assert r.rel_error < bound, f"{r.event_type}: {r.rel_error} >= {bound}"
