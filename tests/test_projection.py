"""JL random-projection audits (operators/projection.py): the
distortion histogram must show the Johnson-Lindenstrauss concentration
(this is a property of the seeded map, independent of corpus
structure), and the projection expression must be a pure scan-time
column (no shuffle, no join)."""

from __future__ import annotations

from kektordb_spark.plans import registry
from kektordb_spark.tables import load_tables
from tests.conftest import SF_SMALL


def test_distortion_concentrates_near_one(spark):
    """E[ratio] = 1 under the 1/sqrt(k) scaling; for k=16 the std is
    ~sqrt(2/16) ~ 0.35, so the bulk of the ring-sample pairs must land
    within +/-50% of 1.0 (buckets 5..14 on the floor-0.1 grid)."""
    rows = registry._registry["emb_projection_audit"][0](
        spark, SF_SMALL).collect()
    total = sum(r.n_pairs for r in rows)
    core = sum(r.n_pairs for r in rows if 5 <= r.bucket <= 14)
    assert total > 0
    assert core / total >= 0.7, f"JL concentration broken: {core}/{total}"
    # and the mode sits at ratio ~1.0 (bucket 9 or 10)
    mode = max(rows, key=lambda r: r.n_pairs).bucket
    assert 7 <= mode <= 12, f"distortion mode drifted: bucket {mode}"


def test_projection_is_scan_time_column(spark):
    """The projected-vector derivation must plan as a projection over
    one scan: no Exchange, no Join — the no-shuffle claim the module
    docstring makes, asserted on the live plan."""
    from kektordb_spark.operators.projection import jl_proj_sql

    load_tables(spark, SF_SMALL)
    df = spark.sql(
        f"SELECT vec_id, {jl_proj_sql('spark', 'v')} AS p FROM emb")
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan
    assert "Join" not in plan
