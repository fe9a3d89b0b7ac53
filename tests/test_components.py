"""Connected components (operators/components.py): exact-fixpoint
pointer-jumping label propagation vs an independent union-find replica,
plus the convergence assertion's raise path."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _unionfind_components(pairs):
    par: dict[int, int] = {}

    def find(x):
        while par.get(x, x) != x:
            par[x] = par.get(par[x], par[x])
            x = par[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    nodes = {x for p in pairs for x in p}
    comps: dict[int, list[int]] = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    return comps


def test_components_match_unionfind_replica(spark):
    from kektordb_spark.operators import knn_planner as KP
    from kektordb_spark.operators.components import CC_TAU, components_df
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    pairs = [(r.u, r.w) for r in
             KP.similar_pairs(spark, CC_TAU).select("u", "w").collect()]
    want = _unionfind_components(pairs)

    rows = components_df(spark).collect()
    assert len(rows) == len(want)
    import hashlib
    for r in rows:
        members = sorted(want[r.comp_id])
        assert r.comp_id == min(members)
        assert r.size == len(members)
        assert r.max_node == max(members)
        joined = ",".join(str(m) for m in members)
        assert r.members_md5 == hashlib.md5(joined.encode()).hexdigest()
    # output ordering: size desc, comp_id asc
    keys = [(-r.size, r.comp_id) for r in rows]
    assert keys == sorted(keys)


def test_components_convergence_assertion_raises(spark):
    """max_levels=0 cannot converge on a graph with any edge — the
    fixpoint check must raise, never return split components."""
    from kektordb_spark.operators.components import components_df
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    with pytest.raises(RuntimeError, match="did not converge"):
        components_df(spark, max_levels=0)


def test_components_merge_equals_full_rebuild(spark):
    """r6 incremental maintenance: folding the arrival wave into the
    persisted old-graph labels must reproduce the full-graph build
    row-for-row (the losslessness pin; the driver proves the same
    against the DuckDB full-recompute oracle)."""
    from kektordb_spark.operators import components as CC
    from kektordb_spark.tables import load_tables
    from tests.conftest import SF_SMALL

    load_tables(spark, SF_SMALL)
    full = [(r.comp_id, r.size, r.max_node, r.members_md5)
            for r in CC.components_df(spark).collect()]
    merged = [(r.comp_id, r.size, r.max_node, r.members_md5)
              for r in CC.components_merge_df(spark).collect()]
    assert merged == full and len(full) > 0


def test_components_merge_quotient_is_small(spark):
    """The merge's contraction input must be the QUOTIENT graph, not
    the corpus: its edge count is bounded by the new wave's edges, far
    below the full pair index (the O(batch) claim, measured)."""
    from pyspark.sql import functions as F

    from kektordb_spark.operators import components as CC
    from kektordb_spark.operators import knn_planner as KP
    from kektordb_spark.tables import load_tables
    from tests.conftest import SF_SMALL

    load_tables(spark, SF_SMALL)
    all_pairs = KP.similar_pairs(spark, CC.CC_TAU).count()
    new_pairs = KP.similar_pairs(spark, CC.CC_TAU).where(
        (F.col("u") % CC.CCM_MOD == CC.CCM_REM)
        | (F.col("w") % CC.CCM_MOD == CC.CCM_REM)).count()
    assert 0 < new_pairs < all_pairs
