"""graph_pagerank: Spark power iteration vs an independent pure-Python
replica on the fixture graph (catches dialect-shared semantic bugs the
SQL-vs-SQL oracle cannot — same discipline as test_decay_property)."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal


def _round_half_up(x: float, n: int) -> float:
    """Spark's and DuckDB's round() on doubles is BigDecimal HALF_UP on
    the exact binary value — Python's built-in round() is banker's and
    disagrees at exact .5 boundaries."""
    return float(Decimal(x).quantize(Decimal(f"1e-{n}"), ROUND_HALF_UP))


from tests.conftest import SF_SMALL


def _python_pagerank(edges, damping=0.85, iters=3):
    outdeg = defaultdict(int)
    inb = defaultdict(list)
    nodes = set()
    for s, d in edges:
        outdeg[s] += 1
        nodes.add(s)
        nodes.add(d)
    for s, d in edges:
        inb[d].append(s)
    pr = {v: 1.0 for v in nodes}
    for _ in range(iters):
        pr = {
            v: (1 - damping)
            + damping * sum(pr[u] / outdeg[u] for u in inb[v])
            for v in nodes
        }
    return pr


def test_pagerank_matches_python_replica(spark):
    from kektordb_spark.operators.pagerank import pagerank_df
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    edges = [
        (r["src"], r["dst"])
        for r in spark.table("edges")
        .where("deleted_at = 0")
        .select("src", "dst")
        .collect()
    ]
    pr = _python_pagerank(edges)
    expected = sorted(
        ((_round_half_up(v + 1e-9, 4), n) for n, v in pr.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [
        (r["pr"], r["node"]) for r in pagerank_df(spark).collect()
    ]
    assert got == expected


def test_pagerank_dangling_and_isolated(spark):
    """Dangling nodes keep the (1-d) floor; nodes absent from the edge
    set don't appear at all."""
    from kektordb_spark.operators.pagerank import pagerank_df
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    top = pagerank_df(spark, iters=1, k=None).collect()
    nodes = {r["node"] for r in top}
    # region nodes are sinks (no out-edges) but still ranked
    assert any(n.startswith("r_") for n in nodes)
    # every ranked node touches an active edge
    edge_nodes = {
        x
        for r in spark.table("edges").where("deleted_at = 0").collect()
        for x in (r["src"], r["dst"])
    }
    assert nodes == edge_nodes
    # floor: every rank >= (1 - d)
    assert min(r["pr"] for r in top) >= 0.15 - 1e-9
