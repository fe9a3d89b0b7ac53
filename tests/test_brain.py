"""Brain extension point: the deterministic judge's semantics, the
SQL twin's agreement (DuckDB side), and the set_brain override."""

from __future__ import annotations

import duckdb

from kektordb_spark.functions import brain as B


def test_deterministic_judge():
    br = B.DeterministicBrain()
    cases = [
        ("hot gizmo", "cold gizmo", True, "antonym conflict: hot vs cold"),
        ("cold gizmo", "hot gizmo", True, "antonym conflict: cold vs hot"),
        ("small ring", "large ring", True, "antonym conflict: small vs large"),
        # antonym words but NO shared topic token -> not a contradiction
        ("hot gizmo", "cold ring", False, ""),
        # shared topic, no antonym axis
        ("red gizmo", "blue gizmo", False, ""),
        ("", "", False, ""),
    ]
    got = br.judge_contradictions([c[0] for c in cases], [c[1] for c in cases])
    assert got == [(c[2], c[3]) for c in cases]


def test_sql_twin_matches_python():
    br = B.DeterministicBrain()
    pred, reason = B.contradiction_sql_pred("duckdb", "a", "b")
    con = duckdb.connect()
    vocab = ["hot gizmo", "cold gizmo", "small ring", "large ring",
             "hot ring", "red gizmo", "blue gizmo", "old gear",
             "new gear", "fast bolt", "slow bolt", ""]
    pairs = [(x, y) for x in vocab for y in vocab]
    vals = ", ".join(f"('{x}', '{y}')" for x, y in pairs)
    rows = con.execute(
        f"SELECT {pred}, {reason} FROM (VALUES {vals}) t(a, b)"
    ).fetchall()
    expect = br.judge_contradictions([p[0] for p in pairs],
                                     [p[1] for p in pairs])
    assert [(bool(r[0]), r[1]) for r in rows] == list(expect)


def test_set_brain_override():
    class YesBrain(B.Brain):
        def judge_contradictions(self, a, b):
            return [(True, "override")] * len(a)

    old = B.get_brain()
    try:
        B.set_brain(YesBrain())
        assert B.get_brain().judge_contradictions(["x"], ["y"]) == [
            (True, "override")
        ]
    finally:
        B.set_brain(old)
    assert isinstance(B.get_brain(), B.DeterministicBrain)
