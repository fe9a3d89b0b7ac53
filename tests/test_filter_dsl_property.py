"""Property-based cross-engine check of the filter DSL (F1-F5).

Random filter strings (grammar of core.go:1695-1922: OR of AND-blocks,
no parentheses) are evaluated three ways on the mem view:

  1. Spark  — filter_to_column -> Catalyst predicate;
  2. DuckDB — filter_to_sql('duckdb') on the same view SQL;
  3. Python — an independent reference evaluator implementing the
     reference semantics directly (``!=`` includes missing, bool via
     string forms, AND-tighter-than-OR).

All three must select exactly the same id set. This pins the
non-standard semantics the reference relies on (SURVEY.md §7 risk
notes) far beyond the two fixed registry queries.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kektordb_spark.filters import filter_to_column, filter_to_sql, parse_filter
from kektordb_spark.tables import load_tables, mem_view_sql

# (column, type) of the mem view fields the DSL may touch.
SCHEMA = {
    "event_type": "string",
    "memory_layer": "string",
    "value": "double",
    "price": "double",          # has NULLs -> exercises the != rule
    "access_count": "double",
    "pinned": "boolean",
}

_STR_VALUES = ["click", "view", "purchase", "error", "signup",
               "episodic", "semantic", "procedural", "zzz_missing"]
_NUM_VALUES = [0, 1, 7, 25, 49.5, 100, 480.0]
_BOOL_VALUES = ["true", "false"]

def _mk_leaf(key: str, op_i: int, sv: str, nv: float, bv: str) -> str:
    # Range operators exist only on the numeric B-Tree path
    # (core.go:1836-1884); strings/bools get = and != only.
    if SCHEMA[key] == "double":
        op = ["=", "!=", "<", "<=", ">", ">="][op_i]
        return f"{key} {op} {nv}"
    op = ["=", "!="][op_i % 2]
    return f"{key} {op} {bv if SCHEMA[key] == 'boolean' else sv}"


_leaf = st.builds(
    _mk_leaf,
    key=st.sampled_from(sorted(SCHEMA)),
    op_i=st.integers(min_value=0, max_value=5),
    sv=st.sampled_from(_STR_VALUES),
    nv=st.sampled_from(_NUM_VALUES),
    bv=st.sampled_from(_BOOL_VALUES),
)

_filter_str = st.builds(
    lambda blocks: " OR ".join(" AND ".join(b) for b in blocks),
    blocks=st.lists(st.lists(_leaf, min_size=1, max_size=3),
                    min_size=1, max_size=3),
)


def _py_leaf(row: dict, key: str, op: str, val: str) -> bool:
    """Reference evaluator for one leaf (core.go:1786-1922)."""
    actual = row.get(key)
    typ = SCHEMA[key]
    if op == "!=":
        # includes rows missing the field entirely (core.go:1886-1917)
        if actual is None:
            return True
        if typ == "boolean":
            return ("true" if actual else "false") != val
        if typ == "double":
            try:
                return float(actual) != float(val)
            except ValueError:
                return True
        return str(actual) != val
    if actual is None:
        return False
    if typ == "boolean":
        return op == "=" and ("true" if actual else "false") == val
    if typ == "double":
        try:
            want = float(val)
        except ValueError:
            return False
        a = float(actual)
        return {"=": a == want, "<": a < want, "<=": a <= want,
                ">": a > want, ">=": a >= want}[op]
    # strings: equality via inverted index; ranges lexicographic on the
    # B-Tree don't exist for strings in the reference -> only =
    # matches; our translator emits lexicographic compare, mirror that.
    s = str(actual)
    return {"=": s == val, "<": s < val, "<=": s <= val,
            ">": s > val, ">=": s >= val}[op]


def _py_eval(rows: list[dict], filter_str: str) -> set:
    blocks = parse_filter(filter_str)
    out = set()
    for row in rows:
        for block in blocks:  # OR of AND-blocks
            if all(_py_leaf(row, l.key, l.op, l.value) for l in block):
                out.add(row["id"])
                break
    return out


@pytest.fixture(scope="module")
def mem_rows(duck):
    duck.execute(
        "CREATE OR REPLACE VIEW mem AS " + mem_view_sql("duckdb"))
    cols = ["id", *SCHEMA]
    rows = duck.execute(f"SELECT {', '.join(cols)} FROM mem").fetchall()
    return [dict(zip(cols, r)) for r in rows]


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fstr=_filter_str)
def test_filter_dsl_three_way(fstr, spark, duck, mem_rows):
    from tests.conftest import SF_SMALL

    load_tables(spark, SF_SMALL)
    got_spark = {
        r["id"]
        for r in spark.table("mem").where(
            filter_to_column(fstr, SCHEMA)).select("id").collect()
    }
    got_duck = {
        r[0]
        for r in duck.execute(
            "SELECT id FROM mem WHERE "
            + filter_to_sql(fstr, SCHEMA, "duckdb")).fetchall()
    }
    got_py = _py_eval(mem_rows, fstr)
    assert got_spark == got_duck == got_py, (
        f"filter {fstr!r}: spark={len(got_spark)} duck={len(got_duck)} "
        f"py={len(got_py)}; spark^py={list(got_spark ^ got_py)[:5]}"
    )
