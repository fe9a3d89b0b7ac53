"""Property-based check of the VSearch facade's metadata-filter
adapter (api._meta_filter_pred): the same filter DSL the typed views
accept (F1-F4 grammar) evaluated against the facade's untyped
``meta map<string,string>`` column — the reference evaluates filters
against its schemaless metadata maps the same way (core.go:1786-1922).

Random filter strings run two ways over one in-memory Index:

  1. Spark — _meta_filter_pred -> Catalyst predicate over the map;
  2. Python — an independent evaluator of the adapter's contract:
     string-exact equality, case-insensitive booleans, numeric CAST
     for range operators (non-numeric stored values never match a
     range), ``!=`` includes rows missing the key.

Both must select the same id set.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kektordb_spark import api
from kektordb_spark.filters import parse_filter

KEYS = ("category", "level", "flag")
_STR_VALUES = ["alpha", "beta", "gamma", "zzz"]
_NUM_VALUES = [0, 3, 7.5, 100]
_BOOL_VALUES = ["true", "false"]


def _mk_leaf(key: str, op_i: int, sv: str, nv: float, bv: str) -> str:
    if key == "level":
        op = ["=", "!=", "<", "<=", ">", ">="][op_i]
        return f"{key} {op} {nv}"
    op = ["=", "!="][op_i % 2]
    return f"{key} {op} {bv if key == 'flag' else sv}"


_leaf = st.builds(
    _mk_leaf,
    key=st.sampled_from(KEYS),
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

# Fixed corpus: missing keys, non-numeric "level" values, mixed-case
# booleans — every edge the adapter documents.
ROWS = [
    {"id": "r0", "meta": {"category": "alpha", "level": "3", "flag": "true"}},
    {"id": "r1", "meta": {"category": "beta", "level": "7.5", "flag": "True"}},
    {"id": "r2", "meta": {"category": "gamma", "level": "100"}},
    {"id": "r3", "meta": {"level": "0", "flag": "false"}},
    {"id": "r4", "meta": {"category": "alpha", "level": "nan?"}},
    {"id": "r5", "meta": {}},
    {"id": "r6", "meta": {"category": "zzz", "flag": "FALSE"}},
]


def _py_leaf(meta: dict, key: str, op: str, val: str) -> bool:
    actual = meta.get(key)
    if op in ("=", "!="):
        if val.lower() in ("true", "false"):
            eq = actual is not None and actual.lower() == val.lower()
        else:
            eq = actual is not None and actual == val
        return eq if op == "=" else not eq
    if actual is None:
        return False
    try:
        a = float(actual)
    except ValueError:
        return False
    w = float(val)
    return {"<": a < w, "<=": a <= w, ">": a > w, ">=": a >= w}[op]


def _py_eval(filter_str: str) -> set:
    blocks = parse_filter(filter_str)
    out = set()
    for row in ROWS:
        for block in blocks:
            if all(_py_leaf(row["meta"], l.key, l.op, l.value) for l in block):
                out.add(row["id"])
                break
    return out


@pytest.fixture(scope="module")
def meta_idx(spark):
    ix = api.vcreate(spark, "metaprop")
    items = [{"id": r["id"], "vector": [1.0], "meta": r["meta"]} for r in ROWS]
    ix = api.vadd_batch(ix, items, now=1_000)
    # one eager materialization so 25 hypothesis examples don't re-run
    # the build plan each time
    object.__setattr__(ix, "vectors", ix.vectors.localCheckpoint(eager=True))
    return ix


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fstr=_filter_str)
def test_meta_filter_adapter_matches_reference(fstr, meta_idx):
    got = {
        r["id"]
        for r in meta_idx.vectors.where(api._meta_filter_pred(fstr))
        .select("id").collect()
    }
    assert got == _py_eval(fstr), fstr
