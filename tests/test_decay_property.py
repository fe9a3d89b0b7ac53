"""Property-based pin of the decay expression (H4) against an
independent Python transcription of the reference's Go functions
(pkg/engine/search_utils.go:91-146 calculateTimeDecayModel + the
reference-time / layer / pin / override plumbing of ops.go:1099-1186).

The driver oracle runs the SAME SQL text in DuckDB, which cannot catch
a semantic error shared by both dialects; this test can, because the
reference implementation here is written from the Go, not from the SQL.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from kektordb_spark.functions.decay import HALF_LIFE_SECONDS, decay_sql


def ref_decay(
    created: int,
    last_accessed: int | None,
    access_count: int,
    pinned: bool,
    layer: str,
    model: str | None,
    query_time: int,
) -> float:
    # ops.go:1125-1131 pinned skip; config.go layer half-life
    if pinned:
        return 1.0
    hl = HALF_LIFE_SECONDS.get(layer, HALF_LIFE_SECONDS["episodic"])
    if hl <= 0:
        return 1.0  # procedural: decay disabled
    # ops.go:1133-1146 reference time = max(created, last_accessed)
    ref_time = float(created)
    if last_accessed is not None and last_accessed > ref_time:
        ref_time = float(last_accessed)
    age = float(query_time) - ref_time
    if age <= 0:
        return 1.0
    m = model if model else "exponential"
    if m == "linear":
        return max(0.0, 1.0 - age / hl)
    if m == "step":
        return 1.0 if age < hl else 0.0
    if m == "ebbinghaus":
        stability = hl * (1.0 + math.log1p(float(access_count)))
        return math.exp(-age / stability)
    return math.pow(2.0, -age / hl)  # exponential + unknown-model fallback


_T0 = 1_700_000_000

ts = st.integers(min_value=_T0 - 10_000_000, max_value=_T0 + 10_000_000)


@settings(max_examples=200, deadline=None)
@given(
    created=ts,
    last_accessed=st.one_of(st.none(), ts),
    access_count=st.integers(min_value=0, max_value=200),
    pinned=st.booleans(),
    layer=st.sampled_from(["episodic", "semantic", "procedural", "custom"]),
    model=st.sampled_from(
        [None, "exponential", "linear", "step", "ebbinghaus", "bogus"]
    ),
    query_time=ts,
)
def test_decay_sql_matches_go_reference(
    created, last_accessed, access_count, pinned, layer, model, query_time
) -> None:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE mem (created_at BIGINT, last_accessed BIGINT, "
        "access_count INT, pinned BOOLEAN, memory_layer VARCHAR, decay_model VARCHAR)"
    )
    con.execute(
        "INSERT INTO mem VALUES (?, ?, ?, ?, ?, ?)",
        [created, last_accessed, access_count, pinned, layer, model],
    )
    got = con.execute(
        f"SELECT {decay_sql(query_time, dialect='duckdb')} FROM mem"
    ).fetchone()[0]
    want = ref_decay(
        created, last_accessed, access_count, pinned, layer, model, query_time
    )
    assert got == pytest.approx(want, rel=1e-12, abs=1e-300)
