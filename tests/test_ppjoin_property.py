"""Property-based exactness check of the PPJoin prefix filter (D4).

dedup.ngram_jaccard_sql prunes candidate pairs with three bounds
(size filter, first-shared-gram viability, summed positional bound)
before verification. All three must be EXACT — a lossy bound would
silently drop true near-duplicate pairs, which no output-level parity
test at a fixed corpus would reliably catch.

This test runs the full DuckDB-dialect pipeline on hypothesis-generated
corpora (small alphabet => heavy prefix collisions, the regime where
the positional bounds actually bite) and compares against a naive
all-pairs Jaccard join in plain Python with the same blocking
semantics (length bucket n_chars DIV 32).

No Spark needed: the Spark and DuckDB sides of the operator share one
SQL text (dialect-parameterized), and tests/test_oracle_parity.py pins
the two dialects to each other — so pinning DuckDB to the naive oracle
pins all three implementations.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from kektordb_spark.operators.dedup import ngram_jaccard_sql

N = 4
THRESHOLD = 0.6


def naive_pairs(texts: list[str]) -> dict[tuple[int, int], float]:
    """All-pairs char-4-gram Jaccard with the operator's blocking
    semantics: only docs in the same length bucket are compared."""
    grams = [set(t[i:i + N] for i in range(len(t) - N + 1)) for t in texts]
    blk = [len(t) // 32 for t in texts]
    out: dict[tuple[int, int], float] = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if blk[i] != blk[j] or not grams[i] or not grams[j]:
                continue
            inter = len(grams[i] & grams[j])
            union = len(grams[i] | grams[j])
            jac = inter / union
            if jac >= THRESHOLD:
                out[(i, j)] = round(jac, 6)
    return out


# Small alphabet + repeated chunks => many shared grams and colliding
# prefixes; lengths straddle the 32-char block boundary.
_chunk = st.text(alphabet="ab ", min_size=1, max_size=12)
_doc = st.lists(_chunk, min_size=0, max_size=8).map("".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=10))
def test_ppjoin_matches_naive_all_pairs(texts: list[str]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    rows = con.execute(ngram_jaccard_sql("duckdb", n=N, threshold=THRESHOLD)).fetchall()
    got = {(a, b): j for a, b, j in rows}
    expected = naive_pairs([t.lower() for t in texts])
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6)
