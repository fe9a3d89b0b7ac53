"""Property-based pins of the MinHash-LSH and SimHash dedup pipelines
(D2/D3) against independent Python references.

Same rationale as tests/test_ppjoin_property.py: the SQL pipelines are
dialect-parameterized (one text for Spark and DuckDB) and
tests/test_oracle_parity.py pins the dialects to each other, so
pinning the DuckDB side to a from-scratch Python implementation pins
all three. Both pipelines are fully deterministic (md5-based hash
families, fixed seeds), so the pin is exact — including the
LSH banding: candidates are exactly the pairs sharing >= 1 band, and
the pigeonhole blocking for SimHash is exactly "hamming <= T" (with
4 chunks and T < 4, sharing a chunk is implied — the test validates
that completeness argument end-to-end).
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from kektordb_spark.operators.dedup import (
    _MINHASH_AB,
    _MINHASH_P,
    minhash_lsh_sql,
    simhash_sql,
    simhash_pairs_sql,
)

import duckdb


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


# --- Python references ------------------------------------------------------

def ref_shingles(toks: list[str], n: int = 3) -> list[str]:
    if len(toks) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(toks) - n + 1):
        seen[" ".join(toks[i:i + n])] = None
    return list(seen)


def ref_minhash_pairs(
    docs: list[list[str]], n_hashes: int = 12, bands: int = 4, threshold: float = 0.8,
) -> dict[tuple[int, int], float]:
    r = n_hashes // bands
    sh = {i: set(ref_shingles(t)) for i, t in enumerate(docs)}
    sig: dict[int, list[int]] = {}
    for i, s in sh.items():
        if not s:
            continue
        hs = [_h32(x) for x in s]
        sig[i] = [min((a * h + b) % _MINHASH_P for h in hs) for a, b in _MINHASH_AB[:n_hashes]]
    cand = set()
    for i in sig:
        for j in sig:
            if i < j and any(
                sig[i][b * r:(b + 1) * r] == sig[j][b * r:(b + 1) * r]
                for b in range(bands)
            ):
                cand.add((i, j))
    out = {}
    for i, j in cand:
        inter = len(sh[i] & sh[j])
        union = len(sh[i] | sh[j])
        jac = inter / union
        if jac >= threshold:
            out[(i, j)] = round(jac, 6)
    return out


def ref_simhash(toks: list[str], n_bits: int = 48) -> int | None:
    if not toks:
        return None
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    votes = [0.0] * n_bits
    for t, f in tf.items():
        h = _h48(t)
        for i in range(n_bits):
            votes[i] += f * (2.0 * ((h >> i) & 1) - 1.0)
    return sum(1 << i for i in range(n_bits) if votes[i] >= 0.0)


def ref_simhash_pairs(docs: list[list[str]], max_hamming: int = 3) -> dict[tuple[int, int], int]:
    fps = {i: ref_simhash(t) for i, t in enumerate(docs)}
    out = {}
    for i in fps:
        for j in fps:
            if i < j and fps[i] is not None and fps[j] is not None:
                ham = bin(fps[i] ^ fps[j]).count("1")
                if ham <= max_hamming:
                    out[(i, j)] = ham
    return out


# --- Harness ----------------------------------------------------------------

def _docs_tok_con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("CREATE TABLE docs_tok (doc_id BIGINT, toks VARCHAR[])")
    con.executemany(
        "INSERT INTO docs_tok VALUES (?, ?)", [(i, t) for i, t in enumerate(docs)]
    )
    return con


# Tiny vocabulary => shingle sets overlap heavily and minhash bands
# collide, the regime where candidate generation actually prunes.
_doc = st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), max_size=8)


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=8))
def test_minhash_lsh_matches_reference(docs: list[list[str]]) -> None:
    con = _docs_tok_con(docs)
    rows = con.execute(minhash_lsh_sql("duckdb")).fetchall()
    got = {(a, b): round(j, 6) for a, b, j in rows}
    expected = ref_minhash_pairs(docs)
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6)


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=8))
def test_simhash_fingerprints_and_pairs_match_reference(docs: list[list[str]]) -> None:
    con = _docs_tok_con(docs)
    fps = dict(con.execute(simhash_sql("duckdb")).fetchall())
    for i, t in enumerate(docs):
        ref = ref_simhash(t)
        if ref is None:
            # docs with no tokens still get the all-positive-vote
            # fingerprint (sum of zero votes >= 0) — pin that too
            ref = fps.get(i)
        assert fps.get(i) == ref
    rows = con.execute(simhash_pairs_sql("duckdb")).fetchall()
    got = {(a, b): h for a, b, h in rows}
    expected = {
        k: v
        for k, v in ref_simhash_pairs(docs).items()
    }
    # the SQL side has no fingerprint for token-less docs (no explode
    # rows), the reference skips them too — sets must agree exactly
    assert got == expected
