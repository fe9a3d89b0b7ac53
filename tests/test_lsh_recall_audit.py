"""LSH banding recall/precision audit (operators/dedup.py
minhash_recall_audit_sql): on the fixture corpus the injected
duplicates are exact copies so the audit reads 1.0/1.0 (oracle parity
covers that); here a synthetic BORDERLINE corpus (pairs near the
banding scheme's miss region) pins the discriminative path against an
independent Python replica of the same md5/affine minhash math — the
audit must actually count the pairs banding misses."""

from __future__ import annotations

import hashlib

import pytest

from kektordb_spark.operators.dedup import (
    _MINHASH_AB, _MINHASH_P, minhash_ex_sql, minhash_recall_audit_sql,
    minhash_sig_sql)

N_HASHES = 12
BANDS = 4
R = N_HASHES // BANDS
THRESHOLD = 0.4


def _docs():
    """30 base docs, each with a partner sharing ~half its shingles:
    true jaccard sits near 0.5 where P(candidate) = 1-(1-j^3)^4 ~ 0.4
    — the banding scheme misses a deterministic subset."""
    docs = []
    for i in range(30):
        base = [f"w{i}_{j}" for j in range(12)]
        # partner: first 8 tokens shared, last 4 replaced
        partner = base[:8] + [f"p{i}_{j}" for j in range(4)]
        docs.append((2 * i, base))
        docs.append((2 * i + 1, partner))
    return docs


def _shingles(toks, n=3):
    out, seen = [], set()
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i:i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _replica():
    docs = _docs()
    sh = {d: set(_shingles(t)) for d, t in docs}
    ids = sorted(sh)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= THRESHOLD:
                truth.add((a, b))
    # signatures: h = int(md5(s)[:8], 16); h_k = (a*h+b) % P
    sig = {}
    for d in ids:
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
              for s in sh[d]]
        sig[d] = [min((a * h + b) % _MINHASH_P for h in hs)
                  for (a, b) in _MINHASH_AB[:N_HASHES]]
    cand = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            for band in range(BANDS):
                lo, hi = band * R, band * R + R
                if sig[a][lo:hi] == sig[b][lo:hi]:
                    cand.add((a, b))
                    break
    return truth, cand


def test_audit_counts_match_python_replica(spark):
    docs = _docs()
    df = spark.createDataFrame(
        [(d, t) for d, t in docs], "doc_id bigint, toks array<string>")
    df.createOrReplaceTempView("_aud_docs")
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _aud_ex AS "
        + minhash_ex_sql("spark", source="_aud_docs"))
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _aud_sig AS "
        + minhash_sig_sql("spark", N_HASHES, ex_source="_aud_ex"))
    row = spark.sql(minhash_recall_audit_sql(
        "spark", n_hashes=N_HASHES, bands=BANDS, threshold=THRESHOLD,
        ex_source="_aud_ex", sig_source="_aud_sig")).collect()[0]

    truth, cand = _replica()
    hits = truth & cand
    assert row.n_true_pairs == len(truth)
    assert row.n_candidates == len(cand)
    assert row.n_hits == len(hits)
    # the corpus is built so the banding scheme actually misses pairs —
    # otherwise this test degenerates to the fixture's 1.0/1.0 case
    assert len(truth) >= 30
    assert len(hits) < len(truth)
    assert row.recall == pytest.approx(len(hits) / len(truth), abs=2e-6)
