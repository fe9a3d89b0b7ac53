"""Property / replica tests for the r4 pipeline additions: UniMax
language balancing, paragraph-level dedup, PII scrub, BPE apply.

Like test_ppjoin_property.py these run the DuckDB-dialect SQL against
independent pure-Python replicas on hypothesis-generated corpora — no
Spark needed: each operator is one dialect-parameterized SQL text and
tests/test_oracle_parity.py (+ the driver harness) pins the two
dialects to each other, so pinning DuckDB to the naive replica pins
all implementations. The Spark-runner variants with their own code
paths (bpe_apply's Arrow kernel) get an explicit Spark-side pin.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from kektordb_spark.operators.dedup import PARA_W, paragraph_dedup_sql
from kektordb_spark.operators.pipeline import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    UNIMAX_BUDGET_X10,
    UNIMAX_EPOCHS,
    UNIMAX_SEED,
    lang_balance_sql,
    pii_scrub_sql,
)
from tests.conftest import SF_SMALL


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# UniMax water-filling
# ---------------------------------------------------------------------------

def _unimax_python(sizes: dict[str, int]) -> dict[str, int]:
    """Independent water-fill replica: exact integer threshold search
    (no sorting tricks — literally try every feasible full-set
    prefix)."""
    total = sum(sizes.values())
    b = total * UNIMAX_BUDGET_X10 // 10
    caps = {l: s * UNIMAX_EPOCHS for l, s in sizes.items()}
    order = sorted(caps, key=lambda l: (caps[l], l))
    n = len(order)
    alloc = {}
    spent = 0
    for k, lang in enumerate(order):
        remaining_langs = n - k
        share = (b - spent) // remaining_langs if remaining_langs else 0
        if caps[lang] * remaining_langs <= b - spent:
            alloc[lang] = caps[lang]
            spent += caps[lang]
        else:
            # uniform share for this and every later (larger) language
            for l2 in order[k:]:
                alloc[l2] = share
            return alloc
    return alloc


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        st.integers(min_value=1, max_value=200),
        min_size=1,
        max_size=6,
    )
)
def test_unimax_waterfill_matches_replica(sizes):
    con = duckdb.connect()
    rows = []
    i = 0
    for lang, sz in sorted(sizes.items()):
        for _ in range(sz):
            rows.append((i, lang))
            i += 1
    con.execute("CREATE TABLE documents(doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.execute(lang_balance_sql("duckdb")).fetchall()
    want_alloc = _unimax_python(sizes)

    # per-lang allocation and realized row counts agree with the replica
    got_alloc = {}
    per_lang_rows: dict[str, int] = {}
    for doc_id, lang, sel_rank, epoch, lang_alloc, lang_docs in out:
        got_alloc[lang] = lang_alloc
        per_lang_rows[lang] = per_lang_rows.get(lang, 0) + 1
        assert lang_docs == sizes[lang]
        assert 1 <= sel_rank <= sizes[lang]
        assert 1 <= epoch <= UNIMAX_EPOCHS
    for lang in got_alloc:
        assert got_alloc[lang] == want_alloc[lang], (lang, sizes)
        assert per_lang_rows[lang] == want_alloc[lang]
    # budget respected; epoch cap respected; (doc, epoch) rows unique
    b = sum(sizes.values()) * UNIMAX_BUDGET_X10 // 10
    assert sum(per_lang_rows.values()) <= b
    assert len({(r[0], r[3]) for r in out}) == len(out)
    # selection is the seeded-hash rank order: rank r docs sort by hash
    for lang in sizes:
        sel = sorted(
            (r for r in out if r[1] == lang and r[3] == 1),
            key=lambda r: r[2],
        )
        keys = [
            (_h8(f"{UNIMAX_SEED}{r[0]}"), r[0]) for r in sel
        ]
        assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# Paragraph dedup
# ---------------------------------------------------------------------------

def _para_python(docs: dict[int, list[str]]) -> dict[int, tuple[int, int]]:
    """Replica: inject first-2-segment copies of every 5th doc, segment
    by PARA_W, global keep-first in (doc_id, seg_idx) order."""
    corpus = dict(docs)
    for d, toks in docs.items():
        if d % 5 == 0 and toks:
            corpus[d + 200000] = toks[: 2 * PARA_W]
    seen: set[str] = set()
    out = {}
    for d in sorted(corpus):
        toks = corpus[d]
        if not toks:
            continue
        n_segs = math.ceil(len(toks) / PARA_W)
        removed = 0
        for i in range(n_segs):
            seg = " ".join(toks[i * PARA_W:(i + 1) * PARA_W])
            if seg in seen:
                removed += 1
            else:
                seen.add(seg)
        out[d] = (n_segs, removed)
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z"]),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_paragraph_dedup_matches_replica(tok_lists):
    # tiny alphabet => frequent natural segment collisions, the regime
    # where keep-first ordering actually matters
    docs = {i: t for i, t in enumerate(tok_lists)}
    con = duckdb.connect()
    con.execute("CREATE TABLE ptoks(doc_id BIGINT, toks VARCHAR[])")
    con.executemany(
        "INSERT INTO ptoks VALUES (?, ?)", list(docs.items())
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            paragraph_dedup_sql("duckdb", source="ptoks")
        ).fetchall()
    }
    assert got == _para_python(docs)


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abc ._@-0123456789",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pii_scrub_matches_python_re(texts):
    """The SQL patterns (Java regex on Spark, RE2 on DuckDB) and
    Python's re must agree on counts AND byte-exact redaction — the
    patterns were chosen (no backslash classes, no boundaries) so all
    three engines have identical semantics. Adversarial alphabet
    includes @ . - digits so near-miss PII shapes appear naturally."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    out = con.execute(pii_scrub_sql("duckdb")).fetchall()
    for doc_id, n_em, n_ip, n_ph, rlen, rhash in out:
        t = texts[doc_id]
        dirty = (
            f"{t} contact user{doc_id}@mail{doc_id % 7}.example.com"
            + (f" from 10.{doc_id % 200}.{doc_id % 250}.{doc_id % 25}"
               if doc_id % 3 == 0 else "")
            + (f" call 555-{1000 + doc_id % 9000}"
               if doc_id % 5 == 0 else "")
        )
        assert n_em == len(re.findall(PII_EMAIL_RE, dirty))
        assert n_ip == len(re.findall(PII_IP_RE, dirty))
        assert n_ph == len(re.findall(PII_PHONE_RE, dirty))
        red = re.sub(PII_EMAIL_RE, "<EMAIL>", dirty)
        red = re.sub(PII_IP_RE, "<IP>", red)
        red = re.sub(PII_PHONE_RE, "<PHONE>", red)
        assert rlen == len(red)
        assert rhash == hashlib.md5(red.encode()).hexdigest()


# ---------------------------------------------------------------------------
# BPE apply
# ---------------------------------------------------------------------------

def test_bpe_apply_matches_python(spark):
    """The Arrow-kernel apply runner must produce the corpus the
    Python training replica ends with (same merges, same greedy
    application) — counts and md5 of every doc's merged stream."""
    from tests.test_vocab import _bpe_python
    from kektordb_spark.operators.pipeline import BPE_ROUNDS, bpe_apply
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    rows = spark.table("docs_tok").select("doc_id", "toks").collect()
    docs = {r.doc_id: list(r.toks) for r in rows}

    corpus = {d: list(t) for d, t in docs.items()}
    from collections import Counter

    for _ in range(BPE_ROUNDS):
        cnt = Counter()
        for t in corpus.values():
            for a, b in zip(t, t[1:]):
                cnt[(a, b)] += 1
        (w1, w2), _c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for d, t in corpus.items():
            res, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == w1 and t[i + 1] == w2:
                    res.append(w1 + " " + w2)
                    i += 2
                else:
                    res.append(t[i])
                    i += 1
            corpus[d] = res

    got = {
        r.doc_id: (r.n_toks_before, r.n_toks_after, r.tok_hash)
        for r in bpe_apply(spark).collect()
    }
    assert set(got) == set(docs)
    for d in docs:
        merged = " ".join(corpus[d])
        assert got[d] == (
            len(docs[d]),
            len(corpus[d]),
            hashlib.md5(merged.encode()).hexdigest(),
        ), d


# ---------------------------------------------------------------------------
# Corpus stats (Zipf audit)
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(list("abcdefgh")),
            min_size=1,
            max_size=30,
        ),
        min_size=2,
        max_size=20,
    )
)
def test_corpus_stats_matches_replica(tok_lists):
    from collections import Counter

    from kektordb_spark.operators.pipeline import ZIPF_TOP_K, corpus_stats_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE ctoks(doc_id BIGINT, toks VARCHAR[])")
    con.executemany(
        "INSERT INTO ctoks VALUES (?, ?)", list(enumerate(tok_lists))
    )
    out = con.execute(corpus_stats_sql("duckdb", source="ctoks")).fetchall()

    cnt = Counter(t for toks in tok_lists for t in toks)
    n_tokens = sum(cnt.values())
    n_types = len(cnt)
    head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_K]
    # replica regression on the same integer grid
    n = len(head)
    sx = sum(round(math.log(rk) * 1e6) for rk in range(1, n + 1))
    sy = sum(round(math.log(c) * 1e6) for _, c in head)
    sxy = sum(
        round(math.log(rk) * math.log(c) * 1e12)
        for rk, (_, c) in enumerate(head, 1)
    )
    sxx = sum(round(math.log(rk) ** 2 * 1e12) for rk in range(1, n + 1))
    denom = n * (sxx / 1e12) - (sx / 1e6) ** 2
    # r5: single-type corpus -> nullif(denom, 0) -> NULL in BOTH
    # engines (Spark 4 ANSI raised on /0 before)
    slope = ((n * (sxy / 1e12) - (sx / 1e6) * (sy / 1e6)) / denom
             if denom else None)

    def grid6(x: float) -> float:
        # replica of the SQL floor micro-grid (tie-free, rule 7b)
        return math.floor(x * 1e6) / 1e6

    assert len(out) == n
    for rank, tok, freq, nt, ny, ttr, zs, hm in out:
        assert (tok, freq) == head[rank - 1]
        assert nt == n_tokens and ny == n_types
        assert ttr == grid6(n_types / n_tokens)
        if slope is None:
            assert zs is None
        else:
            assert zs == pytest.approx(round(slope, 6), abs=2e-6)
        assert hm == grid6(freq / n_tokens)


@given(
    st.lists(
        st.lists(st.sampled_from(list("abc")), min_size=0, max_size=30),
        min_size=1,
        max_size=15,
    )
)
@settings(deadline=None)
def test_substring_windows_matches_replica(tok_lists):
    """dedup_substring_windows vs a naive Python replica: sliding
    W-window hashes, corpus-wide occurrence >= 2 flags, per-doc
    counts + floor-grid fraction. 3-letter alphabet on short docs
    forces plenty of genuine window collisions."""
    from kektordb_spark.operators.dedup import SUBSTR_W, substring_windows_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE stoks(doc_id BIGINT, toks VARCHAR[])")
    con.executemany(
        "INSERT INTO stoks VALUES (?, ?)", list(enumerate(tok_lists))
    )
    out = con.execute(substring_windows_sql("duckdb", source="stoks")).fetchall()

    from collections import Counter
    occ = Counter()
    per_doc: dict[int, list[str]] = {}
    for d, toks in enumerate(tok_lists):
        wins = [
            " ".join(toks[i:i + SUBSTR_W])
            for i in range(len(toks) - SUBSTR_W + 1)
        ]
        if wins:
            per_doc[d] = wins
            occ.update(wins)
    want = []
    for d in sorted(per_doc):
        wins = per_doc[d]
        dup = sum(1 for w in wins if occ[w] >= 2)
        want.append((d, len(wins), dup, math.floor(dup / len(wins) * 1e6) / 1e6))
    assert out == want


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40)
)
@settings(deadline=None)
def test_length_histogram_matches_replica(lengths):
    """pipeline_length_histogram vs a Python replica: power-of-two
    buckets via binary-string length, token mass, floor-grid shares,
    shortest-first cumulative share. Exercises the exact-power
    boundaries (0, 1, 3, 7, ...) the ln-based bucket would flake on."""
    from kektordb_spark.operators.pipeline import length_histogram_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE ltoks(doc_id BIGINT, toks VARCHAR[])")
    con.executemany(
        "INSERT INTO ltoks VALUES (?, ?)",
        [(i, ["t"] * n) for i, n in enumerate(lengths)],
    )
    out = con.execute(length_histogram_sql("duckdb", source="ltoks")).fetchall()

    from collections import defaultdict
    buckets: dict[int, list[int]] = defaultdict(list)
    for n in lengths:
        buckets[(n + 1).bit_length() - 1].append(n)
    tot = sum(lengths)
    want, cum = [], 0
    for b in sorted(buckets):
        ns = buckets[b]
        mass = sum(ns)
        cum += mass
        want.append((
            b, min(ns), max(ns), len(ns), mass,
            math.floor(mass / tot * 1e6) / 1e6 if tot else None,
            math.floor(cum / tot * 1e6) / 1e6 if tot else None,
        ))
    assert out == want
