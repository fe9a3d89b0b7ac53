"""Property-based pin of the T4 context compressor against a Python
transcription of the reference's Go
(pkg/textanalyzer/compressor.go: smartTokenize + isStopWord —
safe-stopword removal that never touches negations/logical operators,
drops punctuation, preserves case, joins with single spaces;
CompressionRatio = (orig - kept) / orig tokens).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from kektordb_spark.functions.textquality import (
    ENGLISH_REMOVABLE,
    ITALIAN_REMOVABLE,
    compress_context_sql,
)

_EN = set(ENGLISH_REMOVABLE)
_IT = set(ITALIAN_REMOVABLE)


def smart_tokenize(text: str) -> list[str]:
    toks, cur = [], []
    for ch in text:
        if ch.isalnum() or ch in "'-":
            cur.append(ch)
        else:
            if cur:
                toks.append("".join(cur))
                cur = []
    if cur:
        toks.append("".join(cur))
    return toks


def ref_compress(text: str, lang: str) -> tuple[str, int, int]:
    removable = _IT if lang in ("it", "italian") else _EN
    toks = smart_tokenize(text)
    kept = [t for t in toks if t.lower() not in removable]
    return " ".join(kept), len(toks), len(kept)


_word = st.sampled_from(
    ["The", "the", "a", "an", "not", "And", "cat", "sat", "on", "mat",
     "don't", "state-of-the-art", "IS", "was", "il", "non", "della", "E"]
)
_sep = st.sampled_from([" ", ", ", ". ", "  ", "; ", "! ", "\n"])


@st.composite
def _text(draw):
    words = draw(st.lists(_word, max_size=12))
    seps = [draw(_sep) for _ in words]
    return "".join(w + s for w, s in zip(words, seps))


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(_text(), min_size=1, max_size=6),
    langs=st.lists(st.sampled_from(["en", "it", "de", "zh"]), min_size=6, max_size=6),
)
def test_compressor_matches_go_reference(texts, langs) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, t, langs[i % len(langs)]) for i, t in enumerate(texts)],
    )
    rows = con.execute(compress_context_sql("duckdb")).fetchall()
    assert len(rows) == len(texts)
    for doc_id, compressed, n_orig, n_kept, reduction in rows:
        want_text, want_orig, want_kept = ref_compress(
            texts[doc_id], langs[doc_id % len(langs)]
        )
        # the SQL tokenizer is the ASCII class [A-Za-z0-9'-]; the Go
        # uses unicode isalnum — restrict the comparison accordingly
        assert compressed == want_text
        assert (n_orig, n_kept) == (want_orig, want_kept)
        want_red = 0.0 if want_orig == 0 else round(1.0 - want_kept / want_orig, 6)
        assert reduction == pytest.approx(want_red, abs=1e-6)
