"""Property-based invariants of the T5 chunk splitters
(kektordb_spark/sources/rag.py; reference pkg/rag/splitter.go).

The recursive splitter is deliberately the public LangChain-family
algorithm (the reference's own merge/overlap handling is a simplified
variant with TODOs), so instead of a line-for-line pin these tests
assert the invariants BOTH implementations promise:

  * fixed: chunk i is exactly text[i*step : i*step + size] — perfect
    reconstruction, overlap included;
  * recursive: every chunk is a contiguous substring of the input
    (merging only rejoins parts with the separator that was split on,
    and overlap tails are suffixes of the previous chunk);
  * recursive: no content is lost — the input's non-whitespace
    characters are a subsequence of the concatenated chunks' (chunk
    boundaries may eat separators, overlap may duplicate);
  * recursive: with the default separators (ending in "") every chunk
    respects chunk_size.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kektordb_spark.sources.rag import split_fixed, split_recursive

_text = st.lists(
    st.sampled_from(list("ab \n") + ["\n\n"]), max_size=300
).map("".join)


@settings(max_examples=150, deadline=None)
@given(text=_text, size=st.integers(5, 60), overlap=st.integers(0, 4))
def test_fixed_chunks_reconstruct_exactly(text, size, overlap):
    step = max(1, size - overlap)
    chunks = split_fixed(text, size, overlap)
    assert len(chunks) == (0 if not text else (len(text) + step - 1) // step)
    for i, c in enumerate(chunks):
        assert c == text[i * step: i * step + size]


def _is_subsequence(needle: str, hay: str) -> bool:
    it = iter(hay)
    return all(ch in it for ch in needle)


@settings(max_examples=150, deadline=None)
@given(text=_text, size=st.integers(5, 60), overlap=st.integers(0, 4))
def test_recursive_chunks_are_substrings_and_lose_nothing(text, size, overlap):
    chunks = split_recursive(text, size, overlap)
    for c in chunks:
        assert c.strip()              # no empty/whitespace-only chunks
        assert len(c) <= size         # "" fallback bounds every chunk
        assert c in text              # contiguous substring of the input
    joined = "".join(chunks)
    assert _is_subsequence(
        "".join(text.split()), "".join(joined.split())
    )
