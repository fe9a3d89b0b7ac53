"""RAG layer: splitters (T5), stemmer (T1), ingestion with prev/next
links (S10), embedder UDF plumbing — the reference's pipeline tests
(pkg/rag/*_test.go) re-shaped for DataFrames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kektordb_spark.functions.stemmer import stem_tokens, stem_word
from kektordb_spark.sources import rag
from kektordb_spark.tables import load_tables
from tests.conftest import SF_SMALL


def test_split_recursive_bounds():
    text = ("para one with several words here.\n\n" * 5
            + "a much longer paragraph " * 20)
    chunks = rag.split_recursive(text, chunk_size=80, overlap=10)
    assert chunks, "no chunks"
    assert all(len(c) <= 80 for c in chunks), [len(c) for c in chunks]
    # every non-separator character is preserved somewhere
    joined = "".join(chunks)
    assert "para one" in joined and "longer paragraph" in joined


def test_split_fixed_overlap():
    text = "abcdefghij" * 10  # 100 chars
    chunks = rag.split_fixed(text, chunk_size=30, overlap=10)
    assert all(len(c) <= 30 for c in chunks)
    for a, b in zip(chunks, chunks[1:]):
        assert a[-10:] == b[:10]  # overlap carried


def test_stemmer_basics():
    cases = {
        "caresses": "caress", "ponies": "poni", "running": "run",
        "hopping": "hop", "relational": "relat", "happy": "happi",
        "agreed": "agre", "cats": "cat", "is": "is",
    }
    for w, want in cases.items():
        assert stem_word(w) == want, (w, stem_word(w), want)


def test_stem_tokens_udf(spark):
    df = spark.createDataFrame(
        [(["running", "cats", "windows"],), (["merged", "sorting"],)],
        "toks array<string>",
    )
    out = [r[0] for r in df.select(stem_tokens("toks")).collect()]
    # "merged" -> "merg" matches classic Porter behavior
    assert out == [["run", "cat", "window"], ["merg", "sort"]]


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_SMALL)["documents"].limit(50)


def test_chunking_and_links(spark, docs):
    chunks = rag.chunk_documents(docs, chunk_size=60, overlap=10)
    rows = chunks.collect()
    assert rows and all(len(r["chunk_text"]) <= 60 for r in rows)
    # chunk ids are doc#idx and indexes are dense per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_index"])
    assert all(sorted(v) == list(range(len(v))) for v in by_doc.values())

    edges = rag.chunk_link_edges(chunks, now=123).collect()
    nxt = [e for e in edges if e["rel"] == "next_chunk"]
    prv = [e for e in edges if e["rel"] == "prev_chunk"]
    # one next edge per adjacent pair, mirrored by prev
    n_pairs = sum(max(0, len(v) - 1) for v in by_doc.values())
    assert len(nxt) == len(prv) == n_pairs
    assert {(e["src"], e["dst"]) for e in prv} == {(e["dst"], e["src"]) for e in nxt}


def test_ingest_pipeline(spark, docs):
    vectors, edges = rag.ingest(docs, now=7)
    vrows = vectors.collect()
    assert all(len(r["v"]) == rag.EMBED_DIM for r in vrows)
    # deterministic embedder: same text -> same vector
    v2 = {r["id"]: r["v"] for r in vectors.collect()}
    assert all(v2[r["id"]] == r["v"] for r in vrows)
    assert edges.where(F.col("created_at") == 7).count() == edges.count()
