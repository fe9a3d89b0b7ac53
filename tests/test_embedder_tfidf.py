"""Corpus-fitted hashed TF-IDF local encoder
(functions/embedder_tfidf.py): fit determinism, idf semantics (rare
tokens outweigh common ones), retrieval sanity through the seam, and
the distributed ingest path."""

from __future__ import annotations

import math

from kektordb_spark.functions import embedder as E
from kektordb_spark.functions.embedder_tfidf import (
    N_BUCKETS, TfidfEmbedder, fit_tfidf_embedder)
from kektordb_spark.tables import load_tables
from tests.conftest import SF_SMALL


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb) if na and nb else 0.0


def test_fit_is_deterministic(spark):
    load_tables(spark, SF_SMALL)
    e1 = fit_tfidf_embedder(spark)
    e2 = fit_tfidf_embedder(spark)
    assert list(e1._idf) == list(e2._idf)
    assert e1.embed_batch(["alpha beta"]) == e2.embed_batch(["alpha beta"])


def test_idf_weights_rare_tokens_higher(spark):
    """A query sharing one RARE token with doc A and one CORPUS-COMMON
    token with doc B must rank A above B — the learned-idf behavior a
    stateless hash encoder cannot produce."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(50)]
        + [(100, "zymurgy treatise the quick"),     # rare token: zymurgy
           (101, "the quick brown fox")],           # common tokens only
        "doc_id long, text string")
    docs.createOrReplaceTempView("_tfidf_docs")
    emb = fit_tfidf_embedder(spark, source="_tfidf_docs")
    q, a, b = emb.embed_batch([
        "zymurgy the quick",
        "zymurgy treatise the quick",
        "the quick brown fox",
    ])
    assert _cos(q, a) > _cos(q, b)


def test_none_passthrough_and_unit_norm(spark):
    load_tables(spark, SF_SMALL)
    emb = fit_tfidf_embedder(spark)
    got = emb.embed_batch(["alpha beta gamma", None, ""])
    assert got[1] is None
    assert len(got[0]) == emb.dim
    assert abs(math.sqrt(sum(x * x for x in got[0])) - 1.0) < 1e-12
    # empty text: zero vector (no tokens), stays all-zero, not NaN
    assert all(x == 0.0 for x in got[2])


def test_retrieval_through_seam_and_ingest(spark, tmp_path):
    """fit -> set_embedder -> ingest_directory -> vsearch: the top hit
    for a topical query is the topically-matching file, ranked in the
    FITTED encoder's space (the local-encoder analog of the HTTP
    roundtrip test)."""
    from kektordb_spark import api
    from kektordb_spark.sources import loaders as L

    load_tables(spark, SF_SMALL)
    emb = fit_tfidf_embedder(spark)
    (tmp_path / "sorting.txt").write_text(
        "merge sort and quick sort are comparison sorting algorithms")
    (tmp_path / "garden.txt").write_text(
        "tomato plants need watering in dry spring weather gardens")
    try:
        E.set_embedder(emb)
        vectors, _, failures = L.ingest_directory(
            spark, str(tmp_path), now=100, chunk_size=500)
        assert failures.collect() == []
        rows = vectors.collect()
        assert len(rows) == 2 and all(len(r["v"]) == emb.dim for r in rows)
        idx = api.vcreate(spark, "tfidf_ix", text_fields=("chunk_text",))
        idx = api.vadd_batch(idx, [
            {"id": r["id"], "vector": list(r["v"]),
             "meta": {"chunk_text": r["chunk_text"]}} for r in rows
        ], now=100)
        qv = emb.embed_batch(["sorting algorithms comparison"])[0]
        got = api.vsearch(idx, query=qv, k=1).collect()
        assert got and got[0]["id"].endswith("sorting.txt#0")
    finally:
        E.set_embedder(E.HashEmbedder())


def test_rejects_wrong_idf_width():
    import pytest

    with pytest.raises(ValueError, match=str(N_BUCKETS)):
        TfidfEmbedder([1.0] * 10)
