"""The embedder seam (functions/embedder.py): default hash projection,
set_embedder swap through ingest, batch slicing, and the reference's
dimension-drift rejection (ops.go:338-347)."""

from __future__ import annotations

import pytest

from kektordb_spark.functions import embedder as E


@pytest.fixture(autouse=True)
def _restore_default():
    yield
    E.set_embedder(E.HashEmbedder())


# NOTE: the fake embedders are defined INSIDE a factory so cloudpickle
# serializes them by value to executors (a top-level test-module class
# would be pickled by reference and fail to import worker-side).
def make_const_embedder(dim=4, batch_size=2):
    class ConstEmbedder(E.Embedder):
        """Fake non-hash encoder: records its batch sizes."""

        def __init__(self):
            self.dim = dim
            self.batch_size = batch_size
            self.batches: list[int] = []

        def embed_batch(self, texts):
            self.batches.append(len(texts))
            return [
                None if t is None else [float(len(t)), 1.0, 2.0, 3.0][: self.dim]
                for t in texts
            ]

    return ConstEmbedder()


def make_drifting_embedder():
    class DriftingEmbedder(E.Embedder):
        """Claims dim 16, produces dim 3 — the mid-session model swap
        the reference rejects (ops.go:338-347)."""

        dim = 16

        def embed_batch(self, texts):
            return [[1.0, 2.0, 3.0] for _ in texts]

    return DriftingEmbedder()


def test_default_is_oracle_hash():
    got = E.get_embedder().embed_batch(["merge sort"])
    import hashlib

    digest = hashlib.sha256(b"merge sort").digest()
    assert got[0] == [digest[i] / 255.0 - 0.5 for i in range(E.DEFAULT_DIM)]


def test_swap_through_ingest(spark):
    """set_embedder flows through rag.ingest: vectors come out with
    the NEW encoder's dim; restoring the default restores the hash."""
    from kektordb_spark.sources import rag

    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma delta epsilon zeta")],
        "doc_id string, text string",
    )
    fake = make_const_embedder()
    E.set_embedder(fake)
    vectors, _ = rag.ingest(docs, chunk_size=20, overlap=0)
    rows = vectors.collect()
    assert rows and all(len(r["v"]) == 4 for r in rows)
    E.set_embedder(E.HashEmbedder())
    vectors2, _ = rag.ingest(docs, chunk_size=20, overlap=0)
    assert all(len(r["v"]) == E.DEFAULT_DIM for r in vectors2.collect())


def test_batch_size_respected():
    emb = make_const_embedder(batch_size=2)
    E.set_embedder(emb)
    udf_holder = E.embedding_udf()
    # drive the inner function directly through a pandas Series
    import pandas as pd

    inner = udf_holder.func
    out = inner(pd.Series(["a", "bb", "ccc", "dddd", "eeeee"]))
    assert list(map(len, out.dropna())) == [4] * 5
    assert emb.batches == [2, 2, 1]


def test_dimension_drift_raises(spark):
    """ops.go:338-347: a vector whose width differs from the declared
    dim aborts with the 'embedder model has changed' diagnosis."""
    from kektordb_spark.sources import rag

    E.set_embedder(make_drifting_embedder())
    docs = spark.createDataFrame([("d1", "some text")], "doc_id string, text string")
    vectors, _ = rag.ingest(docs, chunk_size=50)
    with pytest.raises(Exception, match="dimension mismatch|model has changed"):
        vectors.collect()


def test_set_embedder_type_checked():
    with pytest.raises(TypeError):
        E.set_embedder(object())
