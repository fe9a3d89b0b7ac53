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


def make_letter_embedder(dim=6, batch_size=2):
    """Fake 'real' encoder — letter-frequency projection, nothing like
    the hash default, defined in a factory for by-value pickling."""

    class LetterEmbedder(E.Embedder):
        def __init__(self):
            self.dim = dim
            self.batch_size = batch_size

        def embed_batch(self, texts):
            keys = "amerst"[:self.dim]
            out = []
            for t in texts:
                if t is None:
                    out.append(None)
                    continue
                low = t.lower()
                n = max(len(low), 1)
                out.append([low.count(c) / n for c in keys])
            return out

    return LetterEmbedder()


def test_real_encoder_swap_end_to_end(spark, tmp_path):
    """The documented swap-in recipe (COVERAGE §2.10): install a
    non-hash encoder, run ingest_directory over real files, build an
    Index from the chunk vectors, and drive api.vsearch hybrid search
    with a query embedded by the SAME encoder. The top hit must equal
    the brute-force cosine argmax computed independently here —
    i.e. the engine searched in the NEW encoder's space, not the hash
    default's."""
    import math

    from kektordb_spark import api
    from kektordb_spark.sources import loaders as L

    (tmp_path / "sorting.txt").write_text(
        "merge sort and quick sort are comparison sorting algorithms"
    )
    (tmp_path / "garden.txt").write_text(
        "tomato plants need watering in dry spring weather gardens"
    )
    fake = make_letter_embedder(dim=6, batch_size=2)
    E.set_embedder(fake)
    vectors, edges, failures = L.ingest_directory(
        spark, str(tmp_path), now=100, chunk_size=500,
    )
    assert failures.collect() == []
    rows = vectors.collect()
    assert len(rows) == 2 and all(len(r["v"]) == 6 for r in rows)

    idx = api.vcreate(spark, "swap_ix", text_fields=("chunk_text",))
    idx = api.vadd_batch(idx, [
        {"id": r["id"], "vector": list(r["v"]),
         "meta": {"chunk_text": r["chunk_text"]}}
        for r in rows
    ], now=100)

    qv = fake.embed_batch(["merge sort algorithm"])[0]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(x * x for x in b)))

    want = max(rows, key=lambda r: cos(qv, list(r["v"])))["id"]
    got = api.vsearch(idx, query=qv, k=1, query_text="merge sort").collect()
    assert got and got[0]["id"] == want


def test_drifting_encoder_rejected_through_ingest_directory(spark, tmp_path):
    """A mid-session model swap that changes output width fails the
    ingest job with the reference's diagnosis (ops.go:338-347) — also
    through the directory pipeline, not just rag.ingest."""
    from kektordb_spark.sources import loaders as L

    (tmp_path / "a.txt").write_text("some text to embed")
    E.set_embedder(make_drifting_embedder())
    vectors, _, _ = L.ingest_directory(spark, str(tmp_path), now=100)
    with pytest.raises(Exception, match="dimension mismatch|model has changed"):
        vectors.collect()


def test_http_embedder_against_local_endpoint(spark):
    """The HTTP adapter (functions/embedder_http.py — the reference's
    Ollama-shaped remote encoder, pkg/embeddings/ollama.go) against a
    real in-process HTTP server: batched request/response wire shape,
    None passthrough, install via set_embedder, and encode through the
    distributed ingest path."""
    import http.server
    import json
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            embs = [
                None if t is None else [float(len(t)), 7.0, 7.0]
                for t in req["texts"]
            ]
            out = json.dumps({"embeddings": embs}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        from kektordb_spark.functions.embedder_http import HttpEmbedder
        from kektordb_spark.sources import rag

        emb = HttpEmbedder(f"http://127.0.0.1:{port}/embed", dim=3,
                           model="test-model", batch_size=2)
        # direct contract: None maps to None, widths converted
        got = emb.embed_batch(["ab", None, "xyz"])
        assert got == [[2.0, 7.0, 7.0], None, [3.0, 7.0, 7.0]]

        # through the seam + distributed ingest (local executor threads
        # reach the same loopback endpoint — on a cluster this is the
        # workers-must-reach-the-endpoint requirement the docstring
        # states)
        E.set_embedder(emb)
        docs = spark.createDataFrame(
            [("d1", "alpha beta gamma"), ("d2", "delta")],
            "doc_id string, text string")
        vectors, _ = rag.ingest(docs, chunk_size=100)
        rows = {r["id"]: list(r["v"]) for r in vectors.collect()}
        assert all(len(v) == 3 and v[1:] == [7.0, 7.0] for v in rows.values())
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_embedder_error_paths():
    """Endpoint down / ragged response fail loudly (never partial
    vectors into the index)."""
    import http.server
    import json
    import threading

    from kektordb_spark.functions.embedder_http import HttpEmbedder

    down = HttpEmbedder("http://127.0.0.1:9/none", dim=3, timeout=0.5)
    with pytest.raises(RuntimeError, match="request failed"):
        down.embed_batch(["x"])

    class RaggedHandler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            out = json.dumps({"embeddings": [[1.0]]}).encode()  # 1 for 2
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RaggedHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        emb = HttpEmbedder(
            f"http://127.0.0.1:{srv.server_address[1]}/e", dim=3)
        with pytest.raises(RuntimeError, match="vectors for 2 texts"):
            emb.embed_batch(["a", "b"])
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_embedder_ingest_directory_vsearch_roundtrip(spark, tmp_path):
    """r6: the full operational loop against a real localhost endpoint —
    install the HTTP encoder, ingest a DIRECTORY of files, build an
    Index, and answer vsearch(query_text=...) in the remote encoder's
    space. Along the way the server records every request, asserting
    the UDF's batch SLICING (no request exceeds batch_size) and the
    wire-level null position-preservation; a second endpoint that
    starts answering with a different width must fail the ingest with
    the reference's model-changed diagnosis (dim-drift rejection)."""
    import http.server
    import json
    import math
    import threading

    from kektordb_spark import api
    from kektordb_spark.functions.embedder_http import HttpEmbedder
    from kektordb_spark.sources import loaders as L

    seen_batches = []

    def letter_vec(t):
        low = t.lower()
        n = max(len(low), 1)
        return [low.count(c) / n for c in "aeiost"]

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            seen_batches.append(req["texts"])
            embs = [None if t is None else letter_vec(t)
                    for t in req["texts"]]
            out = json.dumps({"embeddings": embs}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        emb = HttpEmbedder(
            f"http://127.0.0.1:{srv.server_address[1]}/embed",
            dim=6, model="letters", batch_size=2)
        E.set_embedder(emb)

        # wire-level null position-preservation through the adapter
        assert emb.embed_batch(["ab", None, "ee"]) == [
            letter_vec("ab"), None, letter_vec("ee")]
        # slicing is the UDF's job (functions/embedder.py), not the
        # adapter's — only count requests made by the ingest below
        seen_batches.clear()

        (tmp_path / "sorting.txt").write_text(
            "merge sort and quick sort are comparison sorting algorithms")
        (tmp_path / "garden.txt").write_text(
            "tomato plants need watering in dry spring weather gardens")
        (tmp_path / "oceans.txt").write_text(
            "tides rise as oceans answer the moon in seasonal rhythm")
        vectors, edges, failures = L.ingest_directory(
            spark, str(tmp_path), now=100, chunk_size=500)
        assert failures.collect() == []
        rows = vectors.collect()
        assert len(rows) == 3 and all(len(r["v"]) == 6 for r in rows)
        # batch slicing: every request the server saw respected
        # batch_size, and the ingest went over the wire at all
        assert seen_batches and all(len(b) <= 2 for b in seen_batches)

        idx = api.vcreate(spark, "http_rt_ix", text_fields=("chunk_text",))
        idx = api.vadd_batch(idx, [
            {"id": r["id"], "vector": list(r["v"]),
             "meta": {"chunk_text": r["chunk_text"]}}
            for r in rows
        ], now=100)
        qv = emb.embed_batch(["merge sort algorithm"])[0]

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return num / (math.sqrt(sum(x * x for x in a))
                          * math.sqrt(sum(x * x for x in b)) or 1.0)

        want = max(rows, key=lambda r: cos(qv, list(r["v"])))["id"]
        got = api.vsearch(idx, query=qv, k=1,
                          query_text="merge sort").collect()
        assert got and got[0]["id"] == want

        # dim drift through the HTTP path: same directory pipeline, an
        # adapter now producing 4-wide vectors for an index expecting 6
        class Narrow(HttpEmbedder):
            def embed_batch(self, texts):
                return [None if v is None else v[:4]
                        for v in super().embed_batch(texts)]

        E.set_embedder(Narrow(
            f"http://127.0.0.1:{srv.server_address[1]}/embed",
            dim=6, model="letters", batch_size=2))
        vectors, _, _ = L.ingest_directory(spark, str(tmp_path), now=100)
        with pytest.raises(
                Exception, match="dimension mismatch|model has changed"):
            vectors.collect()
    finally:
        srv.shutdown()
        srv.server_close()
        E.set_embedder(E.HashEmbedder())
