"""HTTP embedder adapter — the concrete "real encoder" example for the
Embedder seam (functions/embedder.py), stdlib-only.

The reference selects pluggable encoders behind a factory
(pkg/embeddings/select.go:82-130: Ollama HTTP, Gemini/OpenAI HTTP,
local ONNX) and its HTTP embedders POST JSON and read an embedding
array back (pkg/embeddings/ollama.go:30-58). This adapter is that
contract for the Spark engine: one class, installed with
``set_embedder``, and every ingest/search call site (rag.ingest,
ingest_directory, search paths) encodes through it — the plan shape
(Arrow-batched pandas UDF -> array<float> column) is identical to the
hash default, only provenance changes.

Executor-side reality at scale: the adapter is pickled into the UDF,
so EVERY EXECUTOR opens its own connections to the endpoint —
``batch_size`` is the request-sizing knob (the UDF slices each Arrow
batch down to it, functions/embedder.py:107-131), and the endpoint
must be reachable from the workers, not just the driver. Failures
raise (job fails loudly) rather than emitting partial vectors; the
dimension validation in embedding_udf rejects a drifting remote model
exactly as ops.go:338-347 rejects a changed local one.

Request/response wire shape (a deliberately minimal superset of the
reference's Ollama contract — single prompt in, array out — batched):

    POST {url}    {"model": <model>, "texts": [<str or null>, ...]}
    200           {"embeddings": [[f, ...] or null, ...]}

A null text maps to a null embedding (position-preserving), matching
Embedder.embed_batch's None-for-None contract.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from kektordb_spark.functions.embedder import Embedder


class HttpEmbedder(Embedder):
    """Remote HTTP encoder (reference OllamaEmbedder shape, batched)."""

    def __init__(self, url: str, dim: int, model: str = "",
                 batch_size: int = 64, timeout: float = 60.0):
        if dim < 1:
            raise ValueError("HttpEmbedder dim must be >= 1")
        self.url = url
        self.dim = dim
        self.model = model
        self.batch_size = max(1, batch_size)
        self.timeout = timeout if timeout > 0 else 60.0

    def embed_batch(self, texts):
        payload = json.dumps(
            {"model": self.model, "texts": list(texts)}
        ).encode("utf-8")
        req = urllib.request.Request(
            self.url, data=payload,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if resp.status != 200:
                    raise RuntimeError(
                        f"embedding endpoint returned status {resp.status}")
                body = json.load(resp)
        except urllib.error.URLError as exc:
            raise RuntimeError(
                f"embedding request failed ({self.url}): {exc}") from exc
        embs = body.get("embeddings")
        if not isinstance(embs, list) or len(embs) != len(texts):
            raise RuntimeError(
                f"embedding endpoint returned {len(embs) if isinstance(embs, list) else 'non-list'} "
                f"vectors for {len(texts)} texts")
        # Width validation happens again in embedding_udf (the seam's
        # drift gate); converting eagerly here surfaces ragged JSON
        # with the endpoint's name attached.
        return [None if e is None else [float(x) for x in e] for e in embs]
