"""The ``Embedder`` extension point — the engine's single seam for
text-to-vector encoding (SURVEY.md §2.10), mirroring the Brain seam
(functions/brain.py) so a real encoder overrides ONE class, not every
ingest/search call site.

The reference ships pluggable embedders behind a factory
(pkg/embeddings SelectEmbedder: Ollama HTTP, local ONNX via
native/compute/src/embedder.rs; DOCUMENTATION.md:216-219) and guards
every add against dimension drift when the model changes mid-session
(ops.go:338-347: a vector whose length differs from the index's
dimension is rejected with a "model has changed" error, never stored).
This module names that contract for the Spark engine:

  * :class:`Embedder` — batch-shaped interface: ``embed_batch`` takes
    a list of texts, returns one ``list[float]`` of exactly ``dim``
    floats per text (or None for None/empty input). ``batch_size``
    bounds how many texts one model call sees — the UDF slices each
    Arrow batch accordingly, so a remote/ONNX encoder controls its own
    request size regardless of Spark's Arrow batch sizing.
  * :class:`HashEmbedder` — the default: the deterministic sha256
    projection (identical bytes to ``sources.rag.embed_sql``), which
    keeps every embedding-dependent query oracle-checkable in DuckDB.
  * :func:`set_embedder` / :func:`get_embedder` — process-wide
    registry; UDFs resolve the embedder lazily at construction time.
  * :func:`embedding_udf` — the Arrow-batched pandas UDF every call
    site uses (rag.ingest, search_query_text). It validates EVERY
    returned vector's dimension against ``embedder.dim`` and raises
    the reference's dimension-mismatch error on drift — an embedder
    that silently changed output width fails the job instead of
    corrupting the index.

Swapping in a real encoder changes only provenance: the plan shape
(mapInArrow batch → array<float> column) is identical, but the DuckDB
oracle for the DEFAULT hash embedder no longer applies — the same
determinism caveat as a non-default Brain.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 16  # == sources.rag.EMBED_DIM (one constant, re-exported there)


class Embedder:
    """Batch-shaped encoder contract (reference pkg/embeddings
    Embedder interface: Embed(texts) -> [][]float32)."""

    #: output vector width; every returned vector MUST have this length
    dim: int = DEFAULT_DIM
    #: max texts per embed_batch call (model/request sizing, NOT Spark
    #: partitioning — the UDF slices Arrow batches down to this)
    batch_size: int = 256

    def embed_batch(self, texts: list[str | None]) -> list[list[float] | None]:
        raise NotImplementedError


class HashEmbedder(Embedder):
    """Deterministic sha256 byte projection — the oracle-checkable
    default (bit-identical to the SQL form in sources.rag.embed_sql,
    test-pinned by the ``search_query_text`` parity query)."""

    def __init__(self, dim: int = DEFAULT_DIM):
        if not 1 <= dim <= 32:
            raise ValueError("HashEmbedder dim must be in 1..32 (sha256 bytes)")
        self.dim = dim

    def embed_batch(self, texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            digest = hashlib.sha256(t.encode()).digest()
            out.append([digest[i] / 255.0 - 0.5 for i in range(self.dim)])
        return out


_embedder: Embedder = HashEmbedder()


def set_embedder(embedder: Embedder) -> None:
    """Install a process-wide embedder (the SelectEmbedder moment).
    Affects UDFs built AFTER the call — existing DataFrames keep the
    encoder they were planned with (captured at udf construction)."""
    global _embedder
    if not isinstance(embedder, Embedder):
        raise TypeError("set_embedder expects an Embedder instance")
    _embedder = embedder


def get_embedder() -> Embedder:
    return _embedder


def embedding_udf():
    """Arrow-batched encode UDF bound to the CURRENT embedder.

    Per-slice dimension validation (ops.go:338-347 semantics): any
    vector whose length differs from ``embedder.dim`` aborts the job
    with the reference's "embedder model has changed" diagnosis."""
    emb = get_embedder()
    dim, bs = emb.dim, max(1, emb.batch_size)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts):
        import pandas as pd

        vals = list(texts)
        out: list[list[float] | None] = []
        for i in range(0, len(vals), bs):
            got = emb.embed_batch(vals[i : i + bs])
            if len(got) != len(vals[i : i + bs]):
                raise ValueError(
                    f"embedder returned {len(got)} vectors for "
                    f"{len(vals[i:i + bs])} texts"
                )
            for v in got:
                if v is not None and len(v) != dim:
                    raise ValueError(
                        f"vector dimension mismatch: index expects {dim}-dim "
                        f"vectors (current embedder produces {len(v)}-dim). "
                        "The embedder model has changed; re-embed the corpus "
                        "or restore the original encoder."
                    )
                out.append(v)
        return pd.Series(out)

    return _embed
