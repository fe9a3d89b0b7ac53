"""Corpus-fitted LOCAL encoder: hashed TF-IDF with signed feature
hashing — the in-process analog of the reference's native embedder
(native/compute/src/embedder.rs selects a local model behind the same
Embedder seam; select.go:82-130 is the factory). A transformer runtime
is not available in this environment, so the local encoder is the
classic hashing-trick text encoder (Weinberger et al., "Feature
Hashing for Large Scale Multitask Learning", ICML'09; the fastText
bag-of-hashed-features shape): a REAL fit/serve split with learned
state, unlike the stateless HashEmbedder default.

  FIT (distributed, one DataFrame job): document frequencies over
  HASHED token buckets (md5(token) % N_BUCKETS — vocabulary-free, so
  the state is a fixed N_BUCKETS float array however large the corpus
  is) -> smoothed idf = ln((N+1)/(df+1)) + 1. The idf array is the
  model: 4096 floats, broadcastable to every executor inside the
  pickled UDF closure.

  EMBED (per text, numpy-vectorized): analyzer-tokenize (the same
  [a-z0-9_]+ lowercase rule the engine's text layer uses), tf per
  bucket, tf*idf, then signed second-level hashing 4096 -> dim
  (deterministic per-bucket target slot + sign, precomputed at fit),
  L2-normalized. Cosine between outputs is a real lexical-topical
  similarity, so vsearch over these vectors ranks by shared vocabulary
  weighted by corpus rarity — an honest retrieval signal, not a
  fingerprint.

Determinism: fit is a deterministic aggregation; hashing is md5-based;
two fits on the same corpus produce bit-identical encoders (pinned in
tests/test_embedder_tfidf.py). Like every Embedder, dimension drift is
rejected by the seam's width gate (functions/embedder.py
embedding_udf), and ingest slices Arrow batches to batch_size.
"""

from __future__ import annotations

import hashlib
import math
import re

from kektordb_spark.functions.embedder import Embedder

N_BUCKETS = 4096
TFIDF_DIM = 64
_TOKEN_RE = re.compile(r"[a-z0-9_]+")


def _bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % N_BUCKETS


class TfidfEmbedder(Embedder):
    """Hashed TF-IDF encoder; build with :func:`fit_tfidf_embedder`
    (or pass a precomputed idf list of length N_BUCKETS)."""

    def __init__(self, idf: list[float], dim: int = TFIDF_DIM,
                 batch_size: int = 256):
        if len(idf) != N_BUCKETS:
            raise ValueError(
                f"idf must have {N_BUCKETS} entries, got {len(idf)}")
        import numpy as np

        self.dim = dim
        self.batch_size = batch_size
        self._idf = np.asarray(idf, dtype=np.float64)
        # deterministic second-level hashing: target slot + sign per
        # bucket, derived from md5 of the bucket id (precomputed once,
        # ships inside the pickle with the idf array)
        slots, signs = [], []
        for b in range(N_BUCKETS):
            h = hashlib.md5(f"slot:{b}".encode()).hexdigest()
            slots.append(int(h[:8], 16) % dim)
            signs.append(1.0 if int(h[8], 16) % 2 == 0 else -1.0)
        self._slots = np.asarray(slots, dtype=np.int64)
        self._signs = np.asarray(signs, dtype=np.float64)

    def embed_batch(self, texts):
        import numpy as np

        out: list[list[float] | None] = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            tf = np.zeros(N_BUCKETS, dtype=np.float64)
            for tok in _TOKEN_RE.findall(t.lower()):
                tf[_bucket(tok)] += 1.0
            w = tf * self._idf
            v = np.zeros(self.dim, dtype=np.float64)
            np.add.at(v, self._slots, w * self._signs)
            n = math.sqrt(float(v @ v))
            if n > 0.0:
                v = v / n
            out.append([float(x) for x in v])
        return out


def fit_tfidf_embedder(spark, source: str = "documents",
                       text_col: str = "text",
                       dim: int = TFIDF_DIM) -> TfidfEmbedder:
    """Fit the idf table with one distributed aggregation over
    ``source``: tokens explode, per-doc-distinct buckets count into df,
    the N_BUCKETS-row result collects to the driver (32 KB — the
    'model'). The fit is the ingest-time BUILD of this encoder, the
    same build/serve split as the IVF/LSH/graph index layers."""
    df_rows = spark.sql(f"""
        SELECT b, count(*) AS df FROM (
          SELECT DISTINCT doc_id,
                 CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT)
                   % {N_BUCKETS} AS b
          FROM (
            SELECT doc_id, explode(regexp_extract_all(lower({text_col}),
                                   '[a-z0-9_]+', 0)) AS tok
            FROM {source}
          ) t
        ) x GROUP BY b
    """).collect()
    n_docs = spark.table(source).count()
    idf = [math.log((n_docs + 1.0) / 1.0) + 1.0] * N_BUCKETS
    for r in df_rows:
        idf[r["b"]] = math.log((n_docs + 1.0) / (r["df"] + 1.0)) + 1.0
    return TfidfEmbedder(idf, dim=dim)
