"""S12 f16 compression: the Spark pandas-UDF quantizer and the f16 k-NN
query must match a pure-numpy reference bit-for-bit (the reference's
float16 path is IEEE binary16 encode/decode, hnsw_index.go:187-213 +
distance_go.go:56-68 — numpy's astype(float16) is the same rounding)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_MED


def _numpy_f16_topk(sf_dir: str, k: int = 10, n_queries: int = 5):
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.asarray(tab["vec_id"])
    vecs = np.asarray(tab["embedding"], dtype=np.float64)
    v16 = vecs.astype(np.float16).astype(np.float64)
    out = {}
    qmask = ids < n_queries
    for qid, qv in zip(ids[qmask], v16[qmask]):
        cmask = ids >= n_queries
        d = ((v16[cmask] - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids[cmask], d))[:k]
        out[int(qid)] = [
            (int(ids[cmask][i]), round(float(d[i]), 6)) for i in order
        ]
    return out


def test_quantize_f16_roundtrip(spark):
    from pyspark.sql import functions as F

    from kektordb_spark.functions.vector import quantize_f16

    df = spark.read.parquet(f"{SF_MED}/embeddings.parquet").limit(50)
    got = {
        r.vec_id: r.q
        for r in df.select(
            "vec_id", quantize_f16(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias("q")
        ).collect()
    }
    raw = {r.vec_id: r.embedding for r in df.collect()}
    for vid, v in raw.items():
        expect = np.asarray(v, dtype=np.float64).astype(np.float16).astype(np.float64)
        assert got[vid] == expect.tolist(), f"f16 mismatch for vec {vid}"


def test_knn_f16_matches_numpy(spark):
    import kektordb_spark.plans.registry as R

    res = R.queries()["knn_f16_top10"](spark, SF_MED).collect()
    expect = _numpy_f16_topk(SF_MED)
    got: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.dist))
    assert set(got) == set(expect)
    for qid in expect:
        assert got[qid] == expect[qid], f"query {qid}: {got[qid]} != {expect[qid]}"
