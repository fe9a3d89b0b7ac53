"""Product quantization: the Spark DataFrame pipeline (train / encode /
ADC search) must match a pure-numpy replica bit-for-bit, and the
approximate top-k must overlap exact brute force (recall gate, same
strategy as the reference's stress_test_recall.py)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_MED

M, K, ITERS, DIM = 8, 16, 3, 64
W = DIM // M
N_Q = 5


def _load(sf_dir):
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.asarray(tab["vec_id"])
    vecs = np.asarray(tab["embedding"], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], vecs[order]


def _numpy_train(ids, vecs):
    """Replica of pq_train: init = K lowest-id subvectors, ties in
    assignment to the lowest centroid id, exact means."""
    cents = []  # [sub] -> (K, W)
    for s in range(M):
        sv = vecs[:, s * W:(s + 1) * W]
        c = sv[:K].copy()
        for _ in range(ITERS):
            d = ((sv[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)  # argmin takes first (lowest cid) on ties
            c = np.stack([
                sv[a == j].mean(axis=0) if (a == j).any() else c[j]
                for j in range(K)
            ])
        cents.append(c)
    return cents


def _numpy_encode(vecs, cents):
    codes = np.empty((len(vecs), M), dtype=np.int64)
    for s in range(M):
        sv = vecs[:, s * W:(s + 1) * W]
        d = ((sv[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)
    return codes


@pytest.fixture(scope="module")
def pq_parts(spark):
    from pyspark.sql import functions as F

    from kektordb_spark.operators import pq as PQ
    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_MED)
    emb = spark.table("emb")
    cands = emb.where(F.col("vec_id") >= N_Q)
    centroids = PQ.pq_train(cands, m=M, k=K, iters=ITERS)
    codes = PQ.pq_encode(cands, centroids, m=M)
    return centroids, codes


def test_pq_train_matches_numpy(spark, pq_parts):
    centroids, _ = pq_parts
    ids, vecs = _load(SF_MED)
    mask = ids >= N_Q
    cents = _numpy_train(ids[mask], vecs[mask])
    got = {(r.sub, r.cid): r.cv for r in centroids.collect()}
    assert len(got) == M * K
    for s in range(M):
        for j in range(K):
            np.testing.assert_allclose(got[(s, j)], cents[s][j], rtol=0, atol=1e-12)


def test_pq_codes_and_topk_match_numpy(spark, pq_parts):
    from pyspark.sql import functions as F

    from kektordb_spark.operators import pq as PQ

    centroids, codes = pq_parts
    ids, vecs = _load(SF_MED)
    mask = ids >= N_Q
    cents = _numpy_train(ids[mask], vecs[mask])
    ncodes = _numpy_encode(vecs[mask], cents)
    got_codes = {(r.id, r.sub): r.code for r in codes.collect()}
    for i, vid in enumerate(ids[mask]):
        for s in range(M):
            assert got_codes[(vid, s)] == ncodes[i, s]

    # ADC top-k
    emb = spark.table("emb")
    queries = emb.where(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    res = PQ.pq_knn(codes, centroids, queries, k=10, m=M)
    got = {}
    for r in sorted(res.collect(), key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.id)

    exact_hits = 0
    for qi in range(N_Q):
        qv = vecs[ids == qi][0]
        lut = [((qv[s * W:(s + 1) * W] - cents[s]) ** 2).sum(axis=1) for s in range(M)]
        adc = np.stack([lut[s][ncodes[:, s]] for s in range(M)]).sum(axis=0)
        # pq_knn ranks by (round(dist, 6), id) — SCALE.md rule 7
        order = np.lexsort((ids[mask], np.round(adc, 6)))[:10]
        expect = [int(ids[mask][i]) for i in order]
        assert got[qi] == expect, f"query {qi}"
        # recall vs exact float kNN
        d = ((vecs[mask] - qv) ** 2).sum(axis=1)
        exact = set(ids[mask][np.lexsort((ids[mask], d))[:10]].tolist())
        exact_hits += len(exact & set(expect))
    # PQ with M=8,K=16 on 64-d random data is coarse; require
    # meaningfully-better-than-random overlap with exact top-10
    assert exact_hits >= N_Q * 2, f"recall too low: {exact_hits}/{N_Q * 10}"
