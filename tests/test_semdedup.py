"""SemDeDup pins (operators/semdedup.py).

Two layers of assurance beyond the DuckDB-oracle parity harness:
  * the per-cell GEMM pair kernel emits EXACTLY the pairs the fold-left
    SQL derivation emits (kernel-vs-SQL equivalence — the seam where a
    float reassociation bug would hide);
  * the WHOLE pipeline (md5-seeded Lloyd -> assign -> intra-cell pairs
    -> bounded min-label propagation -> keep-least-prototypical) matches
    an independent pure-Python/numpy replica, which catches
    dialect-shared semantic bugs the SQL-vs-SQL oracle cannot
    (the same rationale as test_decay_property.py).
"""

from __future__ import annotations

import hashlib

import numpy as np

from kektordb_spark.operators import semdedup as SD
from kektordb_spark.tables import load_tables
from tests.conftest import SF_SMALL


def test_gemm_pairs_match_sql_pairs(spark):
    load_tables(spark, SF_SMALL)
    gemm = {
        (r.id_a, r.id_b)
        for r in SD.semantic_pairs(spark).collect()
    }
    sql = spark.sql(SD.semantic_dedup_sql(
        "spark", cents_source="ivf_cents", assign_source="ivf_assign"))
    # re-run just the pair CTE by name: easiest is the full statement's
    # pairs stage — rebuild the text with a pairs-only tail.
    txt = SD.semantic_dedup_sql(
        "spark", cents_source="ivf_cents", assign_source="ivf_assign")
    # split before the final statement (the last top-level SELECT —
    # may carry a join hint, so match the newline-anchored keyword)
    head, _, _ = txt.rpartition("\nSELECT ")
    pairs_sql = head + "\nSELECT id_a, id_b FROM pairs"
    folded = {(r.id_a, r.id_b) for r in spark.sql(pairs_sql).collect()}
    assert gemm == folded
    assert len(gemm) > 0


def _python_replica(sf_dir: str):
    """Independent replica of the whole SemDeDup pipeline."""
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((V * V).sum(axis=1))

    # md5-seeded init: first nlist ids ordered by md5(CAST(id AS STRING))
    nlist, kiters = 8, 2
    md5s = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    order = np.argsort(np.array(md5s, dtype=object))
    cents = V[order[:nlist]].copy()

    def assign(C):
        # squared L2, ties to lowest cid
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1)

    for _ in range(kiters):
        a = assign(cents)
        newc = []
        for c in range(len(cents)):
            m = V[a == c]
            # empty cells cannot arise in the SQL form (a GROUP BY
            # simply omits them and the next assignment uses surviving
            # cids); replicate by keeping only non-empty cells' means,
            # re-indexed in cid order like the SQL GROUP BY result.
            if len(m):
                newc.append(np.round(m.mean(axis=0), 12))
        cents = np.array(newc)
    a = assign(cents)

    S = (V @ V.T) / np.outer(norms, norms)
    pairs = []
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if a[i] == a[j] and ids[i] < ids[j] \
                    and np.round(S[i, j], 6) >= SD.SEM_TAU:
                pairs.append((int(ids[i]), int(ids[j])))

    # bounded synchronous min-label propagation
    nodes = sorted({u for p in pairs for u in p})
    nbrs = {u: set() for u in nodes}
    for u, w in pairs:
        nbrs[u].add(w)
        nbrs[w].add(u)
    label = {u: u for u in nodes}
    for _ in range(SD.SEM_ITERS):
        label = {
            u: min([label[u]] + [label[w] for w in nbrs[u]])
            for u in nodes
        }

    idx = {int(i): k for k, i in enumerate(ids)}
    out = {}
    for lab in set(label.values()):
        members = sorted(u for u in nodes if label[u] == lab)
        # keeper: max cosine distance to own centroid, ties lowest id
        best = None
        for u in members:
            k = idx[u]
            c = cents[a[k]]
            cd = round(
                1.0 - (V[k] @ c) / (norms[k] * np.sqrt(c @ c)), 6)
            key = (-cd, u)
            if best is None or key < best[0]:
                best = (key, u, int(a[k]))
        out[lab] = {
            "kept_id": best[1],
            "cid": best[2],
            "size": len(members),
            "dropped": len(members) - 1,
            "members": ",".join(str(m) for m in members),
        }
    return out


def test_pipeline_matches_python_replica(spark):
    load_tables(spark, SF_SMALL)
    got = {
        r.members: (r.kept_id, r.cid, r.size, r.dropped)
        for r in spark.sql(SD.semantic_dedup_sql(
            "spark", cents_source="ivf_cents",
            assign_source="ivf_assign")).collect()
    }
    want = {
        g["members"]: (g["kept_id"], g["cid"], g["size"], g["dropped"])
        for g in _python_replica(SF_SMALL).values()
    }
    assert got == want
    assert len(want) > 0
