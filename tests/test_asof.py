"""As-of join: the union+ordered-window implementation must agree with
pandas.merge_asof (backward, exact matches allowed) — an independent
reference implementation — on randomized version/probe streams, and
the embedder SQL twin must be byte-equal to the UDF's hash projection."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("seed", [0, 7, 1234])
def test_asof_window_matches_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    n_keys, n_versions, n_probes = 5, 40, 25
    versions = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_versions),
        "t": rng.integers(0, 10_000, n_versions),
    }).drop_duplicates(["k", "t"]).sort_values(["k", "t"]).reset_index(drop=True)
    versions["ver"] = versions.groupby("k").cumcount() + 1
    probes = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_probes),
        "t": rng.integers(0, 10_000, n_probes),
        "probe_id": np.arange(n_probes),
    })

    # independent reference: pandas merge_asof per key (backward,
    # inclusive) — version 0 when no version precedes the probe
    expect = (
        pd.merge_asof(
            probes.sort_values("t"), versions.sort_values("t"),
            on="t", by="k", direction="backward", allow_exact_matches=True,
        )
        .fillna({"ver": 0})
        .astype({"ver": int})
        .set_index("probe_id")["ver"]
        .to_dict()
    )

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    vdf = spark.createDataFrame(versions).select(
        "k", "t", F.lit(0).alias("is_probe"), "ver",
        F.lit(None).cast("long").alias("probe_id"),
    )
    pdf = spark.createDataFrame(probes).select(
        "k", "t", F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("ver"), "probe_id",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_probe").asc(), F.col("ver").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["probe_id"]: r["ver_asof"]
        for r in vdf.unionByName(pdf)
        .withColumn("ver_asof", F.coalesce(F.last("ver", True).over(w), F.lit(0)))
        .where(F.col("is_probe") == 1)
        .collect()
    }
    assert got == expect


def test_embed_sql_matches_stub_bytes(spark):
    from kektordb_spark.sources.rag import EMBED_DIM, embed_sql

    texts = ["merge sort window algorithm", "a", "", "ünïcode test 123"]
    for t in texts:
        digest = hashlib.sha256(t.encode()).digest()
        py = [digest[i] / 255.0 - 0.5 for i in range(EMBED_DIM)]
        sq = spark.sql(f"SELECT {embed_sql('spark', repr(t))} AS v").collect()[0]["v"]
        assert py == list(sq), f"embed mismatch for {t!r}"

    # and the DuckDB twin
    import duckdb

    con = duckdb.connect()
    for t in texts:
        digest = hashlib.sha256(t.encode()).digest()
        py = [digest[i] / 255.0 - 0.5 for i in range(EMBED_DIM)]
        dq = con.execute(f"SELECT {embed_sql('duckdb', repr(t))} AS v").fetchone()[0]
        assert py == list(dq), f"duckdb embed mismatch for {t!r}"
