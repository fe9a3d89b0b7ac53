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


def _duck_asof(lrows, rrows, how="left"):
    """Ground truth via DuckDB's native ASOF JOIN (greatest right ts
    at-or-before the probe's, per key)."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, lts BIGINT, lval BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", lrows)
    con.execute("CREATE TABLE r (k BIGINT, rts BIGINT, rval BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", rrows)
    j = "ASOF LEFT JOIN" if how == "left" else "ASOF JOIN"
    return {tuple(x) for x in con.execute(
        f"SELECT l.k, l.lts, l.lval, r.rval FROM l {j} r "
        "ON l.k = r.k AND l.lts >= r.rts").fetchall()}


def test_asof_join_api_matches_duckdb_asof():
    """Property test for the public asof_join operator: random probes
    and versions (unique version ts per key — both engines' tie rule is
    otherwise unspecified) must match DuckDB's native ASOF JOIN for
    both how= modes, including exact-timestamp ties (at-or-before)."""
    import random

    from kektordb_spark.operators.asof import asof_join
    from kektordb_spark.session import get_spark

    spark = get_spark("asof-prop", cpus=8)
    rng = random.Random(5)
    rrows = []
    for k in range(6):
        for ts in rng.sample(range(0, 400), 25):  # unique ts per key
            rrows.append((k, ts, rng.randint(0, 99)))
    lrows = [(rng.randint(0, 7), rng.randint(-20, 430), i)
             for i in range(300)]
    # exact-tie probes on existing version timestamps
    for i, (k, ts, _v) in enumerate(rrows[:40]):
        lrows.append((k, ts, 1000 + i))

    left = spark.createDataFrame(lrows, "k long, lts long, lval long")
    right = spark.createDataFrame(rrows, "k long, rts long, rval long")
    for how in ("left", "inner"):
        got = {(r.k, r.lts, r.lval, r.rval) for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            how=how).collect()}
        want = _duck_asof(lrows, rrows, how)
        if how == "inner":
            want = {t for t in want if t[3] is not None}
        assert got == want, f"how={how}: {len(got ^ want)} diffs"


def test_asof_join_rejects_collisions_and_empty_payload(spark):
    import pytest

    from kektordb_spark.operators.asof import asof_join

    l = spark.createDataFrame([(1, 2, 3)], "k long, lts long, v long")
    r = spark.createDataFrame([(1, 2, 3)], "k long, rts long, v long")
    with pytest.raises(ValueError, match="collision"):
        asof_join(l, r, on=["k"], left_ts="lts", right_ts="rts")
    r2 = spark.createDataFrame([(1, 2)], "k long, rts long")
    with pytest.raises(ValueError, match="payload"):
        asof_join(l, r2, on=["k"], left_ts="lts", right_ts="rts")


def test_asof_join_timestamp_subsecond_resolution(spark):
    """r6 ADVICE: cast('long') on TIMESTAMP truncates to whole
    seconds, letting a probe match a version up to 1s in its FUTURE.
    A version at 10:00:00.600 must NOT match a probe at 10:00:00.400
    (same truncated second); a version .2s before the probe must.
    Strings must raise instead of coarsening silently."""
    import datetime as dt

    import pytest

    from kektordb_spark.operators.asof import asof_join

    base = dt.datetime(2026, 8, 15, 10, 0, 0)
    ms = lambda n: base + dt.timedelta(milliseconds=n)  # noqa: E731
    left = spark.createDataFrame(
        [(1, ms(400), "p1"), (1, ms(900), "p2")],
        "k long, lts timestamp, pname string")
    right = spark.createDataFrame(
        [(1, ms(200), "early"), (1, ms(600), "late")],
        "k long, rts timestamp, rval string")
    got = {(r.pname, r.rval) for r in asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts").collect()}
    # p1@.4s sees only early@.2s (late@.6s is in its future);
    # p2@.9s sees late@.6s
    assert got == {("p1", "early"), ("p2", "late")}
    sleft = spark.createDataFrame([(1, "x", "p")],
                                  "k long, lts string, pname string")
    with pytest.raises(ValueError, match="non-integral"):
        asof_join(sleft, right, on=["k"], left_ts="lts", right_ts="rts")
