"""Interval-join boundary semantics (operators/rangejoin.py): the
bucketized Spark plan and the DuckDB range-predicate oracle must agree
on half-open edges ([s_us, e_us)) and on events landing exactly on
bucket boundaries — the two places a bucketize-then-filter rewrite can
silently drift from the predicate it implements."""

from __future__ import annotations

import duckdb
import pytest

from kektordb_spark.operators.rangejoin import (
    BUCKET_US, session_concurrency_sql)

GAP_US = 1_800_000_000  # session gap (streaming/events.py)


def _duck_interval_join(ivals, pts, extra_key=False):
    """Ground truth via DuckDB's native inequality-join (IEJoin) on the
    plain range predicate."""
    con = duckdb.connect()
    con.execute("CREATE TABLE iv (iid BIGINT, s BIGINT, e BIGINT, k BIGINT)")
    con.executemany("INSERT INTO iv VALUES (?, ?, ?, ?)", ivals)
    con.execute("CREATE TABLE pt (pid BIGINT, p BIGINT, pk BIGINT)")
    con.executemany("INSERT INTO pt VALUES (?, ?, ?)", pts)
    key = " AND pt.pk = iv.k" if extra_key else ""
    return {tuple(r) for r in con.execute(
        f"SELECT iid, pid FROM iv JOIN pt ON p >= s AND p < e{key}"
    ).fetchall()}


@pytest.mark.parametrize("seed,bucket", [(0, 7), (1, 64), (2, 1000), (3, 1)])
def test_interval_join_matches_iejoin_on_random_intervals(
        spark, seed, bucket):
    """Property test for the public interval_join operator: on random
    (including negative, degenerate, boundary-touching) intervals the
    bucketized equi-join must produce exactly the pairs DuckDB's IEJoin
    produces for the raw half-open predicate — for any bucket width."""
    import random

    from kektordb_spark.operators.rangejoin import interval_join

    rng = random.Random(seed)
    ivals = []
    for i in range(120):
        s = rng.randint(-500, 500)
        ln = rng.choice([0, 1, rng.randint(1, 40), rng.randint(1, 300)])
        ivals.append((i, s, s + ln, rng.randint(0, 3)))
    pts = [(j, rng.randint(-520, 820), rng.randint(0, 3))
           for j in range(300)]
    # exact boundary hits
    for j, (i, s, e, k) in enumerate(ivals[:30]):
        pts.append((1000 + 2 * j, s, k))
        pts.append((1001 + 2 * j, e, k))

    iv = spark.createDataFrame(ivals, "iid long, s long, e long, k long")
    pt = spark.createDataFrame(pts, "pid long, p long, pk long")
    got = {(r.iid, r.pid) for r in interval_join(
        iv, pt, "s", "e", "p", bucket=bucket).collect()}
    assert got == _duck_interval_join(ivals, pts)

    import pyspark.sql.functions as F

    got_k = {(r.iid, r.pid) for r in interval_join(
        iv, pt, "s", "e", "p", bucket=bucket,
        extra_pred=F.col("pk") == F.col("k")).collect()}
    assert got_k == _duck_interval_join(ivals, pts, extra_key=True)


def test_interval_join_rejects_column_collisions(spark):
    from kektordb_spark.operators.rangejoin import interval_join

    iv = spark.createDataFrame([(0, 0, 10)], "iid long, s long, e long")
    pt = spark.createDataFrame([(1, 5)], "iid long, p long")
    with pytest.raises(ValueError, match="collision"):
        interval_join(iv, pt, "s", "e", "p")

# user 1 anchors one session [T0, T0+gap); user 2 fires events at the
# exact half-open edges and at a bucket boundary inside the window.
# T0 sits OFF the bucket grid so the session spans a bucket boundary.
T0 = 1_705_276_800_000_000 + BUCKET_US * 3 // 4
EDGE = ((T0 // BUCKET_US) + 1) * BUCKET_US
ROWS = [
    (1, 100, T0),               # session anchor (user 1)
    (2, 200, T0),               # == s_us  -> inside (>=)
    (2, 201, T0 + GAP_US - 1),  # last micro -> inside
    (2, 202, T0 + GAP_US),      # == e_us  -> OUTSIDE (half-open)
    (2, 203, EDGE),             # exact bucket boundary -> inside
]


def test_boundary_semantics_match_oracle(spark, tmp_path):
    assert T0 < EDGE < T0 + GAP_US
    df = spark.createDataFrame(
        ROWS, "user_id bigint, event_id bigint, us bigint",
    ).selectExpr(
        "user_id", "event_id",
        "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts",
        "CAST(1.0 AS DOUBLE) AS value",
    )
    p = str(tmp_path / "boundary_events.parquet")
    df.write.mode("overwrite").parquet(p)

    from kektordb_spark import tables as T

    try:
        spark.read.parquet(p).createOrReplaceTempView("events")
        got = {(r.user_id, r.s_us, r.e_us, r.n_concurrent) for r in
               spark.sql(session_concurrency_sql("spark")).collect()}
    finally:
        # load_tables memoizes view registration per (session, sf_dir);
        # drop the memo so the next caller re-registers the fixture
        # views instead of reading this test's events relation.
        T._REGISTERED.pop(id(spark), None)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = {tuple(r) for r in con.sql(
        "SELECT user_id, s_us, e_us, n_concurrent FROM ("
        + session_concurrency_sql("duckdb") + ") x").fetchall()}
    assert got == want

    # user 1's single session counts exactly the 3 inside events:
    # == s_us and the bucket-boundary event are IN, == e_us is OUT.
    assert [n for (u, s, e, n) in got if u == 1] == [3]
