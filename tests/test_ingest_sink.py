"""streaming_ingest_upsert: the foreachBatch MERGE sink's final
snapshot must be identical under any chunking of the arriving stream
(last-writer-wins by the (ts, event_id) total order), and must equal
the batch group-by post-image."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _snapshot(spark, n_chunks):
    from kektordb_spark.streaming.events import ingest_upsert_run

    df = ingest_upsert_run(
        spark, f"{SF_SMALL}/events.parquet", n_chunks=n_chunks
    )
    return sorted(
        (
            r["user_id"], r["event_type"], round(r["last_value"], 6),
            r["last_event_id"], int(r["n_versions"]),
        )
        for r in df.collect()
    )


def test_ingest_upsert_chunking_invariant(spark):
    assert _snapshot(spark, 1) == _snapshot(spark, 4)


def test_ingest_upsert_equals_batch_postimage(spark):
    from pyspark.sql import functions as F

    from kektordb_spark.tables import load_tables

    load_tables(spark, SF_SMALL)
    batch = sorted(
        (
            r["user_id"], r["event_type"], round(r["value"], 6),
            r["event_id"], int(r["cnt"]),
        )
        for r in spark.table("events")
        .groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("value", "event_id"), F.struct("ts", "event_id")
            ).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "user_id", "event_type",
            F.col("s.value").alias("value"),
            F.col("s.event_id").alias("event_id"), "cnt",
        )
        .collect()
    )
    assert _snapshot(spark, 3) == batch
