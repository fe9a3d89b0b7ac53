"""Interval (range) join — the brief's canonical Spark-lacking operator,
expressed with the standard bucketize-then-equi-join technique.

Semantics (the concurrency-enrichment query): for every per-user
session window (gap-based, the exact gaps-and-islands definition the
streaming session operator and its oracle share —
streaming/events.session_windows_oracle_sql), count the events of
OTHER users whose timestamp falls inside the session's half-open
interval [s_us, e_us) — "what else was hitting the system during this
session", the load-attribution join every event-log pipeline needs.

Why this needs an operator: Spark has no native inequality-join
strategy — `e.us >= s.s_us AND e.us < s.e_us` alone plans as a
BroadcastNestedLoopJoin / cartesian (every event against every
session). DuckDB plans the same text as an IEJoin, so the ORACLE keeps
the plain range predicate while the Spark side uses the canonical
batch technique:

  1. explode each session onto the fixed time grid it covers
     (sequence(s_us DIV B, (e_us-1) DIV B) — intervals are
     gap-bounded, so the per-session bucket fan-out is bounded);
  2. map each event to its single bucket in the scan projection;
  3. EQUI-join on the bucket (shuffle on bucket keys — time-local,
     naturally balanced unless one wall-clock bucket is globally hot);
  4. re-apply the EXACT containment predicate as a post-filter.

An event's bucket is unique, so each (event, session) pair meets at
most once — no DISTINCT pass. The join is LEFT from the session side
(sessions with zero concurrent events report 0; count() over the
event id ignores the null rows each empty bucket contributes). All
outputs are integers — exactly associative, hash-stable.

At 100 TB: bucket width B trades fan-out (interval_len/B rows per
session) against join selectivity (events per bucket post-filtered
away); both relations partition by time, so the shuffle is co-located
for time-sorted ingest. The as-of join (operators/asof.py) is the
ordered-window sibling for point-version lookup; this is the
overlap-count sibling.
"""

from __future__ import annotations

BUCKET_US = 3_600 * 1_000_000  # 1 h in micros — sized to the interval
                               # scale (30-min-gap sessions): fan-out
                               # ~1-2 buckets/session, tight post-filter


def _sessions(dialect: str) -> str:
    from kektordb_spark.streaming.events import session_windows_oracle_sql

    return session_windows_oracle_sql(dialect)


def session_concurrency_sql(dialect: str, bucket_us: int = BUCKET_US) -> str:
    """One text per dialect, same relational answer: DuckDB runs the
    direct range predicate (IEJoin); Spark runs the bucketized
    equi-join + exact post-filter (see module docstring)."""
    us = ("unix_micros(CAST(ts AS TIMESTAMP))" if dialect == "spark"
          else "epoch_us(ts)")
    sess = _sessions(dialect)
    if dialect == "duckdb":
        return f"""
WITH s AS MATERIALIZED (
{sess}
),
ev AS (SELECT user_id, event_id, {us} AS us FROM events)
SELECT s.user_id, s.s_us, s.e_us, s.n_events,
       CAST(count(e.event_id) AS BIGINT) AS n_concurrent
FROM s LEFT JOIN ev e
  ON e.us >= s.s_us AND e.us < s.e_us AND e.user_id <> s.user_id
GROUP BY s.user_id, s.s_us, s.e_us, s.n_events
""".strip()
    return f"""
WITH s AS (
{sess}
),
sb AS (
  SELECT user_id, s_us, e_us, n_events, bk
  FROM s
  LATERAL VIEW explode(sequence(s_us DIV {bucket_us},
                                (e_us - 1) DIV {bucket_us})) t AS bk
),
ev AS (SELECT user_id, event_id, {us} AS us,
              {us} DIV {bucket_us} AS bk FROM events)
SELECT sb.user_id, sb.s_us, sb.e_us, sb.n_events,
       CAST(count(e.event_id) AS BIGINT) AS n_concurrent
FROM sb LEFT JOIN ev e
  ON e.bk = sb.bk AND e.us >= sb.s_us AND e.us < sb.e_us
 AND e.user_id <> sb.user_id
GROUP BY sb.user_id, sb.s_us, sb.e_us, sb.n_events
""".strip()
