"""As-of join — the canonical "operator Spark lacks" (brief §custom
operators): each probe row picks the LATEST version row at-or-before
its timestamp within its key.

The reference touches this shape twice: time-travel reads pick edge
versions active at t (pkg/core/graph.go:350-362), and the artifact
store reads the newest version at-or-before a request (pkg/compiler/
store.go). A naive implementation is a range join (probe.ts >=
version.ts) + per-probe max — O(|probes| x |versions per key|) pairs
through the join.

The scalable shape is the UNION + ORDERED WINDOW trick (what
Flink/QuestDB/kdb-style engines do internally, and pandas merge_asof
single-node): interleave probes and versions in one relation sorted by
(key, ts, kind), then ``last(version IGNORE NULLS)`` over the
unbounded-preceding frame assigns every probe the version in effect —
ONE shuffle keyed on the join key, zero row blowup, skew-bounded by
the key partitioning. Both Spark and DuckDB express it natively, so
the operator is fully oracle-checked.
"""

from __future__ import annotations


def artifact_version_asof_sql(
    dialect: str, artifact_mod: int = 25, probe_every: int = 3,
    probe_lag_s: int = 1800,
) -> str:
    """Version-as-of query over the SCD-2 artifact stream
    (lifecycle.artifact_diff_sql cohort): versions = the artifact's
    events in ts order; probes = a half-hour after every
    ``probe_every``-th event. Each probe resolves to the version
    number in effect at its timestamp (0 = before the first version).
    """
    if dialect == "spark":
        ep = "CAST(unix_timestamp(ts) AS BIGINT)"
        last_ver = "last(ver, true)"
    else:
        ep = "CAST(floor(epoch(ts)) AS BIGINT)"
        last_ver = "last_value(ver IGNORE NULLS)"
    return f"""
WITH v AS (
  SELECT user_id AS artifact, {ep} AS t, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ver
  FROM events
  WHERE user_id % {artifact_mod} = 0
),
probes AS (
  SELECT artifact, t + {probe_lag_s} AS t, event_id AS probe_id
  FROM v WHERE ver % {probe_every} = 0
),
u AS (
  SELECT artifact, t, 0 AS is_probe, ver, CAST(NULL AS BIGINT) AS probe_id FROM v
  UNION ALL
  SELECT artifact, t, 1, NULL, probe_id FROM probes
),
w AS (
  SELECT artifact, t, is_probe, probe_id,
         {last_ver} OVER (
           PARTITION BY artifact
           ORDER BY t, is_probe, ver NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS ver_asof
  FROM u
)
SELECT artifact, probe_id, t AS probe_t,
       CAST(coalesce(ver_asof, 0) AS INT) AS ver_asof
FROM w WHERE is_probe = 1
ORDER BY artifact, probe_id
""".strip()
