"""Time-decay memory ranking (SURVEY.md §2.5 H4).

Reference semantics (pkg/engine/search_utils.go:91-146, ops.go:1099-1186,
hnsw/config.go:42-64):
  * models: exponential 2^(-age/hl); linear max(0, 1-age/hl);
    step (1 if age < hl else 0); ebbinghaus e^(-age/S) with
    S = hl*(1+ln(1+access_count)).
  * reference time = max(created_at, last_accessed) (ops.go:1132-1146).
  * age <= 0 → 1.0; hl <= 0 (procedural layer) → 1.0; pinned → skip.
  * per-layer half-life: episodic 72h, semantic 720h, procedural none
    (hnsw/config.go:176-229 defaults).
  * per-row ``_decay_model`` override (ops.go:1169-1173); unknown model
    falls back to exponential.

Everything is a deterministic column expression of a caller-supplied
``query_time`` — never wall clock — so results are reproducible and
oracle-checkable (FIXTURES.md requirement).
"""

from __future__ import annotations

HALF_LIFE_SECONDS = {
    "episodic": 72 * 3600.0,
    "semantic": 720 * 3600.0,
    "procedural": 0.0,  # no decay
}


def decay_sql(
    query_time: int,
    created: str = "created_at",
    last_accessed: str = "last_accessed",
    access_count: str = "access_count",
    layer: str = "memory_layer",
    model: str = "decay_model",
    pinned: str = "pinned",
    default_model: str = "exponential",
    dialect: str = "spark",
) -> str:
    """Emit the decay factor as a SQL expression (valid in both Spark SQL
    and DuckDB SQL — only shared functions are used)."""
    hl = (
        f"CASE {layer} "
        f"WHEN 'episodic' THEN {HALF_LIFE_SECONDS['episodic']} "
        f"WHEN 'semantic' THEN {HALF_LIFE_SECONDS['semantic']} "
        f"WHEN 'procedural' THEN 0.0 "
        f"ELSE {HALF_LIFE_SECONDS['episodic']} END"
    )
    ref_time = f"greatest(CAST({created} AS DOUBLE), CAST(coalesce({last_accessed}, {created}) AS DOUBLE))"
    age = f"(CAST({query_time} AS DOUBLE) - {ref_time})"
    mdl = f"coalesce({model}, '{default_model}')"
    stability = f"(__hl * (1.0 + ln(1.0 + CAST({access_count} AS DOUBLE))))"
    # Model dispatch; unknown model -> exponential (search_utils.go:103-114).
    body = (
        f"CASE "
        f"WHEN {mdl} = 'linear' THEN greatest(0.0, 1.0 - __age / __hl) "
        f"WHEN {mdl} = 'step' THEN CASE WHEN __age < __hl THEN 1.0 ELSE 0.0 END "
        f"WHEN {mdl} = 'ebbinghaus' THEN exp(-__age / {stability}) "
        f"ELSE power(2.0, -__age / __hl) END"
    )
    # Inline the __hl/__age aliases (no lateral aliases: keep it portable).
    body = body.replace("__hl", f"({hl})").replace("__age", f"({age})")
    return (
        f"CASE WHEN coalesce({pinned}, false) THEN 1.0 "
        f"WHEN ({hl}) <= 0.0 THEN 1.0 "
        f"WHEN ({age}) <= 0.0 THEN 1.0 "
        f"ELSE {body} END"
    )
