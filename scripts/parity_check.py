#!/usr/bin/env python
"""Ad-hoc parity runner: compare queries() vs oracle_sql() on one or
more entries (args = name substrings; no args = all) at $SF (default
sf0.001). Same comparison shape as tests/test_oracle_parity.py but
selectable, with per-query timing — the fast feedback loop while
developing a new operator."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E
from kektordb_spark.session import get_spark

SF = os.environ.get("SF", "/root/testdata/sf0.001")


# PARITY_RAW=1 reproduces the driver's comparison: full-precision repr
# of floats, no round-6 normalization — catches the 1-ulp cross-engine
# round() divergence the default normalization masks (VERDICT r4 §wrong).
RAW = os.environ.get("PARITY_RAW") == "1"


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else (repr(v) if RAW else round(v, 6))
            if isinstance(v, bool):
                v = int(v)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    pats = sys.argv[1:]
    queries, oracles = E.queries(), E.oracle_sql()
    names = [n for n in sorted(queries) if not pats or any(p in n for p in pats)]

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    # PARITY_CPUS / PARITY_SHUFFLE: adversarial-partitioning knobs —
    # e.g. PARITY_CPUS=32 PARITY_SHUFFLE=17 hunts partition-dependent
    # float flakes the default local[8] gate can't see (rule 7b,
    # SCALE.md; full registry verified green under exactly that combo).
    spark = get_spark("parity", cpus=int(os.environ.get("PARITY_CPUS", "8")))
    if os.environ.get("PARITY_SHUFFLE"):
        spark.conf.set("spark.sql.shuffle.partitions",
                       os.environ["PARITY_SHUFFLE"])
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {str(exc)[:400]}", flush=True)
            failed.append(name)
            continue
        ts = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: {len(srows)} rows {ts:.1f}s (no oracle — rows-only)", flush=True)
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {str(exc)[:400]}", flush=True)
            failed.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols {scols} vs {dcols}", flush=True)
            failed.append(name)
            continue
        sn, dn = norm(srows, scols), norm(drows, dcols)
        if sn != dn:
            bad = [(a, b) for a, b in zip(sn, dn) if a != b]
            print(
                f"FAIL {name}: rows {len(srows)}/{len(drows)}, "
                f"{len(bad)} mismatches, first: {bad[:2]}",
                flush=True,
            )
            failed.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows, {ts:.1f}s", flush=True)
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
