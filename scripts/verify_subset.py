#!/usr/bin/env python
"""Oracle-parity check for a SUBSET of registry queries (driver-sim
methodology of .claude/skills/verify, at sf0.01): row count + column
names + order-insensitive rounded values vs the DuckDB oracle.

    python scripts/verify_subset.py q1 q2 ...
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as e
from kektordb_spark.session import get_spark


def norm(rows, cols):
    o = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(
            ("NaN" if isinstance(r[i], float) and math.isnan(r[i])
             else str(round(r[i], 6)) if isinstance(r[i], float)
             else str(int(r[i])) if isinstance(r[i], bool) else str(r[i]))
            for i in o
        )
        for r in rows
    )


def main() -> None:
    names = sys.argv[1:]
    SF = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("verify-subset", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for n in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{SF}/{n}.parquet'")
    qs, os_ = e.queries(), e.oracle_sql()
    fails = 0
    for name in names:
        sdf = qs[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (
            sorted(sdf.columns) == sorted(dcols)
            and len(srows) == len(drows)
            and norm(srows, sdf.columns) == norm(drows, dcols)
        )
        print(name, "OK" if ok else "MISMATCH", flush=True)
        fails += 0 if ok else 1
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
