#!/usr/bin/env python3
"""Generic DuckDB SQL timer for the scale artifacts: registers parquet views
and times arbitrary SQL statements over them, so BENCH_10x/100x.json can
carry a DuckDB twin per probe (the same result computed by DuckDB, timed on
the same machine against the same files).

Usage: duckdb_sql_timer.py <views.json> <sqls.json> [runs]
  views.json: {"view_name": "/path/to/parquet_dir_or_glob", ...}
  sqls.json:  {"probe_name": "SELECT ...", ...}
  runs:       times each SQL `runs` times, reports the BEST (default 2 —
              first run warms the file cache, matching the Spark side's
              warm-path timing).
Prints ONE JSON object {probe_name: seconds} on stdout. Failures time as -1.
"""
import json
import os
import sys
import time

import duckdb


def main() -> None:
    views_path, sqls_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    with open(views_path) as f:
        views = json.load(f)
    with open(sqls_path) as f:
        sqls = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for name, path in views.items():
        glob = path if path.endswith(".parquet") else os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{glob}')"
        )
    out = {}
    for name in sorted(sqls):
        best = -1.0
        try:
            for _ in range(max(runs, 1)):
                t0 = time.perf_counter()
                con.execute(sqls[name]).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best < 0 else min(best, dt)
        except Exception:
            best = -1.0
        out[name] = best
    print(json.dumps(out))


if __name__ == "__main__":
    main()
