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

Each query runs in ITS OWN SUBPROCESS. Round 12 found that one
memory-heavy replay (bpe_pack@100 peaks near the DuckDB memory limit) can
OOM and leave the process's allocator/buffer state so degraded that 30+
later queries — each fine alone — fail kilobyte allocations, poisoning the
whole twin column with -1. Process isolation frees everything between
queries: a genuine hog fails ALONE (-1 for that row only) and every other
timing is untouched. Timing happens inside the child around execute()
only, so the per-child connect+view setup never pollutes a reading.
"""
import json
import os
import subprocess
import sys
import time


def child(views_path: str, sql: str, runs: int) -> None:
    import duckdb

    with open(views_path) as f:
        views = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for vname, path in views.items():
        glob = (path if path.endswith(".parquet")
                else os.path.join(path, "*.parquet"))
        con.execute(
            f"CREATE OR REPLACE VIEW {vname} AS "
            f"SELECT * FROM read_parquet('{glob}')"
        )
    best = -1.0
    for _ in range(max(runs, 1)):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best < 0 else min(best, dt)
    print(json.dumps(best))


def main() -> None:
    views_path, sqls_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    with open(sqls_path) as f:
        sqls = json.load(f)
    out = {}
    for name in sorted(sqls):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             views_path, "--child", str(runs)],
            input=sqls[name], capture_output=True, text=True)
        try:
            out[name] = float(json.loads(proc.stdout.strip()))
        except Exception:
            out[name] = -1.0
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "--child":
        child(sys.argv[1], sys.stdin.read(), int(sys.argv[3]))
    else:
        main()
