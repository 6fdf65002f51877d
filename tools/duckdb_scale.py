#!/usr/bin/env python3
"""DuckDB twin for graft.Scale10x: times engine-idiomatic DuckDB SQL for
each probed operator shape over the SAME 1x / Nx parquet files the Spark
probes read, so BENCH_10x.json carries spark-vs-duckdb ratios in the
compute-bound regime (where per-query scheduling constants no longer
dominate — the regime VERDICT r3 asked to be put on the record).

Usage: duckdb_scale.py <workdir> <copies>

<workdir> is Scale10x's scratch dir: it holds li1/, li<copies>/, ord1/,
ord<copies>/, docs1/, docs<copies>/ (32-file parquet dirs) plus duck/*.sql
written by Scale10x — one file per probe, referencing views `li`, `ord`,
`docs`.

Each query is wrapped in `SELECT count(*), sum(hash(t)) FROM (...) t` —
the same "evaluate every column of every row" forcing the Spark probes
apply — so neither engine gets away with pruning, and DuckDB is not
charged for materializing wide results into Python.

Prints one line per (probe, scale): `<probe> <scale> <best_sec> <rows>`
(best of 2 runs, matching the Spark side's warm-run discipline).
Failures print `<probe> <scale> -1.0 0` and never kill the run.
"""
import glob
import os
import sys
import time

import duckdb


def main() -> None:
    work, copies = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count()}")
    sql_files = sorted(glob.glob(os.path.join(work, "duck", "*.sql")))
    for tag in ("1", copies):
        for view, d in (("li", "li"), ("ord", "ord"), ("docs", "docs")):
            con.execute(
                f"CREATE OR REPLACE VIEW {view} AS "
                f"SELECT * FROM read_parquet('{work}/{d}{tag}/*.parquet')"
            )
        for path in sql_files:
            name = os.path.splitext(os.path.basename(path))[0]
            with open(path) as f:
                q = f"SELECT count(*) AS n, sum(hash(t)) AS h FROM ({f.read()}) t"
            try:
                best, rows = float("inf"), 0
                for _ in range(2):
                    t0 = time.perf_counter()
                    rows = con.execute(q).fetchall()[0][0]
                    best = min(best, time.perf_counter() - t0)
                print(f"{name} {tag} {best:.3f} {rows}", flush=True)
            except Exception as e:
                sys.stderr.write(f"[duckdb_scale] {name}@{tag}: {e}\n")
                print(f"{name} {tag} -1.0 0", flush=True)


if __name__ == "__main__":
    main()
