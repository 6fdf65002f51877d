#!/usr/bin/env python3
"""Per-query DuckDB baseline for the bench: times each oracle SQL over the
same parquet tables the Spark bench reads, so BENCH_r{N}.json carries both
engines' numbers and the "within 2x of baseline" criterion is computable
from the committed artifact alone.

Usage: duckdb_bench.py <sf_dir> <oracle_sql.json>
Prints ONE JSON object {query_name: seconds} on stdout (and nothing else).
Queries that fail time out as -1.0.
"""
import glob
import json
import os
import sys
import time

import duckdb


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    with open(oracle_path) as f:
        sqls = json.load(f)
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    out = {}
    for name in sorted(sqls):
        try:
            t0 = time.perf_counter()
            con.execute(sqls[name]).fetchall()
            out[name] = time.perf_counter() - t0
        except Exception:
            out[name] = -1.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
