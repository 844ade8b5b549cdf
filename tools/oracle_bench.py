#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB — the external perf yardstick.

BASELINE.json publishes no absolute numbers, so the bench gate has only
prev-round ratios to compare against. This tool records what the oracle
engine (single-process DuckDB, the same engine the correctness gate
trusts) pays for each oracled query over the same parquet at the same
SF, as an INFORMATIONAL reference column:

  python3 tools/oracle_bench.py <sfDir> <oracleSqlJson> <outJson> [reps]

Honest-comparison rule (SURVEY.md §5): single-process DuckDB at bench
SF measures ENGINE OVERHEAD, not scaling — DuckDB has no shuffle, no
task scheduling, no distributed-plan tax, so at sf0.1 it will beat a
local[32] Spark session on most keys and that is expected. The
comparable number for the 100 TB design argument is the 5x/25x probe
tier, where partition-parallel plans hold their exponents and a
single-process engine cannot follow. Bench.scala embeds this map (when
target/oracle_bench.json is present) into target/bench.json as
`oracle_s` so BENCH_r{N} carries the yardstick alongside the Spark
seconds.

Per-query time is min of `reps` (default 2) executions, result fully
materialized (fetchall), connection warmed by one untimed pass of the
first query.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json, out_json, reps=2):
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark writes a directory of part files; the driver's testdata
        # are single files — accept both
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(oracle_json))
    times = {}
    failed = []
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"[oracle_bench] FAIL {name}: {e}")
                failed.append(name)
                best = -1.0
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"[oracle_bench] {name}: {times[name]}s")
    total = round(sum(v for v in times.values() if v > 0), 3)
    out = {"engine": "duckdb", "sf_dir": sf_dir, "reps": reps,
           "total_s": total, "failed": failed, "oracle_s": times}
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[oracle_bench] total {total}s over "
          f"{sum(1 for v in times.values() if v > 0)} queries -> {out_json}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else 2))
