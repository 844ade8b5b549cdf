#!/usr/bin/env python3
"""verify_local with a per-key oracle wall budget — the sf1 tier runner.

At sf1 a handful of oracle SQLs are quadratic by design (all-pairs
cosine/jaccard baselines the Spark side also computes exactly, plus
DuckDB-side recursive media replays); running them 100x past bench SF
can take hours in a single DuckDB process. This wrapper runs each
oracle under a wall budget (default 300 s) in a SUBPROCESS (DuckDB has
no reliable per-query interrupt) and records over-budget keys as
"skipped_budget" — explicitly distinguished from pass/fail, so the
record never silently counts an unchecked key as green.

  python3 tools/verify_budget.py <sfDir> <verifyOutDir> <outJson> [budget_s]

Writes <outJson>: {key: {"status": "pass"|"fail"|"skipped_budget",
"rows": n, "detail": ...}, ...} plus a _summary entry.
"""
import json
import multiprocessing as mp
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def run_oracle(sf_dir, sql, conn_q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    try:
        tbl = con.execute(sql).arrow()
        import pyarrow as pa
        import pyarrow.ipc as ipc
        sink = pa.BufferOutputStream()
        with ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        conn_q.put(("ok", sink.getvalue().to_pybytes()))
    except Exception as e:
        conn_q.put(("err", str(e)))


def main(sf_dir, out_dir, out_json, budget_s=300.0):
    sys.path.insert(0, "tools")
    import verify_local as vl
    import pyarrow as pa
    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = n_skip = 0
    ctx = mp.get_context("spawn")
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = {"status": "fail",
                             "detail": f"spark result missing: {e}"}
            n_fail += 1
            print(f"FAIL {name}: spark result missing")
            continue
        q = ctx.Queue()
        p = ctx.Process(target=run_oracle, args=(sf_dir, sql, q))
        p.start()
        want = None
        err = None
        try:
            kind, payload = q.get(timeout=budget_s)
            if kind == "ok":
                want = ipc.open_stream(pa.BufferReader(payload)).read_all()
            else:
                err = payload
        except Exception:
            err = "__budget__"
        finally:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
                p.join()
        dt = time.time() - t0
        if err == "__budget__":
            results[name] = {"status": "skipped_budget", "oracle_s": dt}
            n_skip += 1
            print(f"SKIP {name}: oracle over {budget_s:.0f}s budget")
            continue
        if err is not None:
            results[name] = {"status": "fail", "detail": f"oracle: {err}"}
            n_fail += 1
            print(f"FAIL {name}: oracle SQL error: {err[:200]}")
            continue
        gc, gr = vl.table_rows(got)
        wc, wr = vl.table_rows(want)
        bad_types = vl.dtype_mismatches(got.schema, want.schema)
        if gc != wc:
            detail = f"columns spark={gc} duck={wc}"
        elif bad_types:
            detail = f"dtype mismatch {bad_types}"
        elif len(gr) != len(wr):
            detail = f"rowcount spark={len(gr)} duck={len(wr)}"
        else:
            diffs = [(i, a, b)
                     for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
            detail = (f"{len(diffs)}/{len(gr)} rows differ; first: "
                      f"{diffs[:2]}") if diffs else None
        if detail:
            results[name] = {"status": "fail", "rows": len(gr),
                             "detail": detail, "oracle_s": round(dt, 2)}
            n_fail += 1
            print(f"FAIL {name}: {detail[:300]}")
        else:
            results[name] = {"status": "pass", "rows": len(gr),
                             "oracle_s": round(dt, 2)}
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows, {dt:.1f}s)")
    results["_summary"] = {"pass": n_pass, "fail": n_fail,
                           "skipped_budget": n_skip,
                           "budget_s": budget_s, "sf_dir": sf_dir}
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} over budget")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  float(sys.argv[4]) if len(sys.argv) > 4 else 300.0))
