#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle SQL from Verify's oracle_sql.json over the
same parquet tables, and compares against the Spark result parquet:
columns sorted by name, rows sorted, values compared exactly (with a
small report of first mismatches). Usage:

  python3 tools/verify_local.py <sfDir> <verifyOutDir> [--only-present]

--only-present skips oracle entries whose spark dump is absent — the
dev-loop mode for single-query Verify runs (a full run should NOT use
it: a missing dump there is a real failure).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = [tuple(canon(v) for v in row) for row in zip(*(tbl.column(c).to_pylist() for c in cols))]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return cols, rows


def dtype_family(t):
    s = str(t)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s in ("float", "double", "halffloat"):
        return "float"
    if s.startswith("decimal"):
        return s  # exact precision/scale must match (pandas → object)
    if s in ("string", "large_string"):
        return "str"
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("date"):
        return "date"
    return s


def dtype_mismatches(got_schema, want_schema):
    gt = {f.name: dtype_family(f.type) for f in got_schema}
    wt = {f.name: dtype_family(f.type) for f in want_schema}
    return {c: (gt.get(c), wt.get(c))
            for c in set(gt) | set(wt) if gt.get(c) != wt.get(c)}


def main(sf_dir, out_dir, only_present=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            if only_present:
                continue
            print(f"FAIL {name}: spark result missing ({e})")
            n_fail += 1
            failures.append(name)
            continue
        try:
            want = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        gc, gr = table_rows(got)
        wc, wr = table_rows(want)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} duck={wc}")
            n_fail += 1
            failures.append(name)
            continue
        # dtype families must match: the driver's comparator hashes
        # pandas dtypes, so int64 vs hugeint/decimal128 or int vs double
        # mismatch even when values are ==-equal in python (bit us on
        # q06/q32/q34 in round 1)
        bad_types = dtype_mismatches(got.schema, want.schema)
        if bad_types:
            print(f"FAIL {name}: dtype mismatch {bad_types}")
            n_fail += 1
            failures.append(name)
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount spark={len(gr)} duck={len(wr)}")
            n_fail += 1
            failures.append(name)
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(gr)} rows differ; cols={gc}; first:")
            for i, a, b in diffs[:3]:
                print(f"  row {i}\n   spark={a}\n   duck ={b}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed" +
          (f": {failures}" if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  only_present="--only-present" in sys.argv[3:]))
