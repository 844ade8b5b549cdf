#!/usr/bin/env python3
"""Regenerate the pyarrow-written Arrow IPC fixture used by
ArrowInterchangeSpec to prove cross-implementation interop (a stream
written by pyarrow must read back through Importer.importArrowIpc).

Run from the repo root:  python3 tools/make_arrow_fixture.py
"""
import pyarrow as pa

table = pa.table({
    "id": pa.array([1, 2, 3, 4], type=pa.int64()),
    "name": pa.array(["alpha", "beta", "gamma", "delta"]),
    "score": pa.array([1.5, -2.25, 0.0, 42.125], type=pa.float64()),
    "ok": pa.array([True, False, True, False]),
})
with open("src/test/resources/pyarrow_fixture.arrows", "wb") as f:
    with pa.ipc.new_stream(f, table.schema) as w:
        w.write_table(table)
print("wrote src/test/resources/pyarrow_fixture.arrows")
