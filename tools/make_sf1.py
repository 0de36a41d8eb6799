#!/usr/bin/env python3
"""Synthesize a 10x scale-up fixture (sf1) from sf0.1 (driver-side; NOT shipped).
Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies] [off] [tables]

A second decade (sf1 -> sf10) needs `off` above sf1's key domain (sf1 keys
reach ~9*10M + base, so pass off=100000000); `tables` (comma-separated)
restricts generation when only one table is needed at the next decade
(e.g. `documents` for the CurationRun audit).

Unions each table `copies` times with key offsets so referential integrity
holds per copy (copy i's lineitems join copy i's orders, etc.) while the
dimension tables (region/nation) stay shared. Text/vector payloads are
perturbed per copy — a unique leading token per document, a tiny jitter on
one embedding coordinate — so content-keyed operators (exact/near dedup,
ANN) see 10x DISTINCT data rather than 10 identical replicas (identical
replicas would grow LSH bucket sizes 10x and pair output 100x, measuring
skew amplification instead of scale).

Schema is preserved exactly via pyarrow (notably events.ts TIMESTAMP_NS,
which the engine reads under nanosAsLong).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000  # far above every sf0.1 key domain

# table -> columns to offset by copy_index * OFF
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def shift(table, name, i, off=OFF):
    cols = {}
    for field in table.schema:
        col = table[field.name]
        if field.name in KEYS.get(name, []):
            col = pc.add(col, pa.scalar(i * off, type=field.type))
        cols[field.name] = col
    t = pa.table(cols, schema=table.schema)
    if name == "documents" and i > 0:
        # unique leading token per copy; n_chars tracks the new length
        text = pc.binary_join_element_wise(f"c{i}", t["text"], " ")
        t = t.set_column(t.schema.get_field_index("text"), "text", text)
        t = t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars",
            pc.cast(pc.utf8_length(text), pa.int64()))
    if name == "embeddings" and i > 0:
        vecs = t["embedding"].to_pylist()
        ids = t["vec_id"].to_pylist()
        for row, vid in enumerate(ids):
            v = vecs[row]
            if v:  # deterministic per-(copy, vec) jitter on one coordinate
                j = vid % len(v)
                v[j] += ((vid + i) % 13 - 6) * 1e-3
        emb = pa.array(vecs, type=t.schema.field("embedding").type)
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding", emb)
    return t


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    off = int(sys.argv[4]) if len(sys.argv) > 4 else OFF
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    os.makedirs(dst, exist_ok=True)
    for name in SHARED:
        if only is not None and name not in only:
            continue
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (shared)")
    for name in KEYS:
        if only is not None and name not in only:
            continue
        base = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out = pa.concat_tables(shift(base, name, i, off) for i in range(copies))
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
