#!/usr/bin/env python3
"""q69 multi-chunk cross-engine check (driver-side python/duckdb; NOT shipped).
Usage: python3 tools/q69_cross_check.py <verify_out_dir> [cross_dir]

The driver's fixture docs are all <= 1 window (512 tokens), so the DuckDB
gate never executes the multi-chunk branch of q69's own oracle SQL. The
PipelineSpec test "q69 cross-engine dump" plants boundary-straddling docs
and writes target/q69_cross/{fixture/documents.parquet,engine}. This tool
runs the REGISTERED q69 oracle SQL (taken verbatim from the Verify dump's
oracle_sql.json, so a drifted registration can't pass) against the planted
table in DuckDB and diffs row-for-row against the engine parquet.
"""
import sys, os, json, glob

import duckdb
import pyarrow.parquet as pq


def main():
    if len(sys.argv) < 2:
        print("usage: q69_cross_check.py <verify_out_dir> [cross_dir]",
              file=sys.stderr)
        sys.exit(2)
    out_dir = sys.argv[1]
    cross = sys.argv[2] if len(sys.argv) > 2 else "target/q69_cross"
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    sql = json.load(open(oracle_path))["q69_chunk_windows"]

    doc_files = glob.glob(os.path.join(cross, "fixture/documents.parquet", "*.parquet"))
    eng_files = glob.glob(os.path.join(cross, "engine", "*.parquet"))
    if not doc_files or not eng_files:
        print(f"ERROR: dumps missing under {cross} — run "
              "`sbt \"testOnly graft.PipelineSpec\"` first", file=sys.stderr)
        sys.exit(2)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({doc_files!r})")
    oracle = con.execute(sql).fetchall()
    eng_tbl = pq.read_table(eng_files)
    engine = sorted(tuple(r.values()) for r in eng_tbl.to_pylist())
    oracle = sorted(tuple(r) for r in oracle)

    multi = {}
    for row in oracle:  # (doc_id, chunk_idx, ...)
        multi[row[0]] = max(multi.get(row[0], 0), row[1] + 1)
    n_multi = sum(1 for v in multi.values() if v > 1)
    if n_multi == 0:
        print("FAIL: oracle result has no multi-chunk doc — branch not exercised")
        sys.exit(1)
    if engine != oracle:
        only_e = [r for r in engine if r not in set(oracle)][:5]
        only_o = [r for r in oracle if r not in set(engine)][:5]
        print(f"FAIL: engine({len(engine)}) != oracle({len(oracle)}) rows; "
              f"engine-only={only_e} oracle-only={only_o}")
        sys.exit(1)
    print(f"PASS: {len(oracle)} rows equal across engines; "
          f"{n_multi} multi-chunk docs (max {max(multi.values())} chunks) "
          "exercised the oracle's multi-chunk branch")
    sys.exit(0)


if __name__ == "__main__":
    main()
