#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT shipped in the engine;
driver-side python/duckdb only). Usage:
  python3 tools/compare.py /tmp/verify_out /root/testdata/sf0.01 [query ...]

For each query dir under verify_out: load the engine parquet, run the oracle
SQL in DuckDB over views named after the test tables, sort columns by name,
and compare row count / schema / values.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # repr keeps full double precision; -0.0 folds to 0.0
        return repr(v + 0.0)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    # a query that crashed in Verify has no output dir — that is a failure,
    # not something to silently skip. queries.json (dumped by Verify) is the
    # authoritative expected set, so even a rows-only query with no oracle
    # entry and no output dir is counted as FAIL.
    expected = set(oracle) | {
        n for n in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, n))}
    qlist = os.path.join(out_dir, "queries.json")
    if os.path.exists(qlist):
        expected |= set(json.load(open(qlist)))
    for name in sorted(expected):
        if only and name not in only:
            continue
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"{name}: FAIL (no output dir — query crashed in Verify)")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        eng = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        eng_cols = [d[0] for d in con.description]
        if name not in oracle:
            ok = len(eng) > 0
            n_pass, n_fail = n_pass + (1 if ok else 0), n_fail + (0 if ok else 1)
            print(f"{name}: rows-only check: rows={len(eng)} "
                  + ("PASS" if ok else "FAIL (0 rows)"))
            continue
        ora = con.execute(oracle[name]).fetchall()
        ora_cols = [d[0] for d in con.description]
        schema_ok = sorted(eng_cols) == sorted(ora_cols)
        rows_ok = len(eng) == len(ora)
        # sort columns by name (driver contract), then compare values
        eidx = [eng_cols.index(c) for c in sorted(eng_cols)]
        oidx = [ora_cols.index(c) for c in sorted(ora_cols)]
        vals_ok = schema_ok and rows_ok
        first_diff = None
        if vals_ok:
            for i, (er, orow) in enumerate(zip(eng, ora)):
                e = [norm_cell(er[j]) for j in eidx]
                o = [norm_cell(orow[j]) for j in oidx]
                if e != o:
                    vals_ok = False
                    first_diff = (i, e, o)
                    break
        status = "PASS" if (schema_ok and rows_ok and vals_ok) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{name}: {status} rows={len(eng)}/{len(ora)} "
              f"schema={'ok' if schema_ok else f'{eng_cols} vs {ora_cols}'}")
        if first_diff:
            i, e, o = first_diff
            print(f"  first diff row {i}:\n    engine: {e}\n    oracle: {o}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
