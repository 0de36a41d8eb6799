#!/usr/bin/env python3
"""Oracle output-type lint (driver-side python/duckdb only; NOT shipped).
Usage: python3 tools/typelint.py /tmp/verify_out /root/testdata/sf0.01

DESCRIBEs every oracle SQL in DuckDB and diffs each output column's type
against the engine's parquet schema for the same query. The r4/r5 q59 hash
mismatch was exactly this: DuckDB types an uncast SUM(BIGINT) as HUGEINT
(int128) while Spark emits int64 — values equal, hashes not. Flags any
column whose DuckDB type does not map onto the Spark/parquet type.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB type -> acceptable arrow type prefixes
OK = {
    "BIGINT": ("int64",),
    "INTEGER": ("int32",),
    "SMALLINT": ("int16",),
    "TINYINT": ("int8",),
    "DOUBLE": ("double",),
    "FLOAT": ("float",),
    "VARCHAR": ("string", "large_string"),
    "BOOLEAN": ("bool",),
    "DATE": ("date32",),
    "BLOB": ("binary", "large_binary"),
}

def arrow_ok(duck_t, arrow_t):
    duck_t = duck_t.upper()
    a = str(arrow_t)
    if duck_t.startswith("TIMESTAMP"):
        return a.startswith("timestamp")
    if duck_t.endswith("[]"):
        return a.startswith(("list", "large_list"))
    return a.startswith(OK.get(duck_t, ("<no-map>",)))

def main():
    if len(sys.argv) < 3:
        print("usage: typelint.py <verify_out_dir> <sf_dir> [--strict]",
              file=sys.stderr)
        sys.exit(2)
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    if not os.path.exists(oracle_path):
        print(f"ERROR: {oracle_path} not found", file=sys.stderr)
        sys.exit(2)
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = 0
    skipped = 0
    strict = "--strict" in sys.argv
    for name, sql in sorted(oracle.items()):
        duck = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: SKIP (no engine output)")
            skipped += 1
            continue
        schema = pq.read_schema(files[0])
        eng = {f.name: f.type for f in schema}
        if set(duck) != set(eng):
            print(f"{name}: COLS differ: oracle-only={set(duck)-set(eng)} "
                  f"engine-only={set(eng)-set(duck)}")
            bad += 1
            continue
        for c, dt in duck.items():
            if not arrow_ok(dt, eng[c]):
                print(f"{name}: {c}: duckdb={dt} vs engine={eng[c]}")
                bad += 1
    checked = len(oracle) - skipped
    skip_note = f", {skipped} skipped" if skipped else ""
    print(f"== {'CLEAN' if not bad else f'{bad} suspect column(s)'} "
          f"across {checked}/{len(oracle)} oracles{skip_note}")
    if strict and skipped:
        bad += skipped
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
