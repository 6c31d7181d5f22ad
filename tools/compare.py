#!/usr/bin/env python3
"""Local pre-verification mirroring the driver's DuckDB oracle check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the same tables, then
compares: columns sorted by name, rows sorted, values compared exactly
(doubles compared bit-exactly, which is what a hash compare sees).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)  # full precision; bit-exact compare
            vals.append(str(v) if v is not None else "\x00NULL")
        out.append(tuple(vals))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            duck = con.sql(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL {name}: schema mismatch spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(dr) != len(sr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(dr)} rows differ; first at {i} (cols {dc}):")
            print(f"  spark={a}")
            print(f"  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(dr)} rows)")
            n_pass += 1
    # sketch queries (a6b/a14) need no special path since r15: their band
    # verdict is computed IN the row (Relational.a6bApproxDistinctBanded)
    # and the oracle hash-anchors the exact count + asserts band_ok=true
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
