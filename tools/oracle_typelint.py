#!/usr/bin/env python3
"""Oracle result-type lint.

Runs every oracle SQL through DuckDB (planning only — no rows fetched) and
flags result columns whose DuckDB type widens past what a pandas/pyarrow
fetch preserves losslessly: HUGEINT / UHUGEINT / DECIMAL. Those convert to
float64 driver-side ("-165646.0" vs Spark's int64 "-165646"), which breaks
the driver's hash compare even when every value matches — the l28 lesson
from round 11, and the second typing-class escape after the round-10
forcing lesson. An uncast SUM() over BIGINT is the usual culprit: DuckDB
widens it to HUGEINT; the fix is CAST(SUM(..) AS BIGINT) in the oracle.

Usage: python3 tools/oracle_typelint.py <sfDir> <oracle_sql.json> [more.json]
Exit 0 = clean, 1 = at least one flagged column or oracle error.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir = sys.argv[1]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = {}
    for path in sys.argv[2:]:
        blob = json.load(open(path))
        for name, sql in blob.items():
            # tolerance_sql.json entries are {duck, exact, eps} dicts — lint
            # both SQL legs; plain oracle_sql.json entries are SQL strings
            if isinstance(sql, dict):
                for leg in ("duck", "exact"):
                    if sql.get(leg):
                        oracles[f"{name}:{leg}"] = sql[leg]
            else:
                oracles[name] = sql
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols = list(rel.columns)
            types = [str(t).upper() for t in rel.types]
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        offenders = [f"{c}:{t}" for c, t in zip(cols, types)
                     if any(b in t for b in BANNED)]
        if offenders:
            print(f"FAIL {name}: " + ", ".join(offenders))
            n_bad += 1
    verdict = "CLEAN" if n_bad == 0 else "DIRTY"
    print(f"{verdict}: {len(oracles)} oracle legs linted, {n_bad} flagged")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
