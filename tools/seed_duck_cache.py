#!/usr/bin/env python3
"""Seed a bench_compare.py --duck-cache file from an already-published
BENCHNOTES table, so extending a tier re-measures only the NEW queries'
DuckDB side (the incremental-regen path: BenchHeavy subset run →
merge_bench.py → bench_compare.py --duck-cache=...).

The seeded entry records md5(current oracle SQL): if an oracle was edited
since the table was published, its seed self-invalidates and that query is
re-measured — the cache can never silently serve a timing for SQL that no
longer matches.

Usage: seed_duck_cache.py <BENCHNOTES.md> <oracle_sql.json> <sf_dir> <out.json>
"""
import hashlib
import json
import re
import sys


def main():
    notes, oracle_path, sf_dir, out = sys.argv[1:5]
    oracle = json.load(open(oracle_path))
    cache = {}
    for line in open(notes):
        # data rows: | name | spark | [stage |] duckdb | ratio[s] ... |
        m = re.match(r"\|\s*([a-z][a-z0-9_]*)\s*\|", line)
        if not m:
            continue
        name = m.group(1)
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        # duckdb s is the cell immediately before the first ratio ("12.3x")
        # cell; rows without a DuckDB measurement have "—" there and are
        # skipped (they must be measured, not seeded)
        ratio_idx = next((i for i, c in enumerate(cells)
                          if re.fullmatch(r"[0-9.]+x", c)), None)
        if ratio_idx is None or ratio_idx == 0:
            continue
        try:
            duck = float(cells[ratio_idx - 1])
        except ValueError:
            continue
        if name not in oracle:
            continue
        cache[name] = {"sql_md5": hashlib.md5(oracle[name].encode()).hexdigest(),
                       "sf_dir": sf_dir, "s": duck}
    with open(out, "w") as f:
        json.dump(cache, f, indent=1)
    print(f"{out}: seeded {len(cache)} DuckDB timings from {notes}")


if __name__ == "__main__":
    main()
