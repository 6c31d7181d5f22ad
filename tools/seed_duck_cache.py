#!/usr/bin/env python3
"""Seed a bench_compare.py --duck-cache file from an already-published
BENCHNOTES table, so extending a tier re-measures only the NEW queries'
DuckDB side (the incremental-regen path: BenchHeavy subset run →
merge_bench.py → bench_compare.py --duck-cache=...).

The seeded entry records md5(current oracle SQL) — which protects against
edits made AFTER seeding, but NOT against oracles that changed BETWEEN the
table's publication and this seeding (the published time would be stamped
with the new SQL's md5 and silently served for different semantics — this
bit round 15's warm serving-loop rows). Pass every query whose oracle
changed since the source table was published via --exclude.

Usage: seed_duck_cache.py <BENCHNOTES.md> <oracle_sql.json> <sf_dir> <out.json> \
           [--exclude=q1,q2,...]
"""
import hashlib
import json
import re
import sys


def main():
    notes, oracle_path, sf_dir, out = [a for a in sys.argv[1:] if not a.startswith("--")][:4]
    exclude = set()
    for a in sys.argv[1:]:
        if a.startswith("--exclude="):
            exclude.update(x for x in a.split("=", 1)[1].split(",") if x)
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
        if name in exclude:
            continue
        cache[name] = {"sql_md5": hashlib.md5(oracle[name].encode()).hexdigest(),
                       "sf_dir": sf_dir, "s": duck}
    with open(out, "w") as f:
        json.dump(cache, f, indent=1)
    print(f"{out}: seeded {len(cache)} DuckDB timings from {notes}")


if __name__ == "__main__":
    main()
