#!/usr/bin/env python3
"""Rebuild a BenchHeavy-shaped JSON line from a published BENCHNOTES table —
the recovery path for tiers whose per-run JSONs predate the run log
(target/bench_heavy_runs.jsonl, kept since round 9). The Spark walls and
stage seconds are carried over from the published table exactly as
seed_duck_cache.py carries the DuckDB timings; merge the result with a
fresh subset run (tools/merge_bench.py) to extend the tier without
re-measuring it.

Usage: notes_to_bench.py <BENCHNOTES.md> <sf_dir> <out.json>
"""
import json
import re
import sys


def main():
    notes, sf_dir, out = sys.argv[1:4]
    queries, compute = {}, {}
    for line in open(notes):
        if line.startswith("## "):
            break  # only the leading timings table; recall/streaming
            # sections have their own numeric tables
        m = re.match(r"\|\s*([a-z][a-z0-9_]*)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.—]+)\s*\|", line)
        if not m:
            continue
        name, wall, stage = m.groups()
        # only the first (timings) table matches: recall tables have a
        # numeric knob in the name cell and fail the [a-z] anchor
        queries[name] = float(wall)
        if stage != "—":
            try:
                compute[name] = float(stage)
            except ValueError:
                pass
    b = {"metric": "heavy_total", "value": sum(queries.values()), "unit": "sec",
         "queries": queries, "stage_compute": compute, "sf": sf_dir,
         "failed": []}
    with open(out, "w") as f:
        f.write(json.dumps(b) + "\n")
    print(f"{out}: {len(queries)} queries rebuilt from {notes}")


if __name__ == "__main__":
    main()
