#!/usr/bin/env python3
"""Merge several graft BenchHeavy JSON lines into one (for the split sf25
protocol: the text/dedup subset runs as one interleaved sweep; each ANN
query runs in its own JVM so a ~100s contender can't sit in every sweep and
poison the others' samples through sustained heap pressure — see
BenchHeavy.SF25_QUERIES). Later files win on key collisions; totals are
recomputed. Usage: merge_bench.py out.json in1.json in2.json ...
"""
import json
import sys


def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    merged = None
    for p in ins:
        line = open(p).read()
        b = json.loads(line[line.index("{"):])
        if merged is None:
            merged = b
        else:
            merged.setdefault("queries", {}).update(b.get("queries", {}))
            # setdefault: an older/partial first input may lack the key
            merged.setdefault("stage_compute", {}).update(b.get("stage_compute", {}))
            merged["failed"] = sorted(set(merged.get("failed", []))
                                      | set(b.get("failed", [])))
    merged["value"] = sum(v for v in merged["queries"].values() if v >= 0)
    with open(out_path, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print(f"{out_path}: {len(merged['queries'])} queries, "
          f"total {merged['value']:.1f}s")


if __name__ == "__main__":
    main()
