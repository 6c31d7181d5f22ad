#!/usr/bin/env python3
"""Host-invariant round-over-round regression gate (r14 verdict item 3).

Walls drift +/-25% with the per-round host re-provision, so comparing two
rounds' BENCH totals says nothing about the code. Plan metrics don't
drift with the host: exchange bytes, spill bytes and scan counts are
properties of the PLAN. graft.Bench records them per query (the "plan"
map in BENCHFULL.json: {name: [rows_out, exchange_bytes, spill_bytes,
scans]}); this tool diffs two such artifacts and flags exactly the
signatures the r14 builder bisected by hand:

  - a spill appearing (0 -> >0) or growing >2x
  - a scan count changing at all (a reused subtree starting to re-inline)
  - exchange bytes moving outside [1/1.5, 1.5x] (a broadcast silently
    becoming a shuffle, a pre-aggregation disappearing)
  - a query appearing/disappearing or starting to fail

Exit code: 0 = no drift, 1 = drift found (use as a gate), 2 = can't
compare (old artifact has no plan map — pre-r15).

Usage: bench_drift.py <old BENCHFULL.json> <new BENCHFULL.json>
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    return d.get("plan") or {}, set(d.get("failed") or []), d


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, old_failed, old_d = load(old_path)
    new, new_failed, new_d = load(new_path)
    if not old:
        print(f"NO BASELINE: {old_path} has no plan map (pre-r15 artifact); "
              "nothing to diff")
        sys.exit(2)
    drift = []
    for name in sorted(set(old) | set(new)):
        if name not in new:
            drift.append(f"{name}: REMOVED from suite")
            continue
        if name not in old:
            print(f"note: {name}: new query (no baseline)")
            continue
        _, ox, osp, osc = old[name]
        _, nx, nsp, nsc = new[name]
        if osp == 0 and nsp > 0:
            drift.append(f"{name}: SPILL APPEARED ({nsp} bytes)")
        elif osp > 0 and nsp > 2 * osp:
            drift.append(f"{name}: spill grew >2x ({osp} -> {nsp})")
        if osc != nsc and osc >= 0 and nsc >= 0:
            drift.append(f"{name}: scan count {osc} -> {nsc}")
        if ox > 0 and nx >= 0 and not (ox / 1.5 <= nx <= ox * 1.5):
            drift.append(f"{name}: exchange bytes {ox} -> {nx} "
                         f"({nx / ox:.2f}x)")
    for name in sorted(new_failed - old_failed):
        drift.append(f"{name}: started FAILING")
    if drift:
        print(f"PLAN DRIFT ({len(drift)} findings) "
              f"{old_path} -> {new_path}:")
        for d in drift:
            print(f"  {d}")
        sys.exit(1)
    print(f"no plan drift across {len(set(old) & set(new))} queries "
          f"({old_path} -> {new_path})")
    sys.exit(0)


if __name__ == "__main__":
    main()
