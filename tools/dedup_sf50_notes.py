#!/usr/bin/env python3
"""Assemble BENCHNOTES_SF50.md — the dedup/decontamination scale sweep
(r15 verdict item 4): the same 14 queries measured at sf5/sf25/sf50 in ONE
session (tiers built docs-only via `MakeHeavy <src> <out> {50,250,500}
documents`; Spark sweeps via BenchHeavy per tier, DuckDB per tier via
bench_compare.py), joined here into one per-query trend table.

Inputs (written by the campaign, see the file header it emits):
  target/dedup_sf{5,25,50}.json        BenchHeavy JSON lines (walls + stage)
  target/dedup_ratio_sf{5,25,50}.json  bench_compare ratio artifacts (duck)

Usage: python3 tools/dedup_sf50_notes.py > BENCHNOTES_SF50.md
"""
import json

TIERS = ["sf5", "sf25", "sf50"]


def bench(tier):
    s = open(f"target/dedup_{tier}.json").read()
    return json.loads(s[s.index("{"):])


def ratio(tier):
    return json.load(open(f"target/dedup_ratio_{tier}.json"))


def main():
    b = {t: bench(t) for t in TIERS}
    r = {t: ratio(t) for t in TIERS}
    queries = sorted(b["sf50"]["queries"],
                     key=lambda q: -b["sf50"]["queries"][q])
    host = r["sf50"]["host"]

    analysis = {}
    try:
        analysis = json.load(open("tools/bench_analysis.json")) \
            .get("BENCHNOTES_SF50.md", {})
    except FileNotFoundError:
        pass

    tot_s = {t: sum(b[t]["queries"].values()) for t in TIERS}
    tot_d = {t: r[t]["duck_total_s"] for t in TIERS}

    print("# BENCHNOTES_SF50 — the dedup/decontamination family at "
          "sf5 / sf25 / sf50")
    print()
    print(f"Scale tiers: `target/bench_dedup/sf{{5,25,50}}` — 250k / 1.25M / "
          f"2.5M replica-distinct documents (50/250/500 word-suffixed copies "
          f"of the 5k-doc sf0.1 fixture; documents-only tiers, every query "
          f"in this family reads only that table). Spark `local[32]` "
          f"steady-state (post-warmup, lower-median of 3 pass-major sweeps, "
          f"toRdd drain forcing), DuckDB {host['duckdb']} same host with a "
          f"spill temp_directory, same SQL as the correctness oracle. ALL "
          f"six engine columns measured in ONE session on one host "
          f"(generated {r['sf50']['generated_utc']}) — the host-variance "
          f"protocol; do not splice these walls with other files'.")
    print()
    print(f"**Totals: Spark {tot_s['sf50']:.1f}s, DuckDB {tot_d['sf50']:.1f}s "
          f"over {len(queries)} queries at sf50** "
          f"({tot_s['sf50'] / tot_d['sf50']:.2f}x); "
          f"sf25: {tot_s['sf25']:.1f}s vs {tot_d['sf25']:.1f}s "
          f"({tot_s['sf25'] / tot_d['sf25']:.2f}x); "
          f"sf5: {tot_s['sf5']:.1f}s vs {tot_d['sf5']:.1f}s "
          f"({tot_s['sf5'] / tot_d['sf5']:.2f}x).", end="")
    note = analysis.get("_header_note", "")
    print(f" {note}" if note else "")
    print()
    print("`stage s` = executor stage-compute sum for the median run "
          "(wall minus stage ≈ the fixed driver/AQE scheduling floor); "
          "`ratio` = spark wall / duckdb wall at that tier. A dash means "
          "the oracle timed out or failed at that tier.")
    print()
    hdr = ["query"]
    for t in TIERS:
        hdr += [f"{t} spark s", f"{t} stage s", f"{t} duck s", f"{t} ratio"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for q in queries:
        cells = [q]
        for t in TIERS:
            w = b[t]["queries"].get(q)
            c = b[t].get("stage_compute", {}).get(q)
            pq = r[t]["per_query"].get(q, {})
            d = pq.get("duck_s")
            rt = pq.get("ratio")
            cells += [f"{w:.2f}" if w is not None else "—",
                      f"{c:.2f}" if c is not None else "—",
                      f"{d:.2f}" if d is not None else "—",
                      f"{rt:.2f}x" if rt is not None else "—"]
        print("| " + " | ".join(cells) + " |")
    notes = {k: v for k, v in analysis.items() if not k.startswith("_")}
    if notes:
        print()
        print("## Notes")
        print()
        for q in queries:
            if q in notes:
                print(f"- **{q}** — {notes[q]}")


if __name__ == "__main__":
    main()
