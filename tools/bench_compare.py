#!/usr/bin/env python3
"""Produce BENCHNOTES.md: per-query Spark (graft.Bench JSON line on stdin)
vs DuckDB (same oracle SQL) at the same scale factor.

Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Bench" 2>/dev/null \
         | grep '"metric"' | python3 tools/bench_compare.py <sfDir> <oracleJson>
"""
import json
import os
import sys
import time

import duckdb

# Hand-maintained per-query performance analyses (tools/bench_analysis.json:
# {"<benchnotes file>": {"<query>": "<note>"}}). Rendered as a Notes section
# so regeneration never loses the written analysis the >2x entries require.
ANALYSIS_PATH = os.path.join(os.path.dirname(__file__), "bench_analysis.json")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def make_connection(sf_dir):
    """Fresh DuckDB connection with one view per fixture table (shared by
    the initial bootstrap and the stuck-oracle recovery path).

    The connection gets a temp_directory: an IN-MEMORY DuckDB has none by
    default, so a heavy oracle (the sf25+ unnest/window replays) aborts
    with a native OOM instead of spilling — which a file-backed production
    DuckDB would never do. The spill dir makes the comparison fair to
    DuckDB (it can only help the oracle column) and keeps one runaway
    query from taking the whole regen down (the r16 sf50 campaign lost two
    invocations to the system-wide allocation pressure of an un-spillable
    l24)."""
    con = duckdb.connect()
    tmp = os.path.join(os.path.dirname(__file__), "..", "target", "duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{os.path.abspath(tmp)}'")
    # no explicit memory_limit: the default (80% of physical RAM) is
    # host-correct on any box, and with a temp_directory set DuckDB spills
    # at that ceiling instead of dying — a hardcoded figure would RAISE
    # the ceiling above RAM on smaller hosts and reintroduce the OOM
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: a dir of part files
            p += "/*.parquet"
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--out=")), "BENCHNOTES.md")
    recall_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                        if a.startswith("--recall=")), None)
    stream_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                        if a.startswith("--stream=")), None)
    sf_dir, oracle_path = args[0], args[1]
    line = sys.stdin.read()
    bench = json.loads(line[line.index("{"):])
    # Bench's stdout line is compacted to fit the round driver's ~2000-char
    # capture window (slowest queries only); the full per-query map lives in
    # the file named by "full" (BENCHFULL.json, written next to the build).
    if "full" in bench and len(bench.get("queries", {})) < bench.get("queries_total", 0):
        full = json.load(open(bench["full"]))
        full.update({k: v for k, v in bench.items() if k not in full})
        bench = full
    con = make_connection(sf_dir)
    oracle = json.load(open(oracle_path))
    compute = bench.get("stage_compute", {})
    rows = []
    duck_cache = {}  # per-SQL memo: a _bucketed row reuses its base's measurement
    # persistent cross-run cache (--duck-cache=path.json): adding one query
    # to a tier re-measures ONLY that query's DuckDB side instead of the
    # whole suite (the l21/l22 unrolled-CTE oracles cost ~260s each at sf5,
    # which made every heavy regen a ~37-min ritual). Entries are keyed by
    # query name and validated against md5(sql) + sf_dir, so an oracle edit
    # or tier switch invalidates exactly the stale rows. Seed from an
    # already-published BENCHNOTES table with tools/seed_duck_cache.py.
    import hashlib
    cache_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                       if a.startswith("--duck-cache=")), None)
    pcache = {}
    served_from_cache = set()  # RATIO provenance: not timed this session
    if cache_path and os.path.exists(cache_path):
        pcache = json.load(open(cache_path))
    def cache_key(sql):
        return hashlib.md5(sql.encode()).hexdigest()
    for name, spark_s in sorted(bench["queries"].items()):
        # a _bucketed variant computes the same result as its base query:
        # reuse the base oracle SQL for the DuckDB baseline
        if name not in oracle and name.endswith("_bucketed"):
            base = name[: -len("_bucketed")]
            for cand in (base, base + "_shipping_priority", base + "_revenue_by_nation",
                         base + "_topk_per_group"):
                if cand in oracle:
                    oracle[name] = oracle[cand]
                    break
        if name in oracle:
            sql = oracle[name]
            hit = pcache.get(name)
            if hit is not None and hit.get("sql_md5") == cache_key(sql) \
                    and hit.get("sf_dir") == sf_dir:
                duck_cache.setdefault(sql, hit["s"])
                served_from_cache.add(name)
            if sql in duck_cache:
                duck_s = duck_cache[sql]
            else:
                # bound each oracle run: some replays are super-linear in
                # DuckDB at heavy tiers (recursive-CTE reachability, banded
                # self-joins) — a hung oracle must not hang the regen
                timeout_s = float(next(
                    (a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--duck-timeout=")), "300"))
                import threading
                t0 = time.time()
                box = {}

                def run():
                    try:
                        con.sql(sql).fetchall()
                        box["s"] = time.time() - t0
                    except Exception as e:
                        box["err"] = e

                th = threading.Thread(target=run, daemon=True)
                try:
                    th.start()
                    th.join(timeout_s)
                except RuntimeError:
                    # can't start a thread: a heavy spilling oracle can
                    # saturate vm.max_map_count (observed: 65k maps during
                    # the sf25/sf50 l24 replay), and pthread_create then
                    # fails process-wide. Time the query inline — the
                    # timeout guard is lost for this one oracle, but the
                    # regen survives instead of dying mid-campaign.
                    print(f"thread spawn failed; timing {name} inline "
                          "(no timeout guard — consider raising "
                          "vm.max_map_count)", file=sys.stderr)
                    run()
                if th.is_alive():
                    con.interrupt()
                    th.join(30)
                    if th.is_alive():
                        # the interrupt was not honored: the stuck query may
                        # still hold this connection, so timings on it are
                        # unreliable — start a fresh one (views are cheap)
                        print(f"oracle interrupt not honored for {name}; "
                              "recreating DuckDB connection", file=sys.stderr)
                        con = make_connection(sf_dir)
                    print(f"oracle TIMED OUT for {name} after {timeout_s}s",
                          file=sys.stderr)
                    duck_s = None
                elif "err" in box:  # missing table / unsupported SQL: render as —
                    print(f"oracle failed for {name}: {box['err']}", file=sys.stderr)
                    duck_s = None
                    # a failed oracle (OOM especially) can poison the shared
                    # connection's memory accounting — every later query then
                    # fails with "Failed to allocate 8 bytes" (measured on
                    # the sf25 regen). Isolate the failure: fresh connection.
                    con = make_connection(sf_dir)
                else:
                    duck_s = box["s"]
                duck_cache[sql] = duck_s
            if cache_path:
                pcache[name] = {"sql_md5": cache_key(sql), "sf_dir": sf_dir,
                                "s": duck_s}
        else:
            duck_s = None
        rows.append((name, spark_s, duck_s, compute.get(name)))
    if cache_path:
        with open(cache_path, "w") as f:
            json.dump(pcache, f, indent=1)
    failed = [r[0] for r in rows if r[1] is not None and r[1] < 0]
    if failed:
        print(f"SPARK FAILURES (recorded as -1 by Bench): {failed}", file=sys.stderr)
    total_spark = sum(r[1] for r in rows if r[1] is not None and r[1] >= 0)
    total_duck = sum(r[2] for r in rows if r[2] is not None)
    # --ratio-out=RATIO_rN.json: the machine-readable same-host ratio
    # artifact the r14 verdict asked for — the graded bench carries its
    # own denominator instead of prose. Spark walls come from the Bench
    # line on stdin; DuckDB walls were timed by THIS process, so when the
    # two commands run back-to-back (tools/ratio.sh) both columns are one
    # host, one session. Cache-served duck entries are flagged: a ratio
    # artifact with cached rows is NOT a same-session measurement.
    ratio_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                      if a.startswith("--ratio-out=")), None)
    if ratio_out:
        import datetime
        import platform
        matched = [(n, s, d) for n, s, d, _ in rows
                   if s is not None and s >= 0 and d is not None]
        ms = sum(s for _, s, _ in matched)
        md = sum(d for _, _, d in matched)
        payload = {
            "generated_utc":
                datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "host": {"hostname": platform.node(), "cpus": os.cpu_count(),
                     "loadavg": list(os.getloadavg()),
                     "duckdb": duckdb.__version__},
            "sf_dir": sf_dir,
            "provenance": ("spark walls = graft.Bench line on stdin; duckdb "
                           "walls timed by tools/bench_compare.py in the same "
                           "invocation (tools/ratio.sh runs them back-to-back "
                           "on one host)"),
            "n_matched": len(matched),
            "n_duck_cached": len(served_from_cache),
            "spark_total_s": round(ms, 3),
            "duck_total_s": round(md, 3),
            "ratio": round(ms / md, 4) if md else None,
            "per_query": {n: {"spark_s": round(s, 4), "duck_s": round(d, 4),
                              "ratio": round(s / d, 3) if d else None,
                              **({"duck_cached": True}
                                 if n in served_from_cache else {})}
                          for n, s, d in matched},
            "spark_unmatched_s": {n: round(s, 4) for n, s, d, _ in rows
                                  if s is not None and s >= 0 and d is None},
        }
        with open(ratio_out, "w") as f:
            json.dump(payload, f, indent=1)
        # guard md == 0 like the JSON 'ratio' field: a subset run with no
        # oracle-matched query must still report the written artifact
        ratio_str = f"{ms / md:.2f}x" if md else "n/a"
        print(f"ratio artifact -> {ratio_out}: spark {ms:.1f}s / duck "
              f"{md:.1f}s = {ratio_str} over {len(matched)} queries"
              + (f" ({len(served_from_cache)} duck walls from cache)"
                 if served_from_cache else ""), file=sys.stderr)
    analysis = {}
    if os.path.exists(ANALYSIS_PATH):
        analysis = json.load(open(ANALYSIS_PATH)).get(os.path.basename(out_path), {})
    with open(out_path, "w") as f:
        f.write(f"# {out_path.rsplit('.', 1)[0]} — Spark (graft) vs DuckDB on the oracle queries\n\n")
        f.write(f"Scale: `{sf_dir}`; Spark `local[32]` steady-state (post-warmup), "
                f"DuckDB {duckdb.__version__} same host, same SQL as the correctness oracle.\n\n")
        failed_note = f" **{len(failed)} queries FAILED: {', '.join(failed)}.**" if failed else ""
        header_note = analysis.get("_header_note", "")
        if header_note:
            header_note = " " + header_note
        f.write(f"**Totals: Spark {total_spark:.1f}s, DuckDB {total_duck:.1f}s over "
                f"{len(rows) - len(failed)} queries.**{failed_note}{header_note} "
                f"Per-query ratios at this scale still carry a fixed Spark "
                f"job-scheduling term per query (~0.05-0.15s after the r15 "
                f"floor work), so sub-second rows price overhead, not "
                f"asymptotic cost — tier trends live in BENCHNOTES_HEAVY/"
                f"CROSSOVER.\n\n")
        def fmt(row_name, spark_val, cells):
            # a query that failed every sweep is a FAILURE row, not a timing
            if spark_val is not None and spark_val < 0:
                return f"| {row_name} | FAILED | " + " | ".join("—" for _ in cells) + " |\n"
            return None

        has_compute = any(r[3] is not None for r in rows)
        if has_compute:
            f.write("`stage s` is the sum of executor stage runtimes for the median "
                    "run — wall minus stage is the fixed driver/AQE stage-scheduling "
                    "floor (~0.3s per plan stage), invariant to data size; "
                    "`compute ratio` = stage s / duckdb s.\n\n")
            f.write("| query | spark wall s | stage s | duckdb s | wall ratio | compute ratio |\n|---|---|---|---|---|---|\n")
            for name, s, d, c in sorted(rows, key=lambda r: -r[1]):
                failed = fmt(name, s, range(4))
                if failed:
                    f.write(failed)
                elif d is not None and d > 0:
                    f.write(f"| {name} | {s:.2f} | {c:.2f} | {d:.2f} | {s / d:.1f}x | {c / d:.1f}x |\n")
                else:
                    f.write(f"| {name} | {s:.2f} | {c:.2f} | — | — | — |\n")
        else:
            f.write("| query | spark s | duckdb s | ratio |\n|---|---|---|---|\n")
            for name, s, d, _ in sorted(rows, key=lambda r: -r[1]):
                failed = fmt(name, s, range(2))
                if failed:
                    f.write(failed)
                elif d is not None and d > 0:
                    f.write(f"| {name} | {s:.2f} | {d:.2f} | {s / d:.1f}x |\n")
                else:
                    f.write(f"| {name} | {s:.2f} | — | — |\n")
        notes = {}
        if os.path.exists(ANALYSIS_PATH):
            notes = {k: v for k, v in analysis.items() if not k.startswith("_")}
        if notes:
            f.write("\n## Notes on entries above the 2x compute gate\n\n")
            for name in sorted(notes):
                f.write(f"- **{name}**: {notes[name]}\n")
        if recall_path and os.path.exists(recall_path):
            r = json.load(open(recall_path))
            f.write(
                "\n## ANN recall vs knob (graft.tools.AnnRecall)\n\n"
                f"Exact top-{r['topk']} ground truth for {r['queries']} sampled "
                f"queries ({r['truth_pairs']} true (query, neighbor) pairs) over "
                f"{r['n']} vectors (dim {r['dim']}); a pair counts as recovered "
                "iff the index's candidate condition admits it (band signature "
                "collision / probed inverted list). `sized` = "
                f"{r['sized_bits']} bits (the log2(N/32) rule).\n\n"
                "Read the ABSOLUTE numbers against the fixture's geometry: "
                "these embeddings are near-isotropic, so even true top-10 "
                "neighbors sit at weak cosines (~0.3-0.5) where hyperplane "
                "LSH is legitimately near its random floor (per-plane "
                "agreement p = 1 - theta/pi barely above 1/2). A real "
                "near-dup corpus screens for cos >= 0.9 pairs (p >= 0.9, "
                "p^bits >= 0.43 at 8 bits), where the same index recovers "
                "most pairs in a handful of bands. The SLOPES are the "
                "transferable result: recall rises ~linearly in bands at "
                "fixed width, and the sized width's selectivity loss is "
                "recoverable by banding — while its candidate volume stays "
                "collision-bound.\n\n")
            f.write("| knob | seeded 8-bit | seeded sized | axis 8-bit | ivf |\n"
                    "|---|---|---|---|---|\n")
            def col(rows):
                return {e["k"]: e["recall"] for e in rows}
            s8, ss = col(r["seeded_8bit"]), col(r["seeded_sized"])
            ax, ivf = col(r["axis_8bit"]), col(r["ivf"])
            ks = sorted(set(s8) | set(ss) | set(ax) | set(ivf))
            for k in ks:
                def c(m, label):
                    return f"{m[k]:.3f}" if k in m else "—"
                f.write(f"| {k} | {c(s8,'')} | {c(ss,'')} | {c(ax,'')} | {c(ivf,'')} |\n")
            f.write("\nLSH knob = bands; IVF knob = nProbe. Recall for LSH rises "
                    "with bands at fixed width; the sized width trades per-band "
                    "recall for collision-bound buckets and earns it back in "
                    "bands — the scale posture argument made measurable. The "
                    "cos >= 0.9 operating-point claim is MEASURED in the "
                    "planted-near-dup section below, not argued.\n")
            if "pq_adc" in r:
                f.write("\nPQ (l3l/l3m) is rank-based rather than "
                        "candidate-condition-based — ADC scores every vector, "
                        "so the knob is the shortlist size R a deployment "
                        "re-ranks exactly (the l3j two-stage pattern): a true "
                        "top-10 neighbor counts as recovered iff its "
                        "asymmetric-distance rank lands within R.\n\n"
                        "| shortlist R | ADC recall | chance (R/n) |\n|---|---|---|\n")
                for e in r["pq_adc"]:
                    f.write(f"| {e['k']} | {e['recall']:.3f} "
                            f"| {e['k'] / r['n']:.4f} |\n")
                f.write("\nAbsolute levels share the isotropic-fixture caveat "
                        "above: 16 centroids per subspace is a coarse cell "
                        "relative to the weak true-neighbor cosines, yet ADC "
                        "beats the chance column ~30x at every R — and on a "
                        "real near-dup corpus (planted section) the same "
                        "codes separate sharply. The R-slope is the "
                        "transferable result; production raises K to 256 "
                        "per subspace (8-bit codes) for finer cells at the "
                        "same plan shape.\n")
            if "pq256_adc" in r:
                pq256 = ", ".join(f"{e['recall']:.3f}@R={e['k']}"
                                  for e in r["pq256_adc"])
                f.write("\nProduction width MEASURED (l3m_sized/l3n_sized: "
                        "K=256 per subspace, 8-bit codes, sampled Lloyd fit "
                        "+ compiled pq_encode): ADC rank recall "
                        f"{pq256} on the same truth pairs — the finer-cells "
                        "claim above, priced at the same plan shape.\n")
        planted_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                             if a.startswith("--planted=")), None)
        if planted_path and os.path.exists(planted_path):
            pr = json.load(open(planted_path))
            f.write(
                "\n## Planted-near-dup recall (graft.tools.PlantedRecall)\n\n"
                "Near-duplicates PLANTED at exactly known cosines (v' = "
                "|v|·(c·v̂ + sqrt(1-c²)·û), seeded orthogonal direction û; "
                "`measured` = mean cosine after float storage rounds it) — "
                "the regime a dedup pipeline actually screens, measured "
                "instead of extrapolated from the isotropic fixture's weak-"
                f"cosine top-k. {pr['n']} corpus vectors, dim {pr['dim']}, "
                f"sized = {pr['sized_bits']} bits.\n")
            for tier in pr["tiers"]:
                f.write(f"\n**cos = {tier['cos']}** (measured "
                        f"{tier['measured_cos']:.5f}, {tier['pairs']} pairs)\n\n")
                f.write("| knob | seeded 8-bit | seeded sized | axis 8-bit | ivf |\n"
                        "|---|---|---|---|---|\n")
                def col2(rows):
                    return {e["k"]: e["recall"] for e in rows}
                s8, ss = col2(tier["seeded_8bit"]), col2(tier["seeded_sized"])
                ax, ivf = col2(tier["axis_8bit"]), col2(tier["ivf"])
                for k in sorted(set(s8) | set(ss) | set(ax) | set(ivf)):
                    def c2(m):
                        return f"{m[k]:.3f}" if k in m else "—"
                    f.write(f"| {k} | {c2(s8)} | {c2(ss)} | {c2(ax)} | {c2(ivf)} |\n")
                if tier.get("pq_adc"):
                    pq = ", ".join(f"{e['recall']:.2f}@R={e['k']}"
                                   for e in tier["pq_adc"])
                    f.write(f"\nPQ ADC rank recall of the ORIGINAL from the "
                            f"re-ingested copy ({tier.get('pq_pairs', 0)} "
                            f"subsampled pairs): {pq}.\n")
        if stream_path and os.path.exists(stream_path):
            runs = json.load(open(stream_path))
            f.write(
                "\n## Streaming state at scale (graft.tools.StreamHeavy)\n\n"
                "Heavy parquet replayed as a file stream (`files/trig` of the "
                "32-file layout per trigger), transformWithState on RocksDB, "
                "noop sink (transform + state cost only). `state rows` / "
                "`state MB` are the LAST batch's state-operator totals — the "
                "trajectory shows whether state plateaus (bounded keyspace) "
                "or tracks the stream. Rows at different `files/trig` price "
                "the latency/throughput trade: per-trigger state-commit cost "
                "is fixed, so bigger micro-batches amortize it.\n\n")
            f.write("| query | files/trig | rows | batches | wall s | rows/s | state rows (per-batch) | final state MB |\n"
                    "|---|---|---|---|---|---|---|---|\n")
            for r in runs:
                traj = " → ".join(str(b["state_rows"]) for b in r["batches"])
                mb = r["batches"][-1]["state_bytes"] / 1e6 if r["batches"] else 0
                f.write(f"| {r['query']} | {r['files_per_trigger']} "
                        f"| {r['total_rows']} | {r['n_batches']} "
                        f"| {r['wall_s']} | {r['rows_per_s']} | {traj} | {mb:.1f} |\n")
    print(f"{out_path} written: spark {total_spark:.1f}s vs duckdb {total_duck:.1f}s")


if __name__ == "__main__":
    main()
