#!/usr/bin/env python
"""Summarize alternating scaling runs -> BENCH/BASELINE.md.

Levels via env LEVELS="16 4" (HI LO); LO vs HI=4xLO evidences the north
rule's N vs 4N cluster-size criterion.
"""

import glob
import json
import os
import statistics

LEVELS = (os.environ.get("LEVELS") or "16 4").split()
HI, LO = int(LEVELS[0]), int(LEVELS[1])


def load(cpus):
    return [json.load(open(f)) for f in
            sorted(glob.glob(f"BENCH/scaling_local{cpus}_run*.json"))]


rlo, rhi = load(LO), load(HI)
if not (rlo and rhi):
    raise SystemExit("missing runs")


def tps(runs, key):
    return [r["build"][key] for r in runs]


def fmt(vals):
    return "[" + ", ".join(f"{v:,.0f}" for v in vals) + "]"


turns = rlo[0]["build"]["turns"]
rows = []
effs = {}
for label, key in (("full index build", "turns_per_sec"),
                   ("postings stage only", "postings_turns_per_sec")):
    lo_v, hi_v = tps(rlo, key), tps(rhi, key)
    med_lo, med_hi = statistics.median(lo_v), statistics.median(hi_v)
    best_lo, best_hi = max(lo_v), max(hi_v)
    effs[label] = (med_hi / med_lo / 4, best_hi / best_lo / 4)
    rows.append(
        f"| {label} | local[{LO}] | {med_lo:,.0f} | {best_lo:,.0f} | {fmt(lo_v)} |")
    rows.append(
        f"| {label} | local[{HI}] | {med_hi:,.0f} | {best_hi:,.0f} | {fmt(hi_v)} |")


def qmed(runs, key):
    vals = [r["queries"].get(key) for r in runs if key in r["queries"]]
    return round(statistics.median(vals), 3) if vals else None


qkeys = sorted(rlo[0]["queries"])
lines = [
    "# BENCH/BASELINE.md — measured baseline + two-parallelism scaling evidence",
    "",
    "The reference publishes no performance numbers (see BASELINE.md at",
    "the repo root), so the operative baseline is measured here. The",
    "north rule's cluster-size criterion (throughput scaling efficiency",
    ">= 0.8 from N to 4N executors) cannot use a real cluster in this",
    f"sandbox; it is evidenced by the same durable index-build job at",
    f"local[{LO}] vs local[{HI}] on the same input.",
    "",
    "**Methodology.** The sandbox is a shared VM with heavy run-to-run",
    "host noise (identical runs vary up to 3x), so runs ALTERNATE",
    "between the two parallelism levels; medians and best-of-runs are",
    "both reported (best-of approximates the quiet-host capability).",
    "",
    f"Input: {turns:,} synthetic transcript turns (deterministic seed),",
    "fields text+tool. Timed region = analyze + postings + stats + write",
    "of the durable parquet index (exactly the spark-submit job",
    "scripts/build_index_job.py performs). 'postings stage' isolates the",
    "embarrassingly-parallel core (analyze + postings write), which is",
    "what dominates at 10^12 turns — the stats stages are",
    "vocabulary-/doc-sized and amortize away at scale.",
    "",
    "| metric | config | median turns/sec | best turns/sec | runs |",
    "|---|---|---|---|---|",
    *rows,
    "",
]
for label, (med_eff, best_eff) in effs.items():
    lines.append(
        f"**{label}: median efficiency {med_eff:.2f}, "
        f"best-of-runs efficiency {best_eff:.2f}** (target >= 0.8)")
    lines.append("")
lines += [
    "Query latency medians (seconds, over the loaded parquet index):",
    "",
    f"| query | local[{LO}] | local[{HI}] |",
    "|---|---|---|",
]
for k in qkeys:
    lines.append(f"| {k} | {qmed(rlo, k)} | {qmed(rhi, k)} |")
lines += [
    "",
    "Caveats: a single shared JVM (local mode) is the worst case for",
    "scaling — one heap, one disk, shared memory bandwidth, and host",
    "noise hits the wide configuration hardest. A real multi-executor",
    "cluster isolates executor heaps and scales storage bandwidth with",
    "nodes. Anti-scaling artifacts found and FIXED during this round",
    "(128MB parquet writer buffers x N writers thrashing GC -> 16MB;",
    "partitionBy-induced per-task sorts in save(); per-table re-analysis",
    "in save(); a postings-wide groupBy shuffle replaced by document-",
    "local aggregation inside the analyzer) are documented in",
    "build/indexer.py and bench.py.",
]
open("BENCH/BASELINE.md", "w").write("\n".join(lines) + "\n")
print("wrote BENCH/BASELINE.md")
for label, (m, b) in effs.items():
    print(label, "median_eff", round(m, 3), "best_eff", round(b, 3))
