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
    "host noise (identical runs vary up to 3x; the virtio disk shows",
    "multi-second latency spikes — shuffle dirs and the index output sit",
    "on tmpfs so the measurement isolates CPU/parallelism scaling), so",
    "runs ALTERNATE between the two parallelism levels; medians and",
    "best-of-runs are both reported (best-of approximates the quiet-host",
    "capability).",
    "",
    f"Input: {turns:,} synthetic transcript turns (deterministic seed),",
    "fields text+tool. Timed region = the FULL durable v4 index build:",
    "analyze + map-only flat ingest write + docID-ordinal assignment +",
    "term-clustered narrow postings (one shuffle-hash join + one",
    "clustering shuffle) + stats + delta+varint WAND segments (pure map)",
    "— exactly what scripts/build_index_job.py persists. 'postings",
    "stage' isolates the embarrassingly-parallel ingest core (analyze +",
    "flat write), the stage that dominates at 10^12 turns.",
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
# per-stage medians at each level (where the scaling lives/dies)
stage_keys = sorted(
    set().union(*[r["build"].get("stages", {}) for r in rlo + rhi]))
if stage_keys:
    lines += ["", "Per-stage median seconds (same runs):", "",
              f"| stage | local[{LO}] | local[{HI}] | stage efficiency |",
              "|---|---|---|---|"]
    for k in stage_keys:
        lo_s = [r["build"]["stages"][k] for r in rlo if k in r["build"].get("stages", {})]
        hi_s = [r["build"]["stages"][k] for r in rhi if k in r["build"].get("stages", {})]
        if not (lo_s and hi_s):
            continue
        mlo, mhi = statistics.median(lo_s), statistics.median(hi_s)
        eff = (mlo / mhi) / (HI / LO)
        lines.append(f"| {k} | {mlo:.1f} | {mhi:.1f} | {eff:.2f} |")
lines += [
    "",
    "Caveats: a single shared JVM (local mode) is the worst case for",
    "scaling — one heap, shared memory bandwidth, shared page cache,",
    "and JVM+Python worker threads oversubscribing the cores during",
    "pandas-UDF stages; host noise hits the wide configuration hardest.",
    "A real multi-executor cluster isolates executor heaps and scales",
    "memory/storage bandwidth with nodes. Anti-scaling artifacts found",
    "and FIXED across rounds (128MB parquet writer buffers x N writers",
    "thrashing GC -> 16MB; partitionBy-induced per-task sorts; wide-row",
    "dropDuplicates under the analyzer; sort-merge join sorting the",
    "postings side by docid -> shuffle-hash join; the 2-valued field",
    "column as leading sort key defeating the sort prefix comparator;",
    "unpruned docid strings riding the Arrow round trip into the",
    "segment encoder - 10x on that stage; virtio-disk spill latency ->",
    "tmpfs shuffle dirs) are documented in build/indexer.py,",
    "build/segments.py and bench.py.",
]
open("BENCH/BASELINE.md", "w").write("\n".join(lines) + "\n")
print("wrote BENCH/BASELINE.md")
for label, (m, b) in effs.items():
    print(label, "median_eff", round(m, 3), "best_eff", round(b, 3))
