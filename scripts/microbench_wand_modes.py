#!/usr/bin/env python
"""Interleaved routed-vs-exhaustive micro-bench, BOTH scoring modes.

The WAND fast path's upper bounds differ by mode (bm25: Robertson idf
saturation; elasticlunr: max-over-terms of tf*idf^2*flnorm — see
search/wand.py): routing was bench-proven in bm25 mode in round 4, this
script settles the elasticlunr side (VERDICT r04 "Next round" #5). For
each auto-routed query shape it alternates routed / exhaustive
(EX_SPARK_NO_WAND_ROUTE) executions of the SAME query on the SAME
loaded index, asserts rank identity every rep, and reports per-variant
medians.

Usage: [BENCH_TURNS=100000] [CPUS=32] [REPS=5]
       python scripts/microbench_wand_modes.py > BENCH/r05_wand_modes.json
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("CPUS", "32"))
    n_turns = int(os.environ.get("BENCH_TURNS", "100000"))
    reps = int(os.environ.get("REPS", "5"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(4 * cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("wand-modes")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ex_elasticlunr_spark import Index
    from ex_elasticlunr_spark.sources.transcripts import (
        distributed_transcripts_df,
        with_docid,
    )

    tx = with_docid(distributed_transcripts_df(
        spark, max(n_turns // 8, 1), turns_per_conv=8, seed=1234,
        partitions=4 * cpus))
    out_dir = tempfile.mkdtemp(prefix="wand_modes_")
    idx = Index(name="modes").add_field("text").add_field("tool")
    idx.add_documents(tx, docid_col="docid", dedupe=False)
    idx.inverted.save(os.path.join(out_dir, "wh"))
    idx = Index.load(spark, os.path.join(out_dir, "wh"), name="modes")
    # bind segments once (what a serving session holds anyway) so the
    # A/B isolates scoring, not the one-time bind
    idx.inverted.segments()

    shapes = {
        "match_or": {"query": {"match": {"text": "elixir tool run quick"}}},
        "match_and": {"query": {"match": {"text": {
            "query": "elixir tool", "operator": "and"}}}},
        "bool_must_not": {"query": {"bool": {
            "must": {"match": {"text": "elixir"}},
            "must_not": {"match": {"text": "dog"}},
            "should": [{"match": {"tool": "search"}}]}}},
        "bool_must_should": {"query": {"bool": {
            "must": {"match": {"text": "elixir"}},
            "should": [{"match": {"tool": "search"}}]}}},
        "terms_fuzzy": {"query": {"terms": {"text": {
            "value": "elixor", "fuzziness": 1}}}},
    }

    def run(q, mode, exhaustive):
        if exhaustive:
            os.environ["EX_SPARK_NO_WAND_ROUTE"] = "1"
        else:
            os.environ.pop("EX_SPARK_NO_WAND_ROUTE", None)
        try:
            t0 = time.perf_counter()
            rows = idx.search(q, top_k=10, mode=mode).collect()
            dt = time.perf_counter() - t0
        finally:
            os.environ.pop("EX_SPARK_NO_WAND_ROUTE", None)
        return dt, [(r["docid"], round(r["score"], 9)) for r in rows]

    # host-noise stamp (same discipline as bench.py: only quiet runs
    # count as evidence)
    def cpu_snapshot():
        try:
            with open("/proc/stat") as fh:
                p = fh.readline().split()[1:]
            vals = list(map(int, p[:8]))
            return {"busy": sum(vals[:3]), "steal": vals[7],
                    "total": sum(vals)}
        except (OSError, ValueError, IndexError):
            return None

    snap0 = cpu_snapshot()
    results: dict = {}
    for mode in ("elasticlunr", "bm25"):
        results[mode] = {}
        for name, q in shapes.items():
            # one untimed warm-up per variant
            _, ref_routed = run(q, mode, exhaustive=False)
            _, ref_ex = run(q, mode, exhaustive=True)
            assert ref_routed == ref_ex, (mode, name, "rank drift")
            routed_t, ex_t = [], []
            for _ in range(reps):  # interleaved A/B
                dt, got = run(q, mode, exhaustive=False)
                assert got == ref_routed, (mode, name)
                routed_t.append(dt)
                dt, got = run(q, mode, exhaustive=True)
                assert got == ref_ex, (mode, name)
                ex_t.append(dt)
            results[mode][name] = {
                "routed_median_s": round(statistics.median(routed_t), 4),
                "exhaustive_median_s": round(statistics.median(ex_t), 4),
                "routed_best_s": round(min(routed_t), 4),
                "exhaustive_best_s": round(min(ex_t), 4),
                "speedup_median": round(
                    statistics.median(ex_t) / statistics.median(routed_t), 3),
                "rank_identical": True,
                "reps": reps,
            }

    snap1 = cpu_snapshot()
    host = None
    if snap0 and snap1 and snap1["total"] > snap0["total"]:
        dt_total = snap1["total"] - snap0["total"]
        host = {
            "busy_frac": round(
                (snap1["busy"] - snap0["busy"]) / dt_total, 4),
            "steal_frac": round(
                (snap1["steal"] - snap0["steal"]) / dt_total, 4),
        }
    print(json.dumps({
        "metric": "routed vs exhaustive medians by scoring mode",
        "turns": n_turns, "cpus": cpus, "results": results,
        "host_cpu": host,
    }))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
