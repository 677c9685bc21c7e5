#!/usr/bin/env python
"""Extra measurements (guide §1.4): noop-sink isolation for the
sf-operator paths + an A/B of the in-memory index serving cost with and
without the small-scan spread. Does NOT touch bench.py (frozen).

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     BENCH_EXTRA_REPS (default 3).
Prints one JSON line {"extra": {...}} with per-probe minima.
"""

from __future__ import annotations

import json
import os
import sys
import time


def cpu_steal():
    with open("/proc/stat") as f:
        p = f.readline().split()[1:]
    u, n, s, i, w = (int(x) for x in p[:5])
    st = int(p[7])
    return u + n + s, i + w, st


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", "32g")
        .config("spark.hadoop.parquet.block.size", "16777216")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.local.dir",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm")
                else "/tmp")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ex_elasticlunr_spark import Index

    results: dict = {}

    def timed(name, fn, reps=reps):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 4)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    docs_raw = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .withColumn("docid", F.col("doc_id").cast("string")))

    c0 = cpu_steal()
    t_all = time.perf_counter()

    # ---- A/B: in-memory index built from a 1-partition vs spread scan
    for tag, src in (("1part", docs_raw),
                     ("spread", docs_raw.repartition(cpus))):
        spark.sparkContext.setJobDescription(f"index build {tag}")
        idx = Index(name=f"ab-{tag}").add_field("text")
        idx.add_documents(src, docid_col="docid", dedupe=False)
        t0 = time.perf_counter()
        idx.materialize()
        results[f"materialize_{tag}"] = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobDescription(f"match_or {tag}")
        timed(f"match_or_{tag}", lambda i=idx: i.search(
            {"query": {"match": {"text": "spark merge window"}}}).collect())
        spark.sparkContext.setJobDescription(f"bm25_topk {tag}")
        timed(f"bm25_topk_{tag}", lambda i=idx: i.search_bm25(
            "spark merge window", top_k=10).collect())
        spark.sparkContext.setJobDescription(f"search_many {tag}")
        timed(f"search_many_{tag}", lambda i=idx: i.search_many(
            {"q_spark": "spark merge window fast", "q_join": "fast join sort",
             "q_stream": "stream batch query data"},
            "text", top_k=10, mode="bm25").collect())
        spark.sparkContext.setJobDescription(f"match_phrase {tag}")
        timed(f"match_phrase_{tag}", lambda i=idx: i.search(
            {"query": {"match_phrase": {"text": "fast join"}}}).collect())
        idx.inverted.unpersist()

    # ---- noop-isolated sf operators (current entry code)
    import __spark_entry__ as entry

    q = entry.queries()
    spark.sparkContext.setJobDescription("sf_index_build")
    t0 = time.perf_counter()
    entry._index(spark, sf_dir)
    results["sf_index_build_once"] = round(time.perf_counter() - t0, 4)
    for name in ("text_quality", "dedup_minhash_lsh", "ann_brute_topk",
                 "text_winnow", "text_repetition", "text_contamination",
                 "text_boilerplate"):
        spark.sparkContext.setJobDescription(f"noop {name}")
        timed(f"noop_{name}", lambda n=name: noop(q[n](spark, sf_dir)))

    c1 = cpu_steal()
    wall = time.perf_counter() - t_all
    hz = os.sysconf("SC_CLK_TCK")
    ncpu = os.cpu_count() or 1
    jif = max(wall * hz * ncpu, 1.0)
    out = {
        "extra": results,
        "sf": sf_dir,
        "cpus": cpus,
        "steal_frac": round((c1[2] - c0[2]) / jif, 4),
        "busy_frac": round((c1[0] - c0[0]) / jif, 4),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
