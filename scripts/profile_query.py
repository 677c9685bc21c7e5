#!/usr/bin/env python
"""Profile the per-query serving floor: split each bench query into
(python DataFrame construction, catalyst planning, execution) and count
Spark jobs per query. Scratch tool for OPTIMIZATION_r06; not part of the
bench contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("BENCH_TURNS", "100000"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", "32g")
        .config("spark.hadoop.parquet.block.size", "16777216")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ex_elasticlunr_spark import Index
    from ex_elasticlunr_spark.sources.transcripts import (
        distributed_transcripts_df,
        with_docid,
    )

    import shutil
    import tempfile

    n_convs = max(n_turns // 8, 1)
    tx = with_docid(
        distributed_transcripts_df(spark, n_convs, turns_per_conv=8,
                                   partitions=max(cpus, 8) * 2))
    tx = tx.persist()
    tx.count()
    out_dir = tempfile.mkdtemp(prefix="prof_index_", dir="/dev/shm")
    idx = Index(name="bench").add_field("text").add_field("tool")
    idx.add_documents(tx, docid_col="docid", dedupe=False)
    idx.inverted.save(out_dir)
    idx = Index.load(spark, out_dir, name="bench")
    idx.inverted.term_stats.cache().count()
    idx.inverted.field_stats.cache().count()
    idx.inverted.docs.cache().count()
    idx.inverted.postings.count()

    st = spark.sparkContext.statusTracker()

    def prof(name, build_df, reps=3):
        for r in range(reps):
            jobs0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = build_df()
            t1 = time.perf_counter()
            # force analysis+optimization+physical planning without execution
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            jobs1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            print(f"{name} rep{r}: construct={t1-t0:.3f}s plan={t2-t1:.3f}s "
                  f"exec={t3-t2:.3f}s total={t3-t0:.3f}s jobs={jobs1-jobs0}")
            if r == reps - 1:
                try:
                    import urllib.request
                    import json as _json
                    apps = _json.load(urllib.request.urlopen(
                        "http://localhost:4040/api/v1/applications"))
                    app_id = apps[0]["id"]
                    jobs = _json.load(urllib.request.urlopen(
                        f"http://localhost:4040/api/v1/applications/{app_id}/jobs"))
                    for j in jobs:
                        if jobs0 <= j["jobId"] < jobs1:
                            from datetime import datetime
                            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                            dur = (datetime.strptime(j["completionTime"], fmt)
                                   - datetime.strptime(j["submissionTime"], fmt)
                                   ).total_seconds()
                            print(f"    job {j['jobId']}: {dur:.3f}s "
                                  f"tasks={j['numTasks']} "
                                  f"{(j.get('description') or j['name'])[:90]}")
                except Exception as e:
                    print("    (job introspection failed:", e, ")")

    prof("q1_bm25_topk", lambda: idx.search_bm25(
        "elixir tool run quick", top_k=10))
    prof("q2_match_and", lambda: idx.search(
        {"query": {"match": {"text": {"query": "elixir tool",
                                      "operator": "and"}}}}, top_k=10))
    prof("q3_bool", lambda: idx.search(
        {"query": {"bool": {"must": {"match": {"text": "elixir"}},
                            "must_not": {"match": {"text": "dog"}},
                            "should": [{"match": {"tool": "search"}}]}}},
        top_k=10))
    prof("q7_wand_warm", lambda: idx.search_wand(
        "index search stream", "text", top_k=10))
    prof("q8_phrase", lambda: idx.search(
        {"query": {"match_phrase": {"text": "elixir tool"}}}, top_k=10))

    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
