#!/usr/bin/env python
"""Serving-mode scaling pair (VERDICT r5 ask #6): run one fixed query
battery in BOTH scoring modes on a pinned local[N] session and print
the per-mode walls. Pin externally with taskset; pass cores as argv.

Usage: taskset -c 0-(N-1) python scripts/mode_scaling.py <cores>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1])

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", str(max(cores * 4, 32)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.scheduler.mode", "FAIR")
         .config("spark.driver.memory", "32g")
         .config("spark.hadoop.parquet.block.size", "16777216")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
         .config("spark.sql.files.maxPartitionBytes", "16m")
         .config("spark.local.dir", "/dev/shm/spark-local")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.sources.transcripts import (
    distributed_transcripts_df, with_docid)

import shutil
import tempfile

tx = with_docid(distributed_transcripts_df(
    spark, 12500, turns_per_conv=8, partitions=max(cores, 8) * 2)).persist()
tx.count()
out_dir = tempfile.mkdtemp(prefix="modescale_", dir="/dev/shm")
idx = Index(name="bench").add_field("text").add_field("tool")
idx.add_documents(tx, docid_col="docid", dedupe=False)
idx.inverted.save(out_dir)
idx = Index.load(spark, out_dir, name="bench")
idx.inverted.term_stats.cache().count()
idx.inverted.field_stats.cache().count()
idx.inverted.docs.cache().count()
idx.inverted.postings.count()

BATTERY = [
    {"query": {"match": {"text": "elixir tool run quick"}}},
    {"query": {"match": {"text": {"query": "elixir tool",
                                  "operator": "and"}}}},
    {"query": {"bool": {"must": {"match": {"text": "elixir"}},
                        "should": [{"match": {"tool": "search"}}]}}},
    {"query": {"terms": {"text": {"value": "pro", "expand": True}}}},
    {"query": {"terms": {"text": {"value": "elixor", "fuzziness": 1}}}},
    {"query": {"match_phrase": {"text": "elixir tool"}}},
    {"query": {"match": {"text": "index search stream"}}},
    {"query": {"bool": {"must": {"match": {"text": "tool"}},
                        "must_not": {"match": {"text": "dog"}}}}},
]


def battery(mode):
    t0 = time.perf_counter()
    for q in BATTERY:
        idx.search(q, top_k=10, mode=mode).collect()
    return round(time.perf_counter() - t0, 3)


out = {"cores": cores}
for rep in range(2):
    for mode in ("bm25", "elasticlunr"):
        out.setdefault(mode, []).append(battery(mode))
print(json.dumps(out))
shutil.rmtree(out_dir, ignore_errors=True)
