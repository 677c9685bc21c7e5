#!/usr/bin/env python
"""Cold-q8 isolation: bench-identical build + q1..q7 warmup, then time
q8 (first phrase query of the session). Usage: q8_cold.py <repo_path>"""
import sys
import time

repo = sys.argv[1]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "128")
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
    spark, 12500, turns_per_conv=8, partitions=64)).persist()
tx.count()
out_dir = tempfile.mkdtemp(prefix="q8c_", dir="/dev/shm")
idx = Index(name="bench").add_field("text").add_field("tool")
idx.add_documents(tx, docid_col="docid", dedupe=False)
idx.inverted.save(out_dir)
idx = Index.load(spark, out_dir, name="bench")
idx.inverted.term_stats.cache().count()
idx.inverted.field_stats.cache().count()
idx.inverted.docs.cache().count()
idx.inverted.postings.count()

idx.search_bm25("elixir tool run quick", top_k=10).collect()
idx.search({"query": {"match": {"text": {"query": "elixir tool",
                                         "operator": "and"}}}},
           top_k=10).collect()
idx.search({"query": {"bool": {"must": {"match": {"text": "elixir"}},
                               "must_not": {"match": {"text": "dog"}},
                               "should": [{"match": {"tool": "search"}}]}}},
           top_k=10).collect()
idx.search({"query": {"terms": {"text": {"value": "pro", "expand": True}}}},
           top_k=10).collect()
idx.search({"query": {"terms": {"text": {"value": "elixor",
                                         "fuzziness": 1}}}},
           top_k=10).collect()
idx.search_wand("elixir tool run quick", "text", top_k=10).collect()
idx.search_wand("index search stream", "text", top_k=10).collect()

j0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
t0 = time.perf_counter()
idx.search({"query": {"match_phrase": {"text": "elixir tool"}}},
           top_k=10).collect()
dt = time.perf_counter() - t0
j1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
print(f"COLD_Q8 {repo} {dt:.3f}s jobs={j1-j0}")
shutil.rmtree(out_dir, ignore_errors=True)
