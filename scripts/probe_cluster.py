#!/usr/bin/env python
"""Probe: does the term-clustering shuffle (repartition + sort + parquet
write of the narrow postings) scale with cores, and with what knobs?

Synthesizes a postings-shaped table (JVM-side, spark.range) once under
/dev/shm, then times ONE clustering pass. Run under different
PROBE_CPUS / PROBE_PARTS / PROBE_CODEC to isolate the stage that shows
flat wall time at local[4] vs local[16] in BENCH/BASELINE.md.

Usage: PROBE_CPUS=4 PROBE_PARTS=8 python scripts/probe_cluster.py
"""
import json
import os
import shutil
import time

ROWS = int(os.environ.get("PROBE_ROWS", "22000000"))
CPUS = int(os.environ.get("PROBE_CPUS", "16"))
PARTS = int(os.environ.get("PROBE_PARTS", str(max(CPUS, 8))))
CODEC = os.environ.get("PROBE_CODEC", "snappy")
BLOCK = 4096
SALT = 8

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(PARTS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "32g")
    .config("spark.hadoop.parquet.block.size", "16777216")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.sql.files.maxPartitionBytes", "16m")
    .config("spark.sql.parquet.compression.codec", CODEC)
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

src = "/dev/shm/probe_flat"
if not os.path.isdir(src):
    (spark.range(ROWS, numPartitions=64)
     .select(
         F.when(F.pmod("id", F.lit(10)) < 9, "text").otherwise("tool").alias("field"),
         F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(30000))).alias("term"),
         F.concat(F.lit("c"), (F.col("id") / 11).cast("long"), F.lit(":"),
                  F.pmod("id", F.lit(8))).alias("docid"),
         (F.col("id") / 11).cast("long").alias("ord"),
         (F.pmod("id", F.lit(5)) + 1).cast("long").alias("tf_raw"),
         F.lit(64).cast("long").alias("doc_len"))
     .write.mode("overwrite").parquet(src))

out = f"/dev/shm/probe_out_{CPUS}_{PARTS}_{CODEC}"
shutil.rmtree(out, ignore_errors=True)
raw = spark.read.parquet(src)
t0 = time.perf_counter()
(raw.repartition(PARTS, F.col("field"), F.col("term"),
                 F.pmod((F.col("ord") / BLOCK).cast("long"), F.lit(SALT)))
 .sortWithinPartitions("term", "field", "ord")
 .write.mode("overwrite").parquet(out))
wall = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "parts": PARTS, "codec": CODEC,
                  "rows": ROWS, "cluster_sec": round(wall, 2)}))
shutil.rmtree(out, ignore_errors=True)
spark.stop()
