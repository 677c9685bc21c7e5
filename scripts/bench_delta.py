#!/usr/bin/env python
"""Delta-maintenance cost evidence: appending K% of the corpus to a
saved warehouse must cost ~K% of a full rebuild, not a full-warehouse
rewrite (build/deltas.py).

Input: the synthetic transcripts corpus the scaling protocol uses
(sources/transcripts.py), BENCH_TURNS turns (default 1M) as the base
plus 10% more as the delta batch; sources and warehouse live on tmpfs
so the measurement isolates compute, not the virtio disk. Prints one
JSON line.

Usage: python scripts/bench_delta.py [turns] [cpus] [delta_turns]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    turns = int(sys.argv[1] if len(sys.argv) > 1
                else os.environ.get("BENCH_TURNS", "1000000"))
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32")
    delta_turns = int(sys.argv[3] if len(sys.argv) > 3
                      else os.environ.get("BENCH_DELTA_TURNS",
                                          str(turns // 10)))
    turns_per_conv = 8
    n_convs = turns // turns_per_conv
    n_delta_convs = max(1, delta_turns // turns_per_conv)

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="bench_delta_", dir=tmp_root)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        # task-memory-sized shuffle partitions (see bench.py)
        .config("spark.sql.shuffle.partitions", str(4 * int(cpus)))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.local.dir", os.path.join(tmp, "spark-local"))
        .config("spark.ui.enabled", "false")
        .appName("bench-delta").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ex_elasticlunr_spark import Index
    from ex_elasticlunr_spark.build.indexer import InvertedIndex
    from ex_elasticlunr_spark.sources.transcripts import (
        distributed_transcripts_df,
        with_docid,
    )

    base_src = os.path.join(tmp, "base_src")
    delta_src = os.path.join(tmp, "delta_src")
    wh = os.path.join(tmp, "wh")
    out = {"turns": turns, "cpus": int(cpus),
           "delta_fraction": round(n_delta_convs / n_convs, 3)}
    try:
        # ---- untimed: materialize both source slices -------------------
        allc = with_docid(distributed_transcripts_df(
            spark, n_convs + n_delta_convs, turns_per_conv,
            partitions=4 * int(cpus)))
        allc.where(F.col("conv_id") < f"conv-{n_convs:06d}") \
            .write.mode("overwrite").parquet(base_src)
        allc.where(F.col("conv_id") >= f"conv-{n_convs:06d}") \
            .write.mode("overwrite").parquet(delta_src)

        # ---- base build + save over N turns ----------------------------
        t0 = time.perf_counter()
        idx = Index(name="b").add_field("text").add_field("tool")
        idx.add_documents(spark.read.parquet(base_src),
                          docid_col="docid", dedupe=False)
        idx.save(wh)
        out["base_save_sec"] = round(time.perf_counter() - t0, 3)

        # ---- the 100-TB maintenance path: append 10% as a generation ---
        t0 = time.perf_counter()
        inv = InvertedIndex.load(spark, wh)
        inv = inv.add_documents(spark.read.parquet(delta_src),
                                docid_col="docid", dedupe=False)
        inv.save_delta()
        out["delta_append_sec"] = round(time.perf_counter() - t0, 3)

        # ---- query sanity over the 2-generation warehouse --------------
        t0 = time.perf_counter()
        re = Index.load(spark, wh)
        re.analyzers = re.inverted.analyzers
        rows = re.search_bm25("merge window partition").limit(10).collect()
        out["query_2gen_sec"] = round(time.perf_counter() - t0, 3)
        out["query_rows"] = len(rows)

        # ---- the rewrite alternative at the same state: compaction -----
        t0 = time.perf_counter()
        re.inverted.compact()
        out["full_rewrite_sec"] = round(time.perf_counter() - t0, 3)

        out["delta_vs_rewrite"] = round(
            out["delta_append_sec"] / out["full_rewrite_sec"], 3)
        out["append_turns_per_sec"] = round(
            n_delta_convs * turns_per_conv / out["delta_append_sec"])
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
