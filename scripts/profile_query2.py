#!/usr/bin/env python
"""cProfile one warm WAND query to locate driver-side overhead."""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = 32
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", "32g")
        .config("spark.hadoop.parquet.block.size", "16777216")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
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
    import time

    tx = with_docid(
        distributed_transcripts_df(spark, 12500, turns_per_conv=8,
                                   partitions=64))
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

    # warm
    for _ in range(2):
        idx.search_wand("index search stream", "text", top_k=10).collect()

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    for _ in range(5):
        idx.search_wand("index search stream", "text", top_k=10).collect()
    pr.disable()
    print(f"5 reps wall: {time.perf_counter()-t0:.3f}s")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())

    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
