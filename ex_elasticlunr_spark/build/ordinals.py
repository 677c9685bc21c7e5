"""Global doc ordinals in docid sort order, without a driver bottleneck.

The classic scalable zipWithIndex: range-repartition by docid, sort
within partitions, count rows per partition (one cheap job), broadcast
the prefix-sum offsets, then assign ordinal = offset[pid] + local index
inside mapInPandas. No single-node window, no global sort on one
partition — each step is partition-parallel, so it holds at 10^12 docs
(the offsets array is one long per partition).

Sorted ordinals make delta-gaps small (codec.py) and give posting blocks
contiguous ordinal ranges (segments.py range-salting).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def assign_doc_ordinals(docs: DataFrame, partitions: int = 0) -> DataFrame:
    """docs(docid) -> DataFrame(docid, ord) with ord dense in docid order."""
    spark = docs.sparkSession
    if not partitions:
        partitions = docs.sparkSession.sparkContext.defaultParallelism

    ranged = (
        docs.select("docid")
        .repartitionByRange(partitions, "docid")
        .sortWithinPartitions("docid")
    )
    # persist BEFORE the counts job: the range partitioner samples its
    # bounds per-execution, so the counts job and the numbering job must
    # share one materialized partitioning or offsets drift (duplicate /
    # skipped ordinals)
    ranged = ranged.persist()
    counts = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    sizes = {r["pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    boff = spark.sparkContext.broadcast(offsets)

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        base = boff.value.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {"docid": pdf["docid"],
                 "ord": range(base + seen, base + seen + n)}
            )
            seen += n

    out = ranged.mapInPandas(number, "docid string, ord long")
    # handle for callers to unpersist the internal ranged DF once the
    # ordinals have been materialized/written (save() uses this)
    out._persisted_deps = [ranged]
    return out
