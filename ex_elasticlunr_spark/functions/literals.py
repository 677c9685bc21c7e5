"""Pure-JVM literal-row DataFrames.

``spark.createDataFrame(small_python_list)`` builds a *Python RDD*: the
rows are pickled into defaultParallelism slices and every job that
scans them pays one Python-worker round trip PER SLICE — measured ~5s
to parquet-write a 2-row DataFrame at local[32] (and still ~0.5s after
coalesce(1), since the coalesced task iterates all parent slices).
Inlining the rows as Column literals instead compiles to a 1-row Range
plus an explode — no Python worker anywhere, ~0.05s, and Catalyst can
constant-fold/broadcast it like any literal relation.

Use this for every *engine-path* tiny relation (query terms, per-field
stats rows, metrics appends). Tests may keep createDataFrame.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def inline_rows(spark: SparkSession, rows: Iterable[Sequence],
                schema_ddl: str) -> DataFrame:
    """Literal rows -> DataFrame with the given DDL schema
    (``"name type, name type, ..."``), as a JVM-side literal relation.

    Falls back to an empty createDataFrame for zero rows (no Python
    worker is involved for an empty local relation either).
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema_ddl)
    fields = [f.strip() for f in schema_ddl.split(",")]
    names = [f.split(None, 1)[0] for f in fields]
    types = [f.split(None, 1)[1] for f in fields]
    structs = [
        F.struct(*[
            F.lit(v).cast(t).alias(n)
            for v, n, t in zip(row, names, types)
        ])
        for row in rows
    ]
    # numPartitions=1: range() otherwise makes defaultParallelism
    # (mostly empty) partitions and every job over this relation runs
    # that many tasks
    return (spark.range(0, 1, 1, 1)
            .select(F.explode(F.array(*structs)).alias("_r"))
            .select("_r.*"))
