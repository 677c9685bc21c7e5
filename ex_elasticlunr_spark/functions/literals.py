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

# above this many cells the Column-literal construction's py4j traffic
# (3+ gateway round trips PER CELL — measured 32s for a 2,000x6
# relation) dwarfs a single spark.sql() VALUES parse; below it the
# Column path is ~free and avoids the SQL text round trip
_SQL_VALUES_CELLS = 256


def _sql_literal(v) -> str:
    """One value -> a Spark SQL string literal (everything is rendered
    as a quoted string and CAST to the column type by the caller —
    CAST('1e-3' AS double) round-trips exactly, and quoting uniformly
    sidesteps int/decimal literal typing rules)."""
    if v is None:
        return "NULL"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"
    if isinstance(v, bool):
        s = "true" if v else "false"
    elif isinstance(v, float):
        if v != v:
            s = "NaN"  # Spark parses NaN/Infinity, not Python's nan/inf
        elif v == float("inf"):
            s = "Infinity"
        elif v == float("-inf"):
            s = "-Infinity"
        else:
            s = repr(v)  # shortest round-trip decimal
    else:
        s = str(v)
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def inline_rows(spark: SparkSession, rows: Iterable[Sequence],
                schema_ddl: str) -> DataFrame:
    """Literal rows -> DataFrame with the given DDL schema
    (``"name type, name type, ..."``), as a JVM-side literal relation.

    Small relations inline as Column literals; larger ones go through
    ONE ``spark.sql`` VALUES statement (the Column path costs several
    py4j round trips per cell). Both compile to a local literal
    relation — no Python worker anywhere, broadcastable, and
    zero-task to collect. Falls back to an empty createDataFrame for
    zero rows (no Python worker for an empty local relation either).
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema_ddl)
    fields = [f.strip() for f in schema_ddl.split(",")]
    names = [f.split(None, 1)[0] for f in fields]
    types = [f.split(None, 1)[1] for f in fields]
    if len(rows) * len(names) > _SQL_VALUES_CELLS:
        values = ",".join(
            "(" + ",".join(_sql_literal(v) for v in row) + ")"
            for row in rows)
        cols = ",".join(
            f"CAST(c{i} AS {t}) AS {n}"
            for i, (n, t) in enumerate(zip(names, types)))
        tcols = ",".join(f"c{i}" for i in range(len(names)))
        return spark.sql(
            f"SELECT {cols} FROM (VALUES {values}) AS t({tcols})")
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
