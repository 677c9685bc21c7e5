#!/usr/bin/env python
"""Microbench: inline_rows Column path vs SQL VALUES path; isin vs expr."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.local.dir", "/dev/shm/spark-local")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from ex_elasticlunr_spark.functions.literals import inline_rows, _sql_literal


def col_path(rows, names, types):
    structs = [
        F.struct(*[F.lit(v).cast(t).alias(n)
                   for v, n, t in zip(row, names, types)])
        for row in rows]
    return (spark.range(0, 1, 1, 1)
            .select(F.explode(F.array(*structs)).alias("_r"))
            .select("_r.*"))


def sql_path(rows, names, types):
    values = ",".join(
        "(" + ",".join(_sql_literal(v) for v in row) + ")" for row in rows)
    cols = ",".join(f"CAST(c{i} AS {t}) AS {n}"
                    for i, (n, t) in enumerate(zip(names, types)))
    tcols = ",".join(f"c{i}" for i in range(len(names)))
    return spark.sql(f"SELECT {cols} FROM (VALUES {values}) AS t({tcols})")


for nrows in (1, 2, 10, 40):
    rows = [("docid%05d" % i, float(i) * 1.7) for i in range(nrows)]
    names, types = ["docid", "score"], ["string", "double"]
    for fn, label in ((col_path, "col"), (sql_path, "sql")):
        fn(rows, names, types)  # warm
        t0 = time.perf_counter()
        for _ in range(20):
            fn(rows, names, types)
        dt = (time.perf_counter() - t0) / 20
        print(f"inline {nrows:4d} rows {label}: {dt*1000:7.2f} ms/call")

df = spark.range(0, 100000).select(
    F.concat(F.lit("t"), F.col("id").cast("string")).alias("term"))
for nvals in (5, 30, 200):
    vals = ["t%d" % (i * 7) for i in range(nvals)]
    for label in ("isin", "expr"):
        t0 = time.perf_counter()
        for _ in range(20):
            if label == "isin":
                c = F.col("term").isin(vals)
            else:
                c = F.expr("term IN (" + ",".join(
                    _sql_literal(v) for v in vals) + ")")
            df.where(c)
        dt = (time.perf_counter() - t0) / 20
        print(f"isin {nvals:4d} vals {label}: {dt*1000:7.2f} ms/call")

# sanity: same results
vals = ["t7", "t14", "nope'x"]
a = df.where(F.col("term").isin(vals)).collect()
b = df.where(F.expr("term IN (" + ",".join(_sql_literal(v) for v in vals) + ")")).collect()
print("equal:", sorted(map(str, a)) == sorted(map(str, b)), len(a))
