#!/usr/bin/env python
"""Capture .explain('formatted') for the bench-visible declared queries.

Usage: python scripts/capture_plans.py <out_dir> [sf_dir] [cpus]

Writes <out_dir>/<name>.txt for each captured query. Used to produce
plans/r06/<query>_{before,after}.txt (run once from the round-start
tree, once from the optimized tree).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = sys.argv[3] if len(sys.argv) > 3 else "16"
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("capture-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    names = [
        "match_or", "bm25_topk", "search_many", "match_phrase",
        "dedup_minhash_lsh", "ann_brute_topk", "text_quality",
        "match_and", "terms_fuzzy", "doc_stats",
        # session-2 additions: WAND serve route (returns the driver-
        # computed literal relation — the work is in the serve jobs),
        # regex/expand resolve, facets
        "wand_bm25_topk", "terms_regex", "terms_expand", "facet_terms",
    ]
    import contextlib
    import io

    def explain_str(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    q = entry.queries()
    for n in names:
        spark.sparkContext.setJobDescription(f"explain: {n}")
        df = q[n](spark, sf_dir)
        plan = explain_str(df)
        with open(os.path.join(out_dir, f"{n}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {n} ({len(plan)} bytes)")

    # build-path plan: the one clustering shuffle feeding the durable
    # postings/positions tables (the save() write itself is not a
    # query, so capture the clustered DataFrame's plan)
    from pyspark.sql import functions as F

    idx = entry._index(spark, sf_dir)
    flat = idx.inverted._flat
    if flat is not None:
        clustered = (
            flat.where(F.col("term").isNotNull())
            .select("field", "term", "tf_raw", "doc_len", "ord",
                    "positions", "ords")
            .repartition(64, F.col("field"), F.col("term"),
                         F.pmod((F.col("ord") / 4096).cast("long"),
                                F.lit(8)))
            .sortWithinPartitions("term", "field", "ord"))
        with open(os.path.join(out_dir, "build_cluster.txt"), "w") as fh:
            fh.write(explain_str(clustered))
        print("captured build_cluster")


if __name__ == "__main__":
    main()
