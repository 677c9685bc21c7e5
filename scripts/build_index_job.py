#!/usr/bin/env python
"""spark-submit entry point for the index build job.

Usage (multi-executor cluster):

    zip -r exel.zip ex_elasticlunr_spark
    spark-submit --py-files exel.zip scripts/build_index_job.py \
        --input  <transcripts parquet/iceberg path> \
        --output <index warehouse path> \
        --fields text,tool \
        --docid-expr "concat(conv_id, ':', turn_idx)" \
        --buckets 256 [--assume-unique]

The final merge persists the full v5 layout (narrow docid-free
term-clustered postings, the positional table, ordinals, stats,
compressed posting segments).

The job is the checkpointed build (per-bucket lineage + metrics,
resumable: re-submitting with the same --output skips completed
buckets). On a cluster the same code paths run unchanged — everything
is DataFrame/mapInPandas; there is no local-mode assumption.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as `python scripts/build_index_job.py` from anywhere: the
# repo root hosts the package; under spark-submit the --py-files zip
# already provides it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--fields", required=True,
                    help="comma-separated columns to index")
    ap.add_argument("--docid-expr", default="docid",
                    help="SQL expression for the document id")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--block-size", type=int, default=4096,
                    help="posting-block size for segment compaction")
    ap.add_argument("--assume-unique", action="store_true",
                    help="docid expression is unique by data contract: "
                         "skip the duplicate-guard full-corpus shuffle")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "table"],
                    help="input source: parquet path (default), iceberg "
                         "table path/identifier (needs the public "
                         "iceberg-spark-runtime jar on the cluster "
                         "classpath), or a catalog/temp-view table name")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName("ex_elasticlunr_spark-build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.hadoop.parquet.block.size", "16777216")
        # save() overlaps independent stages (ingest ∥ ordinals,
        # cluster ∥ stats) from threads; FAIR lets their jobs interleave
        .config("spark.scheduler.mode", "FAIR")
        .getOrCreate()
    )

    from ex_elasticlunr_spark.build.checkpoints import checkpointed_build

    from ex_elasticlunr_spark.sources.io import read_corpus

    source = read_corpus(spark, args.input, fmt=args.format).withColumn(
        "__docid", F.expr(args.docid_expr)
    )
    fields = args.fields.split(",")
    inv = checkpointed_build(
        spark, source, fields, args.output,
        docid_col="__docid", n_buckets=args.buckets,
        dedupe=not args.assume_unique, block_size=args.block_size,
    )
    if inv is None:
        print("partial build: re-submit to resume")
        return
    # the final merge's save() already wrote the clustered postings,
    # ordinals and compressed posting segments (v5 layout)
    print("build complete:", args.output)


if __name__ == "__main__":
    main()
