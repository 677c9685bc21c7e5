"""Resumable index build: per-partition checkpoints with lineage and a
metrics table.

North rule: "resumable from per-partition checkpoints with lineage and
segment-level metrics (terms/sec, postings bytes, merge fan-in)
recorded to a metrics table, targeting 10^12 turns."

Layout under ``out_path``:
    source/bucket=<b>/...      bucketized input (written once; partition-
                               pruned reads per bucket thereafter)
    buckets/<b>/postings/      per-bucket partial postings + per-doc
                               sentinel rows (parquet, _SUCCESS =
                               checkpoint marker)
    buckets/<b>/docs/          per-bucket docid universe
    buckets/<b>/lineage.json   bucket lineage: inputs, counts, timing
    metrics/                   append-only metrics table (parquet):
                               (stage, partition_id, rows, terms,
                                terms_per_sec, postings_bytes,
                                merge_fan_in, wall_sec, ts)
    index/                     final merged index tables (+manifest)

Resume semantics: a restarted build lists bucket checkpoints, skips
every bucket whose postings dir has _SUCCESS, and processes only the
remainder — the reference's DETS persistence (storage/disk.ex:22-31)
generalized to partition granularity. The final merge is a pure read of
the checkpoint dirs, so it is idempotent.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.udfs import AnalyzerConfig
from .indexer import InvertedIndex, _finalize, build_index

METRICS_SCHEMA = (
    "stage string, partition_id int, rows long, terms long, "
    "terms_per_sec double, postings_bytes long, merge_fan_in double, "
    "wall_sec double, ts double"
)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _append_metrics(spark: SparkSession, out_path: str, rows: List[tuple]) -> None:
    # inline literal relation — no Python-RDD scan for a metrics append
    from ..functions.literals import inline_rows

    inline_rows(spark, rows, METRICS_SCHEMA) \
        .write.mode("append").parquet(os.path.join(out_path, "metrics"))


def read_metrics(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "metrics"))


def completed_buckets(out_path: str, n_buckets: int) -> List[int]:
    done = []
    for b in range(n_buckets):
        if os.path.exists(
            os.path.join(out_path, "buckets", str(b), "postings", "_SUCCESS")
        ):
            done.append(b)
    return done


def checkpointed_build(
    spark: SparkSession,
    source: DataFrame,
    fields,
    out_path: str,
    docid_col: str = "docid",
    n_buckets: int = 16,
    analyzers: Optional[Dict[str, AnalyzerConfig]] = None,
    store_positions: bool = True,
    max_buckets: Optional[int] = None,
    dedupe: bool = True,
    block_size: int = 4096,
) -> Optional[InvertedIndex]:
    """Build (or resume building) the index under ``out_path``.

    ``max_buckets`` limits how many *pending* buckets are processed this
    call (used by tests to simulate a mid-build crash). Returns the
    merged InvertedIndex, or None if buckets remain unprocessed.

    ``out_path`` must be a LOCAL (or locally-mounted, e.g. NFS)
    directory: checkpoint markers, lineage and metrics use local
    filesystem APIs. A multi-node deployment points this at shared
    storage mounted on the driver; object-store URIs are rejected
    rather than silently never resuming.

    The bucketization parameters are pinned in ``build_params.json`` at
    first run — resuming with a different ``n_buckets`` or field list
    raises instead of silently dropping the out-of-range buckets.
    """
    fields = list(fields)
    if "://" in out_path:
        raise ValueError(
            f"checkpointed_build needs a local/mounted out_path, got "
            f"{out_path!r}: resume markers and lineage use local "
            f"filesystem APIs")

    params_path = os.path.join(out_path, "build_params.json")
    params = {"n_buckets": n_buckets, "fields": fields,
              "docid_col": docid_col, "store_positions": store_positions}
    if os.path.exists(params_path):
        with open(params_path) as fh:
            prev = json.load(fh)
        if (prev.get("n_buckets") != n_buckets
                or prev.get("fields") != fields):
            raise ValueError(
                f"resume parameter mismatch under {out_path}: the "
                f"existing build used n_buckets="
                f"{prev.get('n_buckets')}, fields={prev.get('fields')} "
                f"— resuming with n_buckets={n_buckets}, "
                f"fields={fields} would silently drop buckets")
    else:
        os.makedirs(out_path, exist_ok=True)
        with open(params_path, "w") as fh:
            json.dump(params, fh, indent=2)

    # stage 0: bucketize the source once (hash-partitioned by docid)
    src_dir = os.path.join(out_path, "source")
    if not os.path.exists(os.path.join(src_dir, "_SUCCESS")):
        t0 = time.perf_counter()
        bucketed = source.select(
            F.col(docid_col).cast("string").alias("docid"),
            *[F.col(f).cast("string").alias(f) for f in fields],
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("docid"), F.lit(n_buckets)).cast("int")
        )
        bucketed.write.mode("overwrite").partitionBy("bucket").parquet(src_dir)
        n = spark.read.parquet(src_dir).count()
        wall = time.perf_counter() - t0
        _append_metrics(spark, out_path, [(
            "bucketize", -1, n, 0, 0.0, _dir_bytes(src_dir), 0.0,
            round(wall, 4), time.time(),
        )])

    done = set(completed_buckets(out_path, n_buckets))
    pending = [b for b in range(n_buckets) if b not in done]
    if max_buckets is not None:
        pending = pending[:max_buckets]

    for b in pending:
        t0 = time.perf_counter()
        bdir = os.path.join(out_path, "buckets", str(b))
        part = spark.read.parquet(src_dir).where(F.col("bucket") == b)
        idx = build_index(
            part, fields=fields, docid_col="docid", analyzers=analyzers,
            store_positions=store_positions, dedupe=dedupe,
        )
        # docs FIRST, postings (whose _SUCCESS is the bucket's resume
        # marker) LAST: a crash between the two writes must leave the
        # bucket looking INCOMPLETE — marker-first would make resume
        # skip a bucket whose docs table is missing or partial,
        # silently shrinking the docid universe (wrong n_docs/idf)
        idx.docs.write.mode("overwrite").parquet(os.path.join(bdir, "docs"))
        idx._flat.write.mode("overwrite").parquet(os.path.join(bdir, "postings"))

        rows_in = part.count()
        # metrics from the parquet just written — idx.postings is lazy
        # lineage over the analyzer; aggregating it would re-run the
        # bucket's entire tokenize/analyze a second time
        terms = (spark.read.parquet(os.path.join(bdir, "postings"))
                 .where(F.col("term").isNotNull())
                 .agg(F.sum("tf_raw")).first()[0] or 0)
        wall = time.perf_counter() - t0
        pbytes = _dir_bytes(os.path.join(bdir, "postings"))
        lineage = {
            "bucket": b,
            "rows_in": rows_in,
            "terms": int(terms),
            "wall_sec": round(wall, 4),
            "terms_per_sec": round(terms / wall, 2) if wall > 0 else 0.0,
            "postings_bytes": pbytes,
            "source": src_dir,
            "fields": fields,
            "ts": time.time(),
        }
        with open(os.path.join(bdir, "lineage.json"), "w") as fh:
            json.dump(lineage, fh, indent=2)
        _append_metrics(spark, out_path, [(
            "bucket_build", b, rows_in, int(terms),
            lineage["terms_per_sec"], pbytes, 0.0, round(wall, 4), time.time(),
        )])

    if len(done) + len(pending) < n_buckets:
        return None  # crashed/partial run: resume later

    # final merge: pure read of the checkpoints (idempotent)
    t0 = time.perf_counter()
    raw = spark.read.parquet(os.path.join(out_path, "buckets", "*", "postings"))
    if "ord" in raw.columns:
        # per-bucket ingest ordinals collide across buckets; the merge
        # save() reassigns globally (build/ordinals.py)
        raw = raw.drop("ord")
    postings = raw.where(F.col("term").isNotNull()) \
        .withColumn("tf", F.sqrt(F.col("tf_raw")))
    doc_stats = raw.where(F.col("term").isNull()).select("field", "docid", "doc_len")
    docs = spark.read.parquet(os.path.join(out_path, "buckets", "*", "docs"))
    default = AnalyzerConfig()
    amap = dict(analyzers or {})
    for f in fields:
        amap.setdefault(f, default)
    inv = _finalize(postings, docs, amap, store_positions, doc_stats=doc_stats)
    inv.save(os.path.join(out_path, "index"), block_size=block_size)
    wall = time.perf_counter() - t0
    merged = InvertedIndex.load(spark, os.path.join(out_path, "index"))
    fan_in = float(len(completed_buckets(out_path, n_buckets)))
    _append_metrics(spark, out_path, [(
        "merge", -1, merged.postings.count(), 0, 0.0,
        _dir_bytes(os.path.join(out_path, "index")), fan_in,
        round(wall, 4), time.time(),
    )])
    return merged
