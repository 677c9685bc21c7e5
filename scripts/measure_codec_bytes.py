#!/usr/bin/env python
"""Measure segment-store bytes: codec v2 (per-doc len side table) vs a
faithful re-encode of the same postings in the v1 layout (doc_len
interleaved into every posting entry).

Builds the bench corpus (sources/transcripts.py synthetic transcripts,
BENCH_TURNS turns), materializes the index + segments, then:

  v2 bytes = sum(length(payload)) over segments
           + sum(length(payload)) over len_blocks
  v1 bytes = re-encode each posting block as (gap, tf, doc_len)
             triplets with the SAME varint codec (what build/codec.py
             v1 produced) and sum the lengths

The re-encode runs distributed (mapInPandas over the real blocks with
the len payload riding along, exactly like the query-time fused
decode), so the comparison is bytes-for-bytes on the actual bench
segment store, not a model.

Usage:  BENCH_TURNS=2000000 python scripts/measure_codec_bytes.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_turns = int(os.environ.get("BENCH_TURNS", "2000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("codec-bytes")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ex_elasticlunr_spark import Index
    from ex_elasticlunr_spark.build.segments import DEFAULT_BLOCK_SIZE
    from ex_elasticlunr_spark.sources.transcripts import (
        distributed_transcripts_df,
        with_docid,
    )

    t0 = time.time()
    tx = with_docid(distributed_transcripts_df(
        spark, max(n_turns // 8, 1), turns_per_conv=8, partitions=cpus))
    idx = Index(name="codec-bytes").add_field("text")
    idx.add_documents(tx, docid_col="docid", dedupe=False)
    idx.materialize()
    segments, _ords = idx.inverted.segments(DEFAULT_BLOCK_SIZE)
    lens = idx.inverted.seg_len_blocks(DEFAULT_BLOCK_SIZE)
    build_s = time.time() - t0

    v2_postings = segments.agg(
        F.sum(F.length("payload")).alias("b"),
        F.count(F.lit(1)).alias("blocks"),
        F.sum("n_docs").alias("entries"),
    ).collect()[0]
    v2_lens = lens.agg(
        F.sum(F.length("payload")).alias("b"),
        F.count(F.lit(1)).alias("blocks"),
    ).collect()[0]

    # ---- v1 re-encode: (gap, tf, doc_len) triplets per posting block ----
    joined = segments.select("field", "term", "block_id", "payload").join(
        lens.select("field", "block_id",
                    F.col("payload").alias("len_payload")),
        ["field", "block_id"],
    )

    def reencode(batches):
        import numpy as np
        import pandas as pd

        from ex_elasticlunr_spark.build.codec import (
            _encode_varints,
            decode_block,
        )

        lens_cache: dict = {}
        for pdf in batches:
            out = []
            for f, bid, payload, lp in zip(
                pdf["field"], pdf["block_id"], pdf["payload"],
                pdf["len_payload"],
            ):
                base = int(bid) * DEFAULT_BLOCK_SIZE
                o, tf = decode_block(bytes(payload), base)
                key = (f, int(bid))
                lc = lens_cache.get(key)
                if lc is None:
                    lo, lv = decode_block(bytes(lp), base)
                    lc = (np.asarray(lo, dtype=np.int64),
                          np.asarray(lv, dtype=np.int64))
                    lens_cache[key] = lc
                lo, lv = lc
                o = np.asarray(o, dtype=np.int64)
                dl = lv[np.searchsorted(lo, o)]
                n = len(o)
                inter = np.empty(3 * n + 1, dtype=np.uint64)
                inter[0] = n
                if n:
                    inter[1] = o[0] - base
                    inter[4::3] = np.diff(o).astype(np.uint64)
                    inter[2::3] = np.asarray(tf, dtype=np.uint64)
                    inter[3::3] = dl.astype(np.uint64)
                out.append(len(_encode_varints(inter)))
            yield pd.DataFrame({"v1_bytes": out})

    v1 = (
        joined.mapInPandas(reencode, "v1_bytes long")
        .agg(F.sum("v1_bytes").alias("b"))
        .collect()[0]
    )

    v2_total = int(v2_postings["b"]) + int(v2_lens["b"])
    v1_total = int(v1["b"])
    print(json.dumps({
        "turns": n_turns,
        "build_s": round(build_s, 2),
        "posting_entries": int(v2_postings["entries"]),
        "posting_blocks": int(v2_postings["blocks"]),
        "len_blocks": int(v2_lens["blocks"]),
        "v2_posting_bytes": int(v2_postings["b"]),
        "v2_len_bytes": int(v2_lens["b"]),
        "v2_total_bytes": v2_total,
        "v1_total_bytes": v1_total,
        "saved_bytes": v1_total - v2_total,
        "saved_frac": round(1.0 - v2_total / v1_total, 4),
        "bytes_per_entry_v2": round(v2_total / int(v2_postings["entries"]), 3),
        "bytes_per_entry_v1": round(v1_total / int(v2_postings["entries"]), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
