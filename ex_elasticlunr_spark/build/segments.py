"""Compressed posting segments: partition-local posting blocks,
shuffle-merged by term with RANGE salting for hot-term skew, delta-gap +
varint payload, block-max metadata for WAND.

Re-expresses the reference's ETS posting rows (field.ex:217-241) as the
standard IR physical format the north rule asks for.

Design:
  * every doc gets a global ordinal in docid sort order (ordinals.py);
  * a posting block is (field, term, block_id) where
    block_id = ord // block_size — i.e. the salt is the ORDINAL RANGE,
    not a hash: a hot term's postings split into many bounded blocks
    that build in parallel (the salted merge), while each block stays
    internally doc-ordered and blocks are globally ordered by block_id,
    so the full posting list is the ordered concatenation of its blocks
    (order-preserving merge for free);
  * per block we store n_docs, max_tf_raw (-> block-max score upper
    bounds computed at query time per scoring mode) and the compressed
    payload;
  * the grouping shuffle keys on (field, term, block_id) — bounded
    group size (<= block_size) regardless of term frequency = no skew;
  * encoding runs in ONE Arrow-batched pandas UDF over the pre-sorted
    (ord, tf) arrays (sort_array happens JVM-side in the aggregation).

Schema:
  segments(field, term, block_id, n_docs, min_ord, max_ord,
           max_tf_raw, block_bytes, payload binary)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType

from .codec import decode_block, encode_block
from .ordinals import assign_doc_ordinals

DEFAULT_BLOCK_SIZE = 4096


@F.pandas_udf(BinaryType())
def _encode_pairs(pairs: pd.Series, base: pd.Series) -> pd.Series:
    out = []
    for arr, b in zip(pairs, base):
        ords = [int(p["ord"]) for p in arr]
        tfs = [int(p["tf_raw"]) for p in arr]
        dls = [int(p["doc_len"]) for p in arr]
        out.append(encode_block(ords, tfs, dls, int(b)))
    return pd.Series(out)


def build_segments(index, block_size: int = DEFAULT_BLOCK_SIZE,
                   partitions: int = 0) -> DataFrame:
    """InvertedIndex -> (segments DataFrame, ordinals DataFrame)."""
    ordinals = assign_doc_ordinals(index.docs, partitions).persist()

    with_ord = index.postings.join(ordinals, "docid")
    blocks = (
        with_ord.withColumn(
            "block_id", (F.col("ord") / block_size).cast("long")
        )
        .groupBy("field", "term", "block_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ord").alias("min_ord"),
            F.max("ord").alias("max_ord"),
            F.max("tf_raw").alias("max_tf_raw"),
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("ord"), F.col("tf_raw"), F.col("doc_len"))
                )
            ).alias("pairs"),
        )
        .withColumn(
            "payload",
            _encode_pairs(F.col("pairs"), F.col("block_id") * block_size),
        )
        .withColumn("block_bytes", F.length("payload").cast("long"))
        .drop("pairs")
    )
    return blocks, ordinals


def decode_segments(segments: DataFrame, block_size: int = DEFAULT_BLOCK_SIZE) -> DataFrame:
    """Inverse of build_segments: segments -> (field, term, ord, tf_raw).
    Used by tests (round-trip) and by the WAND scorer's decode stage."""

    def run(batches):
        for pdf in batches:
            fields, terms, ords, tfs = [], [], [], []
            dlss = []
            for f, t, bid, payload in zip(
                pdf["field"], pdf["term"], pdf["block_id"], pdf["payload"]
            ):
                o, tf, dl = decode_block(bytes(payload), int(bid) * block_size)
                fields.extend([f] * len(o))
                terms.extend([t] * len(o))
                ords.extend(o)
                tfs.extend(tf)
                dlss.extend(dl)
            yield pd.DataFrame(
                {"field": fields, "term": terms, "ord": ords,
                 "tf_raw": tfs, "doc_len": dlss}
            )

    return segments.mapInPandas(
        run, "field string, term string, ord long, tf_raw long, doc_len long"
    )
