"""Block-max WAND top-k over compressed posting segments.

Distributed two-phase block-max pruning (the document-at-a-time WAND
heap doesn't map onto a shuffle-based engine; the block-max *pruning*
does, and is where the asymptotic win lives):

  Phase 1 (seed the threshold): decode only the single highest-upper-
  bound block per query term, score those docs exactly, take the k-th
  best exact score as threshold θ. θ is a valid lower bound on the final
  k-th score (those docs' exact scores only grow when the rest of the
  postings are considered — scores are non-negative sums / maxes).

  Phase 2 (prune + score): a block of term t can contain a top-k doc
  only if   ub(block) + Σ_{t'≠t} max_ub(t')  >= θ   (sum/BM25 mode), or
            ub(block) >= θ                          (max/elasticlunr
  mode, where a doc's score is its best single entry). Surviving blocks
  are decoded (Arrow-batched) and aggregated exactly; results are
  identical to the exhaustive scorer (tests/test_segments_wand.py).

Block upper bounds per mode (max_tf_raw is stored block metadata):
  elasticlunr: sqrt(max_tf_raw) * idf(t)^2 * flnorm
  bm25:        idf_bm25(t) * max_tf*(k1+1) / (max_tf + k1*(1-b))
               (doc_len -> 0 bound: the true denominator is larger)

Scale shape: phase 1 touches #terms blocks; phase 2's block filter is
metadata-only (no payload decode — column pruning keeps payload bytes
unread for pruned blocks in parquet); the decode + per-doc aggregation
shuffle is bounded by surviving blocks only.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..build.segments import DEFAULT_BLOCK_SIZE, decode_segments


def _term_weights(index, field: str, terms: List[str], mode: str,
                  k1: float, b: float) -> Dict[str, dict]:
    """Collect per-term stats (tiny: |terms| rows) + field scalars."""
    frow = (
        index.field_stats.where(F.col("field") == field)
        .select("flnorm", "n_docs", "avg_doc_len")
        .first()
    )
    if frow is None:
        return {}
    trows = (
        index.term_stats.where(
            (F.col("field") == field) & F.col("term").isin(terms)
        )
        .select("term", "df", "idf")
        .collect()
    )
    out = {}
    for r in trows:
        if mode == "elasticlunr":
            weight = r["idf"] ** 2 * frow["flnorm"]
        else:
            weight = math.log(
                1.0 + (frow["n_docs"] - r["df"] + 0.5) / (r["df"] + 0.5)
            )
        out[r["term"]] = {
            "weight": weight,
            "avg_doc_len": frow["avg_doc_len"],
        }
    return out


def wand_topk(
    index,
    field: str,
    terms: List[str],
    k: int = 10,
    mode: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
    boost: float = 1.0,
    block_size: int = DEFAULT_BLOCK_SIZE,
    expand: bool = False,
    fuzziness: int = 0,
    regex: bool = False,
) -> DataFrame:
    """Top-k (docid, score) — rank-identical to the exhaustive scorer
    for msm<=1 queries (exact terms, or prefix/fuzzy/regex expansion).

    Expansion resolves against the VOCABULARY first (term_stats — the
    same edit-ball/prefix/regex resolve as the exhaustive path), then
    WAND prunes over the expanded term set. A vocab term matched by
    multiple query terms contributes once per match in the exhaustive
    BM25 sum, so its WAND weight is scaled by that multiplicity (max
    mode is multiplicity-invariant)."""
    spark = index.postings.sparkSession
    segments, ordinals = index.segments(block_size)
    # decode must use the block size the segments were actually built
    # with (segments() may reuse an earlier build)
    block_size = index._segments[0]

    mult: Dict[str, int] = {}
    if expand or fuzziness > 0 or regex:
        from .scorer import _query_terms_df

        m = _query_terms_df(index, field, list(dict.fromkeys(terms)),
                            expand, fuzziness, regex=regex)
        mult = {
            r["term"]: r["n"]
            for r in m.groupBy("term").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        terms = sorted(mult)
        if not terms:
            return spark.createDataFrame([], "docid string, score double")

    stats = _term_weights(index, field, list(dict.fromkeys(terms)), mode, k1, b)
    if mode != "elasticlunr":
        for t, n in mult.items():
            if n > 1 and t in stats:
                stats[t]["weight"] *= n
    if not stats:
        return spark.createDataFrame([], "docid string, score double")
    terms = [t for t in terms if t in stats]

    weight_map = F.create_map(
        *[x for t in stats for x in (F.lit(t), F.lit(stats[t]["weight"]))]
    )
    avgdl = stats[terms[0]]["avg_doc_len"]

    cand = segments.where(
        (F.col("field") == field) & F.col("term").isin(terms)
    ).withColumn("w", weight_map[F.col("term")])
    if mode == "elasticlunr":
        ub = F.sqrt(F.col("max_tf_raw")) * F.col("w")
    else:
        ub = F.col("w") * (F.col("max_tf_raw") * (k1 + 1.0)) / (
            F.col("max_tf_raw") + k1 * (1.0 - b)
        )
    cand = cand.withColumn("ub", ub)
    meta_cols = ["field", "term", "block_id", "ub"]

    # multi-generation indexes (build/deltas.py) keep tombstoned docs
    # inside segment payloads until compact(); filter them after decode
    # in BOTH phases — an unfiltered seed could set the threshold from a
    # removed doc's score and wrongly prune live blocks
    tomb_ords = getattr(index, "_tomb_ords", None)

    def exact_scores(blocks: DataFrame) -> DataFrame:
        decoded = decode_segments(
            blocks.select("field", "term", "block_id", "payload"), block_size
        )
        if tomb_ords is not None:
            decoded = decoded.join(F.broadcast(tomb_ords), "ord", "left_anti")
        decoded = decoded.withColumn("w", weight_map[F.col("term")])
        if mode == "elasticlunr":
            entry = F.sqrt(F.col("tf_raw")) * F.col("w")
            agg = F.max(entry)
        else:
            entry = F.col("w") * (F.col("tf_raw") * (k1 + 1.0)) / (
                F.col("tf_raw")
                + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(avgdl))
            )
            agg = F.sum(entry)
        return decoded.groupBy("ord").agg(agg.alias("score"))

    # ---- phase 1: seed threshold from the best block per term ----------
    from pyspark.sql import Window

    best = (
        cand.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("term").orderBy(
                    F.desc("ub"), F.asc("block_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    seed = (
        exact_scores(best)
        .orderBy(F.desc("score"), F.asc("ord"))
        .limit(k)
        .collect()
    )
    theta = seed[-1]["score"] if len(seed) >= k else 0.0

    # ---- phase 2: block-max pruning -------------------------------------
    if theta > 0:
        if mode == "elasticlunr":
            keep = F.col("ub") >= theta - 1e-9
        else:
            gub = {
                r["term"]: r["g"]
                for r in cand.groupBy("term").agg(F.max("ub").alias("g")).collect()
            }
            total_gub = sum(gub.values())
            others = F.create_map(
                *[x for t in gub for x in (F.lit(t), F.lit(total_gub - gub[t]))]
            )
            keep = (F.col("ub") + others[F.col("term")]) >= theta - 1e-9
        survivors = cand.where(keep)
    else:
        survivors = cand

    # join docids BEFORE the top-k limit: the tie-break at the k-th
    # score must be on docid (the exhaustive scorer's tie-break) — an
    # ord tie-break is only equivalent while ordinals are assigned in
    # docid sort order, which ingest-time (partition-strided) ordinal
    # assignment does not guarantee. The join input is the pruned
    # candidate set, not the corpus.
    return (
        exact_scores(survivors)
        .join(ordinals, "ord")
        .select("docid", (F.col("score") * F.lit(float(boost))).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
