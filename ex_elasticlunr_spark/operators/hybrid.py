"""Hybrid retrieval: fuse lexical (BM25) and vector (cosine) rankings.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):

    rrf(d) = Σ_lists 1 / (k + rank_list(d))        k = 60 by default

RRF needs only the per-list RANK, not the score scale, so it composes
rankings whose score distributions are incomparable (BM25 vs cosine)
without calibration — the standard first choice for hybrid search.

Scale shape: each input list is already a top-N (driver-bounded, tiny);
ranking each list is a window over ≤N rows, the fusion is a unionByName
+ one groupBy over ≤ lists·N rows. Nothing here touches the corpus —
the heavy work happened inside the per-list retrievals, which scan
their own pruned structures (postings / LSH buckets).

Determinism: list scores are rounded to 6 decimals before ranking and
ties break on the id, so ranks — and therefore fused scores — are
bit-identical across engines (1/(k+rank) sums of two doubles are
exactly commutative in IEEE arithmetic).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fusion(rankings: List[DataFrame], k: int = 60,
               id_col: str = "docid", score_col: str = "score",
               top_n: Optional[int] = None) -> DataFrame:
    """Fuse ranked lists into DataFrame(id_col, rrf_score, n_lists).

    Each input carries (id_col, score_col); higher score = better.
    ``n_lists`` counts how many input lists contained the doc — a
    useful confidence signal (matched-by-both vs single-modality).
    """
    if not rankings:
        raise ValueError("rrf_fusion needs at least one ranked list")
    ranked = []
    for df in rankings:
        w = Window.orderBy(F.desc(F.round(F.col(score_col), 6)),
                           F.asc(F.col(id_col)))
        ranked.append(
            df.select(F.col(id_col).cast("string").alias(id_col),
                      F.row_number().over(w).alias("rank")))
    unioned = ranked[0]
    for r in ranked[1:]:
        unioned = unioned.unionByName(r)
    fused = (
        unioned.groupBy(id_col)
        .agg(
            F.round(F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))),
                    6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
    )
    # `is not None`: top_n=0 legitimately means "no rows", not "all"
    return fused.limit(top_n) if top_n is not None else fused
