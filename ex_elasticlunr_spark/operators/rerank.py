"""Second-stage reranking over first-stage retrieval hits.

The standard serving pipeline at scale is retrieve -> rerank: a cheap
first stage (BM25 / ANN) produces top-N candidates per query, then an
expensive pairwise scorer (a cross-encoder model in production) re-ranks
the candidates only. The Spark shape:

    pairs(query_id, docid)            first-stage hits, Q x N rows
      -> join docs on docid           (hits-sized, semi-join restricts
                                       the corpus scan)
      -> broadcast query texts        (driver-side dict, query-count-
                                       sized)
      -> mapInPandas scorer           Arrow-batched (query_text,
                                       doc_text) -> score — the model
                                       boundary; batches are the unit a
                                       GPU/ONNX session would consume
      -> per-query re-sort

Like the multimodal codecs (operators/multimodal.py), the heavy model
is not available in this sandbox, so the DEFAULT scorer is an honest
deterministic stand-in — token-set Jaccard overlap between query and
document — while the plumbing (join shape, Arrow batching, schema,
per-query window) is real and gate-verified. Plug a model in by
passing ``scorer``: a callable (query_text: str, doc_texts:
pd.Series) -> pd.Series of floats, executed per Arrow batch.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.literals import inline_rows


def token_overlap_scorer(query_text: str, doc_texts) -> "pd.Series":
    """Deterministic stub scorer: Jaccard overlap of lowercased
    whitespace token SETS — engine-portable (the SQL oracle reproduces
    it with list_distinct/list_filter)."""
    q = set(str(query_text).lower().split())

    def j(t: str) -> float:
        d = set(str(t).lower().split())
        u = q | d
        return (len(q & d) / len(u)) if u else 0.0

    return doc_texts.map(j)


def rerank_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    queries: Dict[str, str],
    text_col: str = "text",
    id_col: str = "docid",
    scorer: Optional[Callable] = None,
    top_n: Optional[int] = None,
) -> DataFrame:
    """Rerank candidate ``pairs`` (query_id, docid) against ``docs``
    (docid, text): returns DataFrame(query_id, docid, rerank_score,
    rank) — rank 1.. per query by (rounded score desc, docid asc),
    cut to ``top_n`` per query when given.

    ``queries``: driver-side {query_id: query_text} (a rerank stage is
    always downstream of a first stage that had the same dict).

    Scale note: the docs join is an equi-join on docid — for a BULK
    rerank (millions of pairs) that is the right shape (both sides
    shuffle once). For a single ad-hoc query the text fetch reads the
    docs table; a docid-SORTED doc store gets row-group pruning from a
    literal isin — push it yourself when the candidate set is driver-
    resident: ``docs.where(F.col(id_col).isin(ids))``.
    """
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    spark = pairs.sparkSession
    score_fn = scorer or token_overlap_scorer
    qdf = inline_rows(
        spark, sorted((str(k), str(v)) for k, v in queries.items()),
        "query_id string, query_text string")
    d = docs.select(
        F.col(id_col).cast("string").alias("docid"),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("_text"))
    joined = (
        pairs.select(F.col("query_id").cast("string").alias("query_id"),
                     F.col("docid").cast("string").alias("docid"))
        .join(d, "docid")
        .join(F.broadcast(qdf), "query_id")
    )

    def score_batches(it):
        for pdf in it:
            out = pdf[["query_id", "docid"]].copy()
            scores = pd.Series(0.0, index=pdf.index)
            # group by query within the batch: a real cross-encoder
            # tokenizes the query once per group and runs the batch
            # through the model in one forward pass
            import numpy as _np

            for qt, grp in pdf.groupby("query_text"):
                # positional assignment: a scorer returning a fresh
                # RangeIndex Series (the natural model-wrapper shape)
                # would align by INDEX and silently produce NaN scores
                scores.loc[grp.index] = _np.asarray(
                    score_fn(qt, grp["_text"].fillna("")), dtype=float)
            # floor-truncate to 6 decimals instead of rounding: floor is
            # tie-free, so the result is bit-identical in any engine
            # (np.round is half-even, SQL ROUND is half-away — a scorer
            # emitting small rationals can land exactly on a .xxxxxx5)
            import numpy as np

            out["rerank_score"] = np.floor(scores * 1e6) / 1e6
            yield out

    scored = joined.mapInPandas(
        score_batches,
        "query_id string, docid string, rerank_score double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rerank_score"), F.asc("docid"))
    ranked = scored.withColumn("rank", F.row_number().over(w).cast("long"))
    if top_n is not None:  # top_n=0 means "no rows", not "all"
        ranked = ranked.where(F.col("rank") <= top_n)
    return ranked.select("query_id", "docid", "rerank_score", "rank")
