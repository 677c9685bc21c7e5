"""Percolation: reverse search over REGISTERED queries (the ES/Lucene
percolator shape — the reference family's alerting primitive; not in
heywhy/ex_elasticlunr's DSL, an extension like BM25 mode).

A percolator inverts the search direction: the queries are the stored
data (alert rules, routing rules, saved searches) and the DOCUMENTS
arrive as the stream — "which of my N registered queries match this
incoming doc?" asked for a whole batch at once. No index over the
documents is needed or built.

Plan shape (100 TB rationale — a firehose of incoming docs against
millions of rules):
  * incoming docs are analyzed ONCE with the same Arrow-batched
    analyzer as ingest (functions/udfs.analyze_postings) — one
    map-only pass, one row per (doc, distinct term);
  * driver-side rules inline as a JVM literal relation and BROADCAST
    into the term join (rules x terms is tiny next to the doc stream);
    corpus-sized rule sets arrive as a DataFrame and hash-join on the
    term key instead — either way the doc stream is touched exactly
    once and never shuffled on anything wider than (query_id, docid);
  * the match test is ONE aggregation: count of distinct rule terms
    present per (rule, doc) vs the rule's term count (operator="and"
    semantics, the alerting default) or an explicit
    minimum_should_match.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, functions as F

from ..functions.literals import inline_rows
from ..functions.udfs import AnalyzerConfig, analyze_postings


def percolate(
    docs: DataFrame,
    queries: Union[dict, DataFrame],
    field: str = "text",
    docid_col: str = "docid",
    text_col: Optional[str] = None,
    analyzer: Optional[AnalyzerConfig] = None,
    minimum_should_match: Optional[int] = None,
) -> DataFrame:
    """Match every registered query against every incoming document.

    ``docs``: DataFrame carrying ``docid_col`` and the text column
    (``text_col``, default = ``field``). ``queries``: a driver-side
    ``{query_id: text}`` mapping (alert rules; broadcast), or a
    DataFrame(query_id, query_text) for corpus-sized rule sets.

    A query matches a doc when at least ``minimum_should_match`` of its
    DISTINCT analyzed terms occur among the doc's analyzed terms —
    ``None`` means ALL of them (``operator="and"``, the alerting
    default; field.ex:160-205 unit counting). Queries that analyze to
    zero terms match nothing. Returns
    DataFrame(query_id, docid, n_matched, n_terms).
    """
    cfg = analyzer or AnalyzerConfig()
    spark = docs.sparkSession
    text_col = text_col or field
    out_schema = ("query_id string, docid string, n_matched bigint, "
                  "n_terms bigint")

    stacked = docs.select(
        F.col(docid_col).cast("string").alias("docid"),
        F.lit(field).alias("field"),
        F.col(text_col).cast("string").alias("content"),
    )
    doc_terms = (
        analyze_postings(stacked, {field: cfg}, positions=False)
        .where(F.col("term").isNotNull())
        .select("docid", "term")
    )

    broadcast_rules = isinstance(queries, dict)
    if broadcast_rules:
        pipeline = cfg.to_query_pipeline()
        rows = []
        for qid, text in sorted(queries.items()):
            terms = sorted(set(pipeline.run_terms(text)))
            for t in terms:
                rows.append((str(qid), t, len(terms)))
        if not rows:
            return spark.createDataFrame([], out_schema)
        qterms = inline_rows(
            spark, rows, "query_id string, term string, n_terms long")
    else:
        if cfg.query_pipeline is not None:
            # the vectorized analyzer ships (stages, separator, extra);
            # a custom query Pipeline is a driver-side object the
            # executors cannot replay (same contract as search_many)
            raise ValueError(
                "percolate with a DataFrame rule set analyzes with the "
                "index pipeline; this analyzer has a distinct "
                "query_pipeline — pass queries as a dict instead")
        qstacked = queries.select(
            F.col("query_id").cast("string").alias("docid"),
            F.lit(field).alias("field"),
            F.col("query_text").cast("string").alias("content"),
        )
        qrows = (analyze_postings(qstacked, {field: cfg}, positions=False)
                 .where(F.col("term").isNotNull())
                 .select(F.col("docid").alias("query_id"), "term")
                 .distinct())
        nt = qrows.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_terms"))
        qterms = qrows.join(nt, "query_id")

    joined = doc_terms.join(
        F.broadcast(qterms) if broadcast_rules else qterms, "term")
    per_pair = joined.groupBy("query_id", "docid").agg(
        F.count_distinct("term").alias("n_matched"),
        F.first("n_terms").alias("n_terms"))
    # msm > n_terms is unmatchable, like the terms-query msm contract
    # (search/scorer.py terms_scores) — no clamping
    required = (F.col("n_terms") if minimum_should_match is None
                else F.lit(int(minimum_should_match)))
    return per_pair.where(F.col("n_matched") >= required).select(
        "query_id", "docid", "n_matched", "n_terms")
