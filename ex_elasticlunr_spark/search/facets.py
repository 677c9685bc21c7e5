"""Term facets — aggregations over a query's matched documents.

The reference has no aggregation layer (its result shape is the flat
scored hit list, core/index.ex:258-266); facets are the standard
search-engine extension on top of it: "given the docs matching this
query, which terms/values are most frequent?". Spark-first design:

* the matched-doc set comes from the same compiled query subtree every
  search runs (dsl/executor.py), keyed by ``ord`` pre-translation so
  no docid strings ride the join;
* the postings side is the narrow term-clustered table — the semi join
  on the doc key is a plain hash join (AQE broadcasts the match set
  when it is small, the common case for selective queries), and the
  per-term partial aggregation is tiny because each clustered
  partition holds few distinct terms (same property the save-time
  stats aggregation exploits, build/indexer.py phase 4);
* top-n with a deterministic (count desc, term asc) tie-break is a
  TakeOrdered, never a global sort.

At 100 TB the postings scan is column-pruned to (field, term, <key>)
and the shuffle is bounded by matched-postings volume, not corpus
size. A doc-values-style doc-clustered projection would trade the
postings scan for a seek-bound lookup; with parquet the column-pruned
clustered scan is the idiomatic equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def facet_terms(inv, matches: DataFrame, field: str, top_n: int = 10,
                min_count: int = 1) -> DataFrame:
    """DataFrame(term, doc_count): the ``top_n`` most frequent terms of
    ``field`` among the docs in ``matches`` (a compiled query result
    carrying the index's doc key column), ties broken on the term.

    ``min_count`` drops long-tail terms before the top-n (facet floors
    are how UIs avoid single-doc noise buckets).
    """
    key = "ord" if "ord" in inv.postings.columns else "docid"
    m = matches.select(key).distinct()
    p = inv.postings.where(F.col("field") == field).select("term", key)
    counts = (
        p.join(m, key, "left_semi")
        # postings are unique per (field, term, doc) by construction
        # (build/indexer.py flat-map + groupBy), so count(*) IS the
        # per-term doc count — no countDistinct shuffle widening
        .groupBy("term").agg(F.count(F.lit(1)).alias("doc_count"))
    )
    if min_count > 1:
        counts = counts.where(F.col("doc_count") >= min_count)
    return counts.orderBy(
        F.desc("doc_count"), F.asc("term")).limit(top_n)
