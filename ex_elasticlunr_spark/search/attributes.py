"""Doc-attribute filtering and aggregations (extensions).

The reference scores text fields only — a document's non-indexed
attributes (timestamps, sources, conversation ids) never participate in
a query (core/index.ex keeps just ``ref`` + field token maps). Real
transcript search constantly needs them: "this phrase, last week",
"best matching turn per conversation", "matches over time". These are
the standard search-engine extensions on top of the flat hit list:

* ``range_scores``   — the ES ``range`` clause: constant-score
  membership by attribute bounds, composing with the bool filter chain
  via the same restrict semi-join every leaf uses;
* ``exists_scores``  — the ES ``exists`` clause: docs whose attribute
  is non-null (same membership plumbing as range);
* ``facet_date_histogram`` — ``date_histogram`` aggregation over a
  query's matched docs;
* ``facet_stats``    — the ES ``stats`` aggregation: count/min/max/
  avg/sum of a numeric attribute over a query's matched docs;
* ``collapse_top`` — ES field collapsing: the best-scoring doc per
  attribute value (for transcripts: best TURN per CONVERSATION);
* ``decay_scores`` — function_score-style recency decay: multiply a
  query's scores by exp/gauss/linear distance decay from an origin
  (for transcripts: recent turns rank higher).

Attributes are a user-bound DataFrame keyed by docid
(``Index.bind_attributes``), typically the corpus table itself — at
100 TB that is a parquet/Iceberg scan whose attribute predicates PUSH
DOWN (the range condition lands in the scan's PushedFilters, nothing
else of the corpus is read), and whose join with the matched set is
bounded by match volume: AQE broadcasts the small side for selective
queries.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from . import scorer

RANGE_OPS = ("gte", "gt", "lte", "lt")


def _require_attr(attributes: DataFrame, attr: str) -> None:
    """Shared unknown-attribute guard (one message shape everywhere)."""
    if attr not in attributes.columns:
        raise ValueError(
            f"unknown attribute {attr!r}; bound attributes carry "
            f"{[c for c in attributes.columns if c != 'docid']}")


def _validate_bound(value, dt) -> None:
    """Reject range-bound literals the cast would silently NULL out.

    ``F.lit(bound).cast(attr_type)`` turns an unparseable literal into
    NULL, and ``col >= NULL`` filters EVERY row — a typo'd date would
    silently match nothing (or everything under ``not``). ES raises a
    parse error for malformed bounds; so do we, driver-side at query
    compile time. Timestamp/date bounds must be ISO-8601 (or
    datetime/date objects); numeric bounds must be numbers or numeric
    strings."""
    import datetime as _dt

    name = dt.typeName()
    if name in ("timestamp", "timestamp_ntz", "date"):
        if isinstance(value, (_dt.date, _dt.datetime)):
            return
        try:
            _dt.datetime.fromisoformat(str(value))
        except ValueError:
            raise ValueError(
                f"unparseable {name} bound {value!r}: use ISO-8601 "
                f"(e.g. '2026-01-01 00:00:00') or a datetime object"
            ) from None
        return
    if name in ("byte", "short", "integer", "long", "float", "double",
                "decimal"):
        try:
            float(value)
        except (TypeError, ValueError):
            raise ValueError(
                f"unparseable numeric bound {value!r} for {name} "
                f"attribute") from None

# date_trunc units that bucket a timestamp onto calendar boundaries
HISTOGRAM_INTERVALS = (
    "year", "quarter", "month", "week", "day", "hour", "minute", "second",
)


def range_condition(attributes: DataFrame, attr: str, conds: dict):
    """The boolean Column for ``conds`` ({gte/gt/lte/lt: value}) over
    ``attr``, literals cast to the attribute's own type so timestamp
    bounds can be given as ISO strings and comparisons stay typed (no
    per-row string coercion in the scan)."""
    _require_attr(attributes, attr)
    bad = set(conds) - set(RANGE_OPS)
    if bad or not conds:
        raise ValueError(
            f"range bounds must be a non-empty subset of {RANGE_OPS}, "
            f"got {sorted(conds)}")
    dt = attributes.schema[attr].dataType
    col = F.col(attr)
    out = None
    for op in RANGE_OPS:  # fixed order -> stable plans
        if op not in conds:
            continue
        _validate_bound(conds[op], dt)
        lit = F.lit(conds[op]).cast(dt)
        c = {"gte": col >= lit, "gt": col > lit,
             "lte": col <= lit, "lt": col < lit}[op]
        out = c if out is None else (out & c)
    return out


def _membership_scores(inv, attributes: DataFrame, cond, boost: float,
                       restrict: Optional[DataFrame] = None,
                       with_details: bool = False) -> DataFrame:
    """Constant-score membership over an attribute predicate — the
    shared compile shape for range/exists clauses.

    Plan shape: attribute predicate -> pushed parquet filter on the
    attributes scan; docid -> ord translation through the FULL ordinal
    map (zero-content docs are legitimate attribute matches, same
    universe match_all serves); membership restricted either by the
    incoming ``restrict`` (filter-chain position) or by the live-docs
    universe (root position — attributes may carry docids the index
    never held or has tombstoned)."""
    key = inv.key_col
    sel = attributes.where(cond).select("docid")
    if key == "ord":
        sel = sel.join(inv.ordinals_df(full=True), "docid").select("ord")
    out = sel.select(key, F.lit(float(boost)).alias("score"))
    if restrict is not None:
        # no distinct: semi-join semantics dedupe the right side for
        # free (same shape every other leaf uses for restrict)
        out = out.join(restrict.select(key), key, "left_semi")
    else:
        out = out.join(scorer._universe(inv), key, "left_semi")
    if with_details:
        out = out.select("*", *scorer._details_cols())
    return out


def range_scores(inv, attributes: DataFrame, node,
                 restrict: Optional[DataFrame] = None,
                 with_details: bool = False) -> DataFrame:
    """Compile a RangeNode: docs whose attribute satisfies the bounds,
    constant score = boost (like match_all/not — positive, so the bool
    filter chain's score>0 gate keeps survivors)."""
    cond = range_condition(attributes, node.attr, node.conds)
    return _membership_scores(inv, attributes, cond, node.boost,
                              restrict=restrict,
                              with_details=with_details)


def exists_scores(inv, attributes: DataFrame, node,
                  restrict: Optional[DataFrame] = None,
                  with_details: bool = False) -> DataFrame:
    """Compile an ExistsNode: docs whose attribute is NON-NULL,
    constant score = boost. The IsNotNull predicate pushes into the
    attribute scan like a range bound does."""
    _require_attr(attributes, node.attr)
    cond = F.col(node.attr).isNotNull()
    return _membership_scores(inv, attributes, cond, node.boost,
                              restrict=restrict,
                              with_details=with_details)


def facet_date_histogram(scored: DataFrame, attributes: DataFrame,
                         attr: str, interval: str = "day",
                         min_count: int = 1) -> DataFrame:
    """date_histogram over a query's matched docs: DataFrame
    (bucket timestamp, doc_count) ordered by bucket, where bucket =
    ``date_trunc(interval, attr)``.

    ``scored`` is the translated (docid, score) matched set
    (QueryExecutor.scored_docids). One hash join bounded by match
    volume, one partial-aggregated groupBy on the bucket — bucket
    cardinality is tiny (hours/days), so the final shuffle is a few
    rows per partition."""
    if interval not in HISTOGRAM_INTERVALS:
        raise ValueError(
            f"interval must be one of {HISTOGRAM_INTERVALS}, "
            f"got {interval!r}")
    _require_attr(attributes, attr)
    # no distinct: scored_docids is per-doc unique by construction
    # (every compiled tree aggregates to one row per doc)
    m = scored.select("docid")
    j = m.join(attributes.select("docid", attr), "docid") \
         .where(F.col(attr).isNotNull())  # ES: missing field -> no bucket
    counts = (
        j.select(F.date_trunc(interval, F.col(attr)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    if min_count > 1:
        counts = counts.where(F.col("doc_count") >= min_count)
    return counts.orderBy(F.asc("bucket"))


def facet_histogram(scored: DataFrame, attributes: DataFrame,
                    attr: str, interval: float,
                    min_count: int = 1) -> DataFrame:
    """ES ``histogram`` aggregation: matched-doc counts of a NUMERIC
    attribute in fixed-width buckets — DataFrame(bucket double,
    doc_count) ordered by bucket, where bucket = floor(attr/interval)
    * interval (ES's bucket key formula, left-closed intervals).

    Same plan shape as :func:`facet_date_histogram`: one hash join
    bounded by match volume, one partial-aggregated groupBy whose key
    cardinality is (range/interval) — tiny, so the final shuffle is a
    few rows per partition. Null attributes drop (ES: docs without the
    field are not bucketed)."""
    if not interval or interval <= 0:
        raise ValueError(f"interval must be > 0, got {interval!r}")
    _require_attr(attributes, attr)
    m = scored.select("docid")  # scored_docids is per-doc unique
    j = m.join(attributes.select("docid", attr), "docid") \
         .where(F.col(attr).isNotNull())
    iv = F.lit(float(interval))
    counts = (
        j.select((F.floor(F.col(attr) / iv) * iv)
                 .cast("double").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    if min_count > 1:
        counts = counts.where(F.col("doc_count") >= min_count)
    return counts.orderBy(F.asc("bucket"))


def collapse_top(scored: DataFrame, attributes: DataFrame, attr: str,
                 top_k: int = 10) -> DataFrame:
    """ES field collapsing: the single best-scoring doc per value of
    ``attr`` — DataFrame(<attr>, docid, score, group_size) ordered
    (score desc, docid asc), limited to the ``top_k`` best groups.

    For transcripts (docid = conv:turn, attr = conv_id) this is "best
    turn per conversation" — the result shape users actually page
    through.

    One shuffle, fully map-side combinable: the winner inside each
    group is ``min_by(docid, struct(-score, docid))`` — struct ordering
    realizes the (score desc, docid asc) tie-break inside a single
    associative aggregate, so partial aggregation runs on every map
    partition and no per-group row list ever materializes (a window
    row_number() would shuffle every matched row unreduced). max(score)
    is the same winner's score by construction; count(*) is the group
    size. The final (score desc, docid asc) top-k is a TakeOrdered over
    one row per group."""
    _require_attr(attributes, attr)
    # NULL collapse values drop (module policy, same as decay/facets:
    # docs missing the field don't form a meaningful group)
    joined = scored.join(
        attributes.select("docid", attr).where(F.col(attr).isNotNull()),
        "docid")
    winners = joined.groupBy(attr).agg(
        F.expr("min_by(docid, struct(-score, docid))").alias("docid"),
        F.max("score").alias("score"),
        F.count(F.lit(1)).alias("group_size"),
    )
    out = winners.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(top_k) if top_k is not None else out


def facet_stats(scored: DataFrame, attributes: DataFrame,
                attr: str) -> DataFrame:
    """ES ``stats`` aggregation: one row of doc_count / min_v / max_v /
    avg_v / sum_v for a NUMERIC attribute over a query's matched docs.

    One hash join bounded by match volume, then a fully map-side-
    combinable global aggregate (all five stats are associative) — at
    scale the final reduce sees one partial row per partition."""
    _require_attr(attributes, attr)
    m = scored.select("docid")  # scored_docids is per-doc unique
    j = m.join(attributes.select("docid", attr), "docid")
    c = F.col(attr)
    return j.agg(
        F.count(c).alias("doc_count"),
        F.min(c).cast("double").alias("min_v"),
        F.max(c).cast("double").alias("max_v"),
        F.avg(c).alias("avg_v"),
        F.sum(c).cast("double").alias("sum_v"),
    )


DECAY_SHAPES = ("exp", "gauss", "linear")


def decay_multiplier(attr_col, dt, origin, scale: float,
                     decay: float = 0.5, shape: str = "exp"):
    """The per-doc decay factor Column: ES function_score decay
    functions (exp/gauss/linear) of |attr - origin| measured in the
    attribute's own units — seconds for timestamps, raw magnitude for
    numerics. ``scale`` is the distance at which the factor equals
    ``decay``; linear clamps at 0 past scale/(1-decay)."""
    import math

    if shape not in DECAY_SHAPES:
        raise ValueError(f"shape must be one of {DECAY_SHAPES}, "
                         f"got {shape!r}")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    if scale <= 0:
        raise ValueError("scale must be positive")
    if dt.typeName() in ("timestamp", "timestamp_ntz", "date"):
        # distance in SECONDS between timestamps; unix_timestamp is
        # a pure column expr (stays in codegen)
        dist = F.abs(F.unix_timestamp(attr_col)
                     - F.unix_timestamp(F.lit(origin).cast("timestamp")))
    else:
        dist = F.abs(attr_col.cast("double") - F.lit(float(origin)))
    dist = dist.cast("double")
    if shape == "exp":
        lam = math.log(decay) / scale
        return F.exp(F.lit(lam) * dist)
    if shape == "gauss":
        # exp(-dist^2 / (2*sigma^2)), sigma^2 = -scale^2 / (2 ln decay)
        sigma2 = -(scale ** 2) / (2.0 * math.log(decay))
        return F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    # linear: max(0, (s - dist) / s), s = scale / (1 - decay)
    s = scale / (1.0 - decay)
    return F.greatest(F.lit(0.0), (F.lit(s) - dist) / F.lit(s))


def decay_scores(scored: DataFrame, attributes: DataFrame, attr: str,
                 origin, scale: float, decay: float = 0.5,
                 shape: str = "exp") -> DataFrame:
    """function_score-style decay rescoring: a query's (docid, score)
    multiplied by the decay factor of its attribute distance from
    ``origin`` — DataFrame(docid, score) UNSORTED (the caller adds the
    global top-k like any other query result). Docs with a NULL
    attribute are dropped (no meaningful distance), matching ES's
    requirement that decay fields exist on every scored doc.

    The multiply is one hash join bounded by match volume plus pure
    column exprs — no shuffle beyond the join, nothing leaves
    codegen."""
    _require_attr(attributes, attr)
    dt = attributes.schema[attr].dataType
    _validate_bound(origin, dt)  # an unparseable origin would NULL-cast
    mult = decay_multiplier(F.col(attr), dt, origin, scale,
                            decay=decay, shape=shape)
    j = scored.join(
        attributes.select("docid", attr).where(F.col(attr).isNotNull()),
        "docid")
    return j.select("docid",
                    (F.col("score") * mult).alias("score"))
