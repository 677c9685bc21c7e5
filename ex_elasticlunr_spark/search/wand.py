"""Block-max WAND top-k over compressed posting segments.

Distributed two-phase block-max pruning (the document-at-a-time WAND
heap doesn't map onto a shuffle-based engine; the block-max *pruning*
does, and is where the asymptotic win lives), generalized to
minimum_should_match (``operator: "and"`` match queries,
match_query.ex:52-60) and multi-clause queries (the bool/should of
per-field match clauses behind the string-search sugar,
index.ex:181-224, with per-field boosts).

Query model: a list of CLAUSES, each (field, resolved terms with
multiplicities, boost, per-clause msm). A doc's clause score is the
max (elasticlunr mode, terms_query.ex:80-97) or sum (bm25) of its
matched entry scores, times the clause boost; a clause matches when
the doc's matched-entry count (Σ term multiplicities) reaches the
clause msm; the doc's total is the sum of matching clauses' scores and
it qualifies when >= ``msm`` clauses match — exactly the exhaustive
executor's bool/should algebra (dsl/executor.py), so results are
rank-identical to it (tests/test_segments_wand.py).

Phases (all pruning decisions are on BLOCK METADATA — payloads of
pruned blocks are never decoded, and parquet column pruning keeps
their bytes unread):

  Coverage prune: block ranges are ordinal-aligned ACROSS terms and
  fields (block_id = ord // block_size), so every entry of a doc lives
  at the same block_id. A clause can only match docs at block_id B if
  the multiplicity-weighted sum of its terms present at B reaches the
  clause msm, and a doc can only qualify if >= msm clauses are
  matchable at its B — the block-granular intersection that makes AND
  queries cheap. (Driver-side over per-(block, clause) aggregates,
  capped at METADATA_CAP rows — beyond the cap the prune is skipped,
  never wrong.)

  Phase 1 (seed the threshold): pick the few block_ids with the
  highest upper-bound potential and decode EVERY candidate term's
  block there. Ordinal alignment makes those docs' totals EXACT (all
  their entries live in the decoded blocks), so θ = the k-th best
  exact total among msm-qualified docs — a valid lower bound on the
  final k-th score, and a much tighter seed than one best block per
  term.

  Phase 2 (prune + score): a block b of (clause c, term t) can contain
  a top-k doc only if
    bm25:        ub(b) + Σ_{(c',t')≠(c,t)} gub(c',t')          >= θ
    elasticlunr: max(ub(b), max_{t'≠t∈c} gub) + Σ_{c'≠c} cgub(c') >= θ
  (gub = global per-term block-max bound, cgub = per-clause max; both
  include the clause boost). Every block holding ANY entry of a doc
  with total >= θ survives these bounds, so surviving-doc scores and
  match counts are exact; pruned-block docs have total < θ <= k-th
  final score and cannot displace the (>= k) fully-scored docs.

Block upper bounds per mode (max_tf_raw is stored block metadata):
  elasticlunr: sqrt(max_tf_raw) * idf(t)^2 * flnorm * boost
  bm25:        idf_bm25(t) * mult * boost
               * max_tf*(k1+1) / (max_tf + k1*(1-b))
               (doc_len -> 0 bound: the true denominator is larger)

doc_len (bm25 denominators only — elasticlunr never touches it) comes
from the codec-v2 ``len_blocks`` side table (build/segments.py): one
entry per (field, doc) instead of the v1 per-posting copy; the decode
is restricted to exactly the candidate (field, block_id) pairs and
joins the decoded postings on the same alignment.

Scale shape: pruning reads #candidate-blocks METADATA rows; phase 1
decodes |seed block_ids| x |terms| blocks; phase 2's decode +
per-doc aggregation shuffle is bounded by surviving blocks only, keyed
by int64 ordinals.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from ..build.segments import (
    DEFAULT_BLOCK_SIZE,
    decode_len_blocks,
    decode_segments,
)
from ..functions.literals import inline_rows

# above this many per-(block, clause) metadata rows the driver-side
# coverage/seed bookkeeping would stop being "metadata-sized" — skip
# the coverage prune and pick seeds with a TakeOrdered job instead
METADATA_CAP = 32768
SEED_BLOCK_IDS = 2
EPS = 1e-9

_META_SCHEMA = (
    "cid int, field string, term string, w double, mult long, "
    "boost double, cmsm long, avgdl double"
)
_PRUNE_SCHEMA = "cid int, term string, pbound double"


@dataclass
class WandClause:
    """One scoring clause: ``terms`` maps each RESOLVED vocabulary term
    to its multiplicity (the number of query terms that matched it —
    the unit minimum_should_match counts, field.ex:160-205)."""

    field: str
    terms: Dict[str, int]
    boost: float = 1.0
    msm: int = 1


def resolve_clause(index, field: str, terms: Sequence[str],
                   boost: float = 1.0, msm: int = 1,
                   expand: bool = False, fuzziness: int = 0,
                   regex: bool = False) -> WandClause:
    """Build a WandClause from raw query terms. Expansion resolves
    against the VOCABULARY first (term_stats — the same
    edit-ball/prefix/regex resolve as the exhaustive path); a vocab
    term matched by multiple query terms contributes once per match,
    so it carries that multiplicity."""
    if expand or fuzziness > 0 or regex:
        from .scorer import _query_terms_df

        m = _query_terms_df(index, field, list(dict.fromkeys(terms)),
                            expand, fuzziness, regex=regex)
        mult = {
            r["term"]: r["n"]
            for r in m.groupBy("term").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
    else:
        mult = {}
        for t in terms:
            mult[t] = mult.get(t, 0) + 1
    return WandClause(field=field, terms=mult, boost=float(boost),
                      msm=max(int(msm), 1))


def _clause_stats(index, clauses: List[WandClause], mode: str) -> list:
    """One vocabulary lookup for every (clause, term): rows of
    (cid, field, term, w, mult, boost, cmsm, avgdl). |rows| = Σ|terms|
    — query-sized, driver-held."""
    pairs = [(c.field, t) for c in clauses for t in c.terms]
    if not pairs:
        return []
    fields = sorted({c.field for c in clauses})
    frows = {
        r["field"]: r
        for r in index.field_stats.where(F.col("field").isin(fields))
        .select("field", "flnorm", "n_docs", "avg_doc_len").collect()
    }
    cond = None
    for f in fields:
        terms = sorted({t for c in clauses if c.field == f for t in c.terms})
        branch = (F.col("field") == f) & F.col("term").isin(terms)
        cond = branch if cond is None else (cond | branch)
    trows = {
        (r["field"], r["term"]): r
        for r in index.term_stats.where(cond)
        .select("field", "term", "df", "idf").collect()
    }
    out = []
    for cid, c in enumerate(clauses):
        fr = frows.get(c.field)
        if fr is None:
            continue
        for t, n in sorted(c.terms.items()):
            tr = trows.get((c.field, t))
            if tr is None:
                continue
            if mode == "elasticlunr":
                w = tr["idf"] ** 2 * fr["flnorm"]
            else:
                # sum mode: a term matched by n query terms contributes
                # n identical entries to the exhaustive sum
                w = n * math.log(
                    1.0 + (fr["n_docs"] - tr["df"] + 0.5) / (tr["df"] + 0.5))
            out.append((cid, c.field, t, float(w), int(n), c.boost,
                        c.msm, float(fr["avg_doc_len"] or 0.0)))
    return out


def wand_topk_multi(
    index,
    clauses: List[WandClause],
    k: int = 10,
    mode: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
    msm: int = 1,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> DataFrame:
    """Top-k (docid, score) over the clause list — rank-identical to
    the exhaustive bool/should-of-terms plan (or the bare terms plan
    for a single clause). Clause fields must be distinct (the sugar's
    shape; dedupe/merge clauses on the same field before calling)."""
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "docid string, score double")
    if len({c.field for c in clauses}) != len(clauses):
        raise ValueError("wand clauses must target distinct fields")
    msm = max(int(msm), 1)

    segments, ordinals = index.segments(block_size)
    # decode must use the block size the segments were actually built
    # with (segments() may reuse an earlier build)
    block_size = index._segments[0]

    stats = _clause_stats(index, clauses, mode)
    if not stats:
        return empty
    meta = F.broadcast(inline_rows(spark, stats, _META_SCHEMA))

    # ---- candidate block metadata (one pushed scan branch per clause) --
    cand = None
    by_cid: Dict[int, dict] = {}
    for row in stats:
        by_cid.setdefault(row[0], {"field": row[1], "terms": []})
        by_cid[row[0]]["terms"].append(row[2])
    for cid, info in by_cid.items():
        branch = segments.where(
            (F.col("field") == info["field"])
            & F.col("term").isin(info["terms"]))
        cand = branch if cand is None else cand.unionByName(branch)
    cand = cand.join(meta, ["field", "term"])
    if mode == "elasticlunr":
        ub = F.sqrt(F.col("max_tf_raw")) * F.col("w") * F.col("boost")
    else:
        ub = (F.col("w") * F.col("boost")
              * (F.col("max_tf_raw") * (k1 + 1.0))
              / (F.col("max_tf_raw") + k1 * (1.0 - b)))
    cand = cand.withColumn("ub", ub)

    # ---- driver-side block bookkeeping ---------------------------------
    # per-(block_id, clause): multiplicity coverage + bound potential;
    # capped — beyond the cap the coverage prune is skipped (a pure
    # optimization) and seeds come from a TakeOrdered job instead
    agg_pot = (F.max("ub") if mode == "elasticlunr"
               else F.sum("ub")).alias("pot")
    per_bc = (
        cand.groupBy("block_id", "cid")
        .agg(F.sum("mult").alias("cov"), agg_pot,
             F.first("cmsm").alias("cmsm"))
        .limit(METADATA_CAP + 1)
        .collect()
    )
    lens_pairs: Optional[List[Tuple[str, int]]] = None
    # block_id*64+cid keys are injective only below 64 clauses; past
    # that (or past the cap) skip the coverage prune — never wrong
    if len(per_bc) <= METADATA_CAP and len(clauses) <= 64:
        # coverage prune: matchable clauses per block_id
        by_b: Dict[int, dict] = {}
        for r in per_bc:
            e = by_b.setdefault(r["block_id"], {"nmatch": 0, "pot": 0.0,
                                                "cids": []})
            if r["cov"] >= r["cmsm"]:
                e["nmatch"] += 1
                e["pot"] += r["pot"]
                e["cids"].append(r["cid"])
        good = {bid: e for bid, e in by_b.items() if e["nmatch"] >= msm}
        if not good:
            return empty
        # per-(block, clause) keys: a clause unmatchable at B never
        # contributes entries there even when B itself is good
        good_keys = [bid * 64 + cid for bid, e in good.items()
                     for cid in e["cids"]]
        seed_ids = [bid for bid, _ in sorted(
            good.items(), key=lambda kv: -kv[1]["pot"])[:SEED_BLOCK_IDS]]
        lens_pairs = sorted({
            (by_cid[cid]["field"], bid)
            for bid, e in good.items() for cid in e["cids"]})
        bkey = F.col("block_id") * 64 + F.col("cid")
        cand = cand.where(bkey.isin(good_keys))
    else:
        # sum-of-ubs is a seed-choice heuristic only (exactness of the
        # seed scores never depends on which block_ids are picked)
        pot_b = cand.groupBy("block_id").agg(F.sum("ub").alias("p"))
        seed_ids = [r["block_id"] for r in
                    pot_b.orderBy(F.desc("p")).limit(SEED_BLOCK_IDS).collect()]

    # ---- shared decode + exact aggregation ----------------------------
    tomb_ords = getattr(index, "_tomb_ords", None)

    def _lens_for(blocks: DataFrame,
                  pairs: Optional[List[Tuple[str, int]]]) -> DataFrame:
        lens = index.seg_len_blocks(block_size)
        if pairs is not None:
            cond = None
            for f in sorted({p[0] for p in pairs}):
                bids = [p[1] for p in pairs if p[0] == f]
                branch = (F.col("field") == f) & F.col("block_id").isin(bids)
                cond = branch if cond is None else (cond | branch)
            lens = lens.where(cond)
        else:
            lens = lens.join(
                blocks.select("field", "block_id").distinct(),
                ["field", "block_id"], "left_semi")
        return decode_len_blocks(lens, block_size)

    def exact_scores(blocks: DataFrame,
                     pairs: Optional[List[Tuple[str, int]]]) -> DataFrame:
        decoded = decode_segments(
            blocks.select("field", "term", "block_id", "payload"), block_size)
        # multi-generation indexes (build/deltas.py) keep tombstoned
        # docs inside segment payloads until compact(); filter them in
        # BOTH phases — an unfiltered seed could set the threshold from
        # a removed doc's score and wrongly prune live blocks
        if tomb_ords is not None:
            decoded = decoded.join(F.broadcast(tomb_ords), "ord", "left_anti")
        decoded = decoded.join(meta, ["field", "term"])
        if mode == "elasticlunr":
            entry = F.sqrt(F.col("tf_raw")) * F.col("w")
            agg = F.max(entry)
        else:
            decoded = decoded.join(_lens_for(blocks, pairs), ["field", "ord"])
            entry = F.col("w") * (F.col("tf_raw") * (k1 + 1.0)) / (
                F.col("tf_raw")
                + k1 * (1.0 - b + b * F.col("doc_len") / F.col("avgdl"))
            )
            agg = F.sum(entry)
        per_clause = (
            decoded.groupBy("ord", "cid")
            .agg(agg.alias("raw"), F.sum("mult").alias("n_entries"),
                 F.first("boost").alias("boost"),
                 F.first("cmsm").alias("cmsm"))
            .where(F.col("n_entries") >= F.col("cmsm"))
        )
        return (
            per_clause.groupBy("ord")
            .agg(F.sum(F.col("raw") * F.col("boost")).alias("score"),
                 F.count(F.lit(1)).alias("matched"))
            .where(F.col("matched") >= F.lit(msm))
            .select("ord", "score")
        )

    # ---- phase 1: exact threshold from the best-aligned block_ids ------
    theta = 0.0
    if seed_ids:
        seed_pairs = sorted({(info["field"], bid)
                             for bid in seed_ids
                             for info in by_cid.values()})
        seed = (
            exact_scores(cand.where(F.col("block_id").isin(seed_ids)),
                         seed_pairs)
            .select("score").orderBy(F.desc("score")).limit(k).collect()
        )
        if len(seed) >= k:
            theta = seed[-1]["score"]

    # ---- phase 2: block-max pruning ------------------------------------
    if theta > 0:
        gub: Dict[Tuple[int, str], float] = {}
        for r in cand.groupBy("cid", "term").agg(
                F.max("ub").alias("g")).collect():
            gub[(r["cid"], r["term"])] = r["g"]
        if mode == "elasticlunr":
            cgub: Dict[int, float] = {}
            for (cid, _t), g in gub.items():
                cgub[cid] = max(cgub.get(cid, 0.0), g)
            total_cgub = sum(cgub.values())
            # keep-rule: max(ub, best OTHER term in this clause) plus
            # the other clauses' ceilings must clear θ
            pmeta = F.broadcast(inline_rows(
                spark,
                [(cid, t,
                  max([g2 for (c2, t2), g2 in gub.items()
                       if c2 == cid and t2 != t] or [0.0]),
                  total_cgub - cgub[cid])
                 for (cid, t) in sorted(gub)],
                "cid int, term string, cmaxo double, oadd double"))
            scored = cand.join(pmeta, ["cid", "term"])
            keep = (F.greatest(F.col("ub"), F.col("cmaxo"))
                    + F.col("oadd")) >= theta - EPS
        else:
            total_gub = sum(gub.values())
            pmeta = F.broadcast(inline_rows(
                spark,
                sorted((cid, t, total_gub - g)
                       for (cid, t), g in gub.items()),
                _PRUNE_SCHEMA))
            scored = cand.join(pmeta, ["cid", "term"])
            keep = (F.col("ub") + F.col("pbound")) >= theta - EPS
        survivors = scored.where(keep)
    else:
        survivors = cand

    # join docids BEFORE the top-k limit: the tie-break at the k-th
    # score must be on docid (the exhaustive scorer's tie-break) — an
    # ord tie-break is only equivalent while ordinals are assigned in
    # docid sort order, which ingest-time (partition-strided) ordinal
    # assignment does not guarantee. The join input is the pruned
    # candidate set, not the corpus.
    return (
        exact_scores(survivors, lens_pairs)
        .join(ordinals, "ord")
        .select("docid", "score")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


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
    msm: int = 1,
) -> DataFrame:
    """Single-field top-k — rank-identical to the exhaustive scorer for
    any minimum_should_match (exact terms, or prefix/fuzzy/regex
    expansion). Thin wrapper over :func:`wand_topk_multi`."""
    clause = resolve_clause(index, field, terms, boost=boost, msm=msm,
                            expand=expand, fuzziness=fuzziness, regex=regex)
    if not clause.terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], "docid string, score double")
    return wand_topk_multi(index, [clause], k=k, mode=mode, k1=k1, b=b,
                           msm=1, block_size=block_size)
