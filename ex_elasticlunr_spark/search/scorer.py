"""Exhaustive DataFrame scorer — the Catalyst-optimized query plan that
is the engine's correctness anchor (the WAND fast path in wand.py must
produce identical top-k).

Scoring modes:

* ``elasticlunr`` (rank-identity vs the reference):
    per (doc, term):  tf * idf^2 * flnorm      (terms_query.ex:89)
    per doc:          MAX over matched entries (terms_query.ex:80-97)
    idf = 1 + log10(N / (df + 1))              (field.ex:340-341)
    tf  = sqrt(raw count)                      (field.ex:235)
    flnorm = 1/sqrt(unique terms in field)     (field.ex:328-335)

* ``bm25`` (the headline scorer for the transcripts engine):
    idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    per (doc, term): idf * tf_raw*(k1+1) / (tf_raw + k1*(1-b+b*dl/avgdl))
    per doc: SUM over matched entries
    (k1=1.2, b=0.75 defaults)

Physical shape (scale rationale):
  query terms are resolved against the *vocabulary* (term_stats — one
  row per term, orders of magnitude smaller than postings) first; the
  resulting matched-term set is tiny and is broadcast into an equi-join
  with postings, so expand/fuzzy never nested-loop over postings and
  exact lookups are a broadcast hash semi-join. The only wide operation
  is the per-doc aggregation, keyed by the index's doc key (skew-free).

Doc-key currency: every scorer emits rows keyed by ``index.key_col`` —
the int64 global ordinal wherever a consistent ordinal space exists
(fresh builds, loaded v5 indexes whose narrow postings carry no docid),
else the docid string. The executor translates ord->docid ONCE per
query via the ordinals table (WAND does the same, search/wand.py) — so
the ~17-byte docid never rides scoring shuffles or the build's
clustering shuffle, and per-doc aggregation keys are fixed-width ints.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.literals import empty_df, in_expr, inline_rows


CHECKPOINT_PHRASE_HITS = True  # see phrase_scores

# phrase driver-serve caps (see _phrase_per_doc_driver): collect at most
# this many (doc, term) position rows to the driver, and inline at most
# this many per-doc hit rows back (beyond either, the distributed plan
# runs — the caps only ever trade latency, never semantics). The row
# cap is checked against the query terms' exact document frequencies
# BEFORE any bulk transfer, so exceeding it costs at most one metadata
# job. 32k rows sits just under the measured crossover (local[32],
# 100k-turn corpus: sumdf 27k -> driver 0.49s vs distributed 0.60s;
# sumdf 154k -> driver 1.9s vs 0.8s — the Arrow transfer grows linearly
# while the distributed plan aggregates before moving anything); on a
# multi-node cluster the crossover is higher (each distributed job adds
# scheduling + network-shuffle latency), so this is the conservative
# end. 4096 hit docs mirrors wand.py's RESOLVE_INLINE_CAP (a larger
# VALUES relation costs more to parse than the distributed aggregation
# it replaces, per the WAND hot-term fix).
PHRASE_DRIVER_MAX_ROWS = 1 << 15
PHRASE_DRIVER_MAX_DOCS = 4096

# per-index (field, term) -> df memo for the driver-path gate: hot
# phrases repeat in a serving workload, and a PRESENT term's df only
# ever affects the cost decision (the post-collect row-count guard owns
# semantics), so present entries are safe to reuse across maintenance.
# ABSENT terms are never cached — absence is semantics-bearing (it
# short-circuits to an empty result) and a later add_documents could
# introduce the term. Evicted OLDEST-FIRST past this many entries
# (insertion-ordered dict) — a hot workload cycling slightly over the
# cap keeps its recent entries instead of re-looking-up everything
# after a wholesale clear.
_PHRASE_DF_CACHE_MAX = 1 << 16


def _evict_df_cache(cache: dict) -> None:
    """Drop oldest entries until the cache is back under the cap.
    Concurrency: same contract as the old wholesale clear — a reader
    that loses an entry mid-lookup just re-looks-up (the cache never
    stores None, so .get miss handling covers the race)."""
    while len(cache) > _PHRASE_DF_CACHE_MAX:
        try:
            cache.pop(next(iter(cache)), None)
        except (StopIteration, RuntimeError):
            return  # concurrent mutation: the other writer will evict


def entry_score_expr(mode: str, k1: float = 1.2, b: float = 0.75,
                     qw: str | None = None):
    """THE per-(term, doc) entry-score Column — the single source of
    both scoring formulas, shared by the single-query scorer, bulk
    ``search_many`` and ``related_documents`` so the paths can never
    drift. Expects the joined (postings × term_stats × field_stats)
    row shape: tf, tf_raw, term_idf, term_df, doc_len, flnorm, n_docs,
    avg_doc_len (+ the ``qw`` column when given).

    elasticlunr: ``tf * idf^2 * flnorm`` (field.ex:235,
    terms_query.ex:89) — per-doc aggregation is MAX over entries, so a
    query-term multiplicity column never applies (``qw`` ignored).
    bm25: Robertson idf × tf saturation; ``qw`` (query-term
    multiplicity) multiplies each entry in SUM aggregation."""
    if mode == "elasticlunr":
        return F.col("tf") * F.col("term_idf") ** 2 * F.col("flnorm")
    if mode == "bm25":
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("term_df") + F.lit(0.5))
            / (F.col("term_df") + F.lit(0.5))
        )
        tf_part = (F.col("tf_raw") * (k1 + 1.0)) / (
            F.col("tf_raw")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avg_doc_len"))
        )
        e = idf * tf_part
        return e * F.col(qw) if qw else e
    raise ValueError(f"unknown scoring mode {mode!r}")


def _empty_schema(key: str, with_details: bool) -> str:
    s = ("ord long" if key == "ord" else "docid string") + ", score double"
    if with_details:
        s += ", matched int, positions map<string,array<int>>"
    return s


def _fstats_local(index) -> dict:
    """field -> field_stats Row, collected ONCE per binding (memoized by
    the field_stats DataFrame's object identity — every maintenance op
    returns a new object and ``_rebind_from`` reassigns the attribute,
    so a stale cache cannot survive a mutation). Shared by the WAND
    clause resolver and the exhaustive scorer's inline fstats relation:
    one Spark job per binding instead of one broadcast-build per query."""
    src = index.field_stats
    cache = getattr(index, "_fstats_local_cache", None)
    if cache is None or cache[0] is not src:
        cache = (src, {
            r["field"]: r
            for r in src.select("field", "flnorm", "n_docs",
                                "avg_doc_len").collect()
        })
        index._fstats_local_cache = cache
    return cache[1]


# cap for the per-binding (field, term) -> (df, idf) vocabulary memo
# below; oldest-first eviction like the phrase df cache
_VOCAB_CACHE_MAX = 1 << 16


def _vocab_lookup(index, field: str, terms) -> dict:
    """(field, term) -> (df, idf) for the given terms, via the
    per-binding driver memo; terms ABSENT from the vocabulary map to
    ``None``. One capped In(term) collect fills the misses.

    The memo is keyed by the ``term_stats`` DataFrame's object identity
    (same contract as ``_fstats_local``): content-changing ops return
    new objects and ``_rebind_from`` reassigns the attribute, so both
    PRESENT entries and ABSENT markers are safe within a binding."""
    src = index.term_stats
    cache = getattr(index, "_vocab_local_cache", None)
    if cache is None or cache[0] is not src:
        cache = (src, {})
        index._vocab_local_cache = cache
    vc = cache[1]
    missing = sorted({t for t in terms if (field, t) not in vc})
    if missing:
        for r in (src.where(F.col("field") == field)
                  .where(in_expr("term", missing))
                  .select("term", "df", "idf").collect()):
            vc[(field, r["term"])] = (int(r["df"]), float(r["idf"]))
        for t in missing:
            vc.setdefault((field, t), None)  # absent from the vocabulary
    # snapshot THIS call's results BEFORE evicting: oldest-first
    # eviction may pop a warm entry this very call needs (a query mixing
    # one old term with enough new ones to cross the cap), and reading
    # vc after eviction would KeyError
    out = {t: vc[(field, t)] for t in terms}
    if missing:
        while len(vc) > _VOCAB_CACHE_MAX:
            try:
                vc.pop(next(iter(vc)), None)
            except (StopIteration, RuntimeError):
                break
        # share the df currency with the phrase driver-serve gate
        # (present terms only — the phrase cache's semantics rule)
        pcache = index.__dict__.setdefault("_phrase_df_cache", {})
        _evict_df_cache(pcache)
        for t in missing:
            hit = out.get(t)
            if hit is not None:
                pcache[(field, t)] = hit[0]
    return out


def _vocab_resolve_inline(index, field: str, terms: List[str]) -> DataFrame:
    """EXACT-terms vocabulary resolve as a driver-held lookup + inline
    literal relation — the zero-shuffle twin of :func:`_query_terms_df`
    for the no-expansion path. Returns the identical (qt_idx, qt, term,
    df, idf) rows the vocab equi-join produces (df/idf round-trip
    bit-exact through the VALUES literal), so scores are unchanged; the
    broadcast build over the vocabulary scan becomes a zero-task local
    relation, and a warm term costs no Spark job at all."""
    looked = _vocab_lookup(index, field, terms)
    rows = [
        (i, t, t, looked[t][0], looked[t][1])
        for i, t in enumerate(terms) if looked[t] is not None
    ]
    return inline_rows(
        index.postings.sparkSession, rows,
        "qt_idx int, qt string, term string, df long, idf double")


def _query_terms_df(index, field: str, terms: List[str],
                    expand: bool, fuzziness: int,
                    regex: bool = False) -> DataFrame:
    """Resolve query terms against the vocabulary -> (qt, term, df, idf).

    One output row per (query term, matched vocab term): the unit the
    reference appends per doc (field.ex:160-205), which is what
    minimum_should_match counts. ``qt_idx`` preserves query-term order —
    the reference's per-doc entry list is built by iterating query terms
    in order and the vocabulary in ETS ordered_set (term-sorted) order,
    and the details path's argmax tie-break depends on it.
    """
    spark = index.postings.sparkSession
    # inline literal relation: no Python-RDD scan in the query path
    qterms = inline_rows(spark, [(i, t) for i, t in enumerate(terms)],
                         "qt_idx int, qt string")
    vocab = index.term_stats.where(F.col("field") == field)

    if regex:
        # unanchored regex search over the VOCABULARY (term_stats — one
        # row per distinct term, never the postings): same shape as
        # fuzzy's edit-distance ball
        matched = vocab.join(F.broadcast(qterms),
                             F.rlike(vocab.term, qterms.qt))
    elif expand:
        cond = vocab.term.startswith(qterms.qt) | (vocab.term == qterms.qt)
        # ^term.* regex == startswith; exact term trivially included
        matched = vocab.join(F.broadcast(qterms), cond)
    elif fuzziness > 0:
        cond = (
            F.abs(F.length(vocab.term) - F.length(qterms.qt)) <= fuzziness
        ) & (F.levenshtein(vocab.term, qterms.qt) <= fuzziness)
        matched = vocab.join(F.broadcast(qterms), cond)
    else:
        matched = vocab.join(F.broadcast(qterms), vocab.term == qterms.qt)
    return matched.select("qt_idx", "qt", "term", "df", "idf")


def terms_scores(
    index,
    field: str,
    terms: List[str],
    boost: float = 1.0,
    expand: bool = False,
    fuzziness: int = 0,
    regex: bool = False,
    minimum_should_match: int = 1,
    restrict: Optional[DataFrame] = None,
    mode: str = "elasticlunr",
    k1: float = 1.2,
    b: float = 0.75,
    with_details: bool = False,
) -> DataFrame:
    """Score one terms query -> DataFrame(docid, score).

    ``restrict``: optional DataFrame(docid) — the filtered-docs pushdown
    (terms_query.ex:70-76 / field.ex:351-362), a broadcast semi-join here.

    ``with_details``: additionally emit ``matched`` (count of matched
    (query term, vocab term) entries) and ``positions``
    (map<field, array<int>> of packed [start, len, ...] pairs — the
    winning entry's positions in elasticlunr mode, mirroring
    terms_query.ex:93-98's highest-score pick; all matched entries'
    positions term-sorted in bm25 sum mode).
    """
    key = index.key_col
    empty_schema = _empty_schema(key, with_details)
    if not terms:
        spark = index.postings.sparkSession
        return empty_df(spark, empty_schema)

    if not expand and fuzziness <= 0 and not regex:
        # exact terms: driver-held vocabulary resolve -> inline literal
        # relation (identical rows, zero-task broadcast; warm terms cost
        # no Spark job) — the expansion paths keep the vocab pattern join
        matched_terms = _vocab_resolve_inline(index, field, terms)
    else:
        matched_terms = _query_terms_df(index, field, terms, expand,
                                        fuzziness, regex=regex)

    # hot path scans the narrow clustered postings; the details path
    # needs the positions column, which lives in the flat ingest table
    # on a loaded index (postings_full)
    src = index.postings_full if with_details else index.postings
    post = src.where(F.col("field") == field)
    # push a literal term predicate into the scan (the equi-join with the
    # resolved vocab can't reach the parquet reader; this can — shows up
    # as PushedFilters: In(term, ...) / StringStartsWith, pruning row
    # groups before any join)
    if fuzziness <= 0 and not regex:
        if expand:
            cond = None
            for t in terms:
                c = F.col("term").startswith(t)
                cond = c if cond is None else (cond | c)
            post = post.where(cond)
        else:
            post = post.where(in_expr("term", terms))
    else:
        # fuzzy/regex: the matched vocab set is tiny (edit-distance ball
        # / regex hits) — resolve it against term_stats (vocabulary-
        # sized, cheap) and push the literal In(term, ...) into the
        # postings scan; without it the fuzzy path is a full postings
        # scan that anti-scales with data size. Collect the FULL matched
        # rows once (the vocab pattern join used to run twice: once for
        # this pushdown collect, once as the broadcast build below) and
        # inline them as the matched relation — one vocab job instead of
        # two; a pathological expansion beyond the cap falls back to the
        # old two-pass plan unchanged.
        from .wand import RESOLVE_INLINE_CAP, _collect_limit_one_job

        spark = index.postings.sparkSession
        mrows = _collect_limit_one_job(matched_terms, RESOLVE_INLINE_CAP + 1)
        if not mrows:
            return empty_df(spark, empty_schema)
        if len(mrows) <= RESOLVE_INLINE_CAP:
            fuzzy_terms = sorted({r["term"] for r in mrows})
            matched_terms = inline_rows(
                spark,
                [(r["qt_idx"], r["qt"], r["term"], r["df"], r["idf"])
                 for r in mrows],
                "qt_idx int, qt string, term string, df long, idf double")
        else:
            fuzzy_terms = [
                r["term"]
                for r in matched_terms.select("term").distinct().collect()
            ]
        post = post.where(in_expr("term", fuzzy_terms))
    if restrict is not None:
        # no broadcast hint: the restriction can be nearly all docs
        # (e.g. a not-filter base) — AQE picks broadcast when it IS small
        post = post.join(restrict.select(key), key, "left_semi")

    entries = post.join(
        F.broadcast(matched_terms.withColumnRenamed("df", "term_df")
                    .withColumnRenamed("idf", "term_idf")),
        "term",
    )

    # per-binding memoized field_stats row -> inline literal relation
    # (zero-task broadcast; values round-trip bit-exact) instead of a
    # per-query broadcast build over the field_stats table
    fr = _fstats_local(index).get(field)
    # raw Row values (None -> NULL literal): bit-faithful to the old
    # broadcast join even for degenerate NULL stats
    fs_rows = ([(field, fr["flnorm"], fr["n_docs"], fr["avg_doc_len"])]
               if fr is not None else [])
    fstats = F.broadcast(inline_rows(
        index.postings.sparkSession, fs_rows,
        "field string, flnorm double, n_docs long, avg_doc_len double"))
    entries = entries.join(fstats, "field")

    entry_score = entry_score_expr(mode, k1, b)
    agg_score = (F.max(entry_score) if mode == "elasticlunr"
                 else F.sum(entry_score))

    aggs = [agg_score.alias("raw_score"), F.count(F.lit(1)).alias("n_entries")]
    if with_details:
        if mode == "elasticlunr":
            # the winning (highest-score) entry's positions; the
            # reference keeps the FIRST max in per-doc entry order
            # (terms_query.ex:80-84 strict >), and entries are appended
            # iterating query terms in order, then the vocabulary in ETS
            # ordered_set (term-sorted) order (field.ex:160-205) — so
            # ties break on the smallest (query-term index, vocab term)
            pos = F.min_by(
                "positions",
                F.struct(-entry_score, F.col("qt_idx"), F.col("term")),
            )
        else:
            pos = F.flatten(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("term"), F.col("positions")))),
                lambda s: s["positions"],
            ))
        aggs.append(pos.alias("pos_arr"))
    per_doc = entries.groupBy(key).agg(*aggs)
    if minimum_should_match > 1:
        per_doc = per_doc.where(F.col("n_entries") >= minimum_should_match)
    out_cols = [key, (F.col("raw_score") * F.lit(float(boost))).alias("score")]
    if with_details:
        out_cols += [
            F.col("n_entries").cast("int").alias("matched"),
            F.create_map(F.lit(field), F.coalesce(
                F.col("pos_arr"), F.array().cast("array<int>"))
            ).alias("positions"),
        ]
    return per_doc.select(*out_cols)


def _phrase_field_n(index, field: str) -> int:
    """Cached per-field document count (field_stats currency) — the N
    of the conjunction-size estimate. One 1-row metadata job per field
    per index lifetime."""
    cache = index.__dict__.setdefault("_phrase_fs_cache", {})
    n = cache.get(field)
    if n is None:
        row = _fstats_local(index).get(field)
        n = int(row["n_docs"]) if row else 0
        cache[field] = n
    return n


def _phrase_conjunctive_cands(index, field: str, key: str,
                              uniq_terms: List[str]):
    """Docs containing ALL the phrase's distinct terms, as a
    DataFrame of ``key`` values — the positional engine's classic
    "rarest term drives the scan" prune generalized to an exact k-way
    conjunction: a phrase hit needs every term in the SAME doc, so
    this set is a superset of the phrase's doc set and restricting the
    positions explode to it never changes results (pdf included).

    Plan shape (100 TB rationale): the NARROW postings table (no
    position arrays — fixed-width (field, term, key) rows) is scanned
    with the pushed ``In(term)`` predicate, so the scan is bounded by
    the query terms' document frequencies, and one aggregation keyed
    by doc counts distinct terms — the same asymptotic as any
    conjunctive candidate generation. Everything downstream (explode,
    adjacency, Arrow collect) is then bounded by the CONJUNCTION size,
    which for hot-term phrases is orders of magnitude below the sum of
    the terms' posting lists."""
    narrow = (index.postings
              .where(F.col("field") == field)
              .where(in_expr("term", uniq_terms))
              .select(key, "term"))
    return (narrow.groupBy(key)
            .agg(F.count_distinct("term").alias("_nt"))
            .where(F.col("_nt") == F.lit(len(uniq_terms)))
            .select(key))


def _phrase_adjacency_serve(tbl, terms: List[str], k: int):
    """Shared driver-side adjacency algebra over an Arrow table of
    (key, term, ords, doc_len) position rows: distinct
    (doc, tok_ord - qi, qi) triples, a base matches when all ``k``
    query indexes are present — vectorized in numpy over the Arrow
    buffers (no per-row Python). Returns ``(per_doc_rows, pdf)`` with
    per_doc_rows = [(key, pf, doc_len)], or ``None`` when the per-doc
    cap is exceeded (caller falls back to the distributed plan)."""
    import numpy as np

    tbl = tbl.combine_chunks()
    keyd = tbl.column(0).chunk(0).dictionary_encode()
    doc_code = keyd.indices.to_numpy()          # per input row
    doc_keys = keyd.dictionary.to_pylist()
    termd = tbl.column(1).chunk(0).dictionary_encode()
    term_code = termd.indices.to_numpy()
    term_names = termd.dictionary.to_pylist()
    import pyarrow.compute as pc

    oc = tbl.column(2).chunk(0)
    lens = pc.list_value_length(oc).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    values = oc.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    dl = tbl.column(3).chunk(0).to_numpy(zero_copy_only=False)
    n = tbl.num_rows
    dl_by_code = np.zeros(len(doc_keys), dtype=np.int64)
    dl_by_code[doc_code] = dl.astype(np.int64)
    row_of_val = np.repeat(np.arange(n, dtype=np.int64), lens)
    tcode_of_val = term_code[row_of_val]
    dcode_of_val = doc_code[row_of_val]
    qis: dict = {}
    for qi, t in enumerate(terms):
        qis.setdefault(t, []).append(qi)
    cparts, bparts, qparts = [], [], []
    for tc, tname in enumerate(term_names):
        tqis = qis.get(tname)
        if not tqis:
            continue
        mask = tcode_of_val == tc
        v = values[mask]
        d = dcode_of_val[mask]
        for qi in tqis:
            cparts.append(d)
            bparts.append(v - qi)
            qparts.append(np.full(v.size, qi, dtype=np.int64))
    if not cparts or not sum(p.size for p in cparts):
        return [], 0
    trip = np.unique(np.stack([np.concatenate(cparts),
                               np.concatenate(bparts),
                               np.concatenate(qparts)], axis=1), axis=0)
    cb, nq = np.unique(trip[:, :2], axis=0, return_counts=True)
    hit_codes = cb[nq == k, 0]
    if hit_codes.size == 0:
        return [], 0
    uc, pf = np.unique(hit_codes, return_counts=True)
    if uc.size > PHRASE_DRIVER_MAX_DOCS:
        return None
    per_doc = [(doc_keys[int(c)], int(p), int(dl_by_code[int(c)]))
               for c, p in zip(uc, pf)]
    return per_doc, int(uc.size)


def _phrase_per_doc_driver(index, field: str, post, key: str,
                           terms: List[str], k: int,
                           rows_cap: Optional[int] = None):
    """Driver-serve fast path for phrase hit detection: ONE row-capped
    Arrow collect of the query terms' position rows, then the same
    adjacency algebra as the distributed plan (see
    ``_phrase_adjacency_serve``). Returns a tagged outcome:

      ("served", per_doc_rows, pdf) — integer (key, pf, doc_len) hit
          statistics the caller feeds into the SAME Spark scoring
          expressions the distributed plan uses, so scores stay
          bit-identical between the paths (tests/test_phrase_driver.py)
      ("distributed", cand_df_or_None) — fall back to the distributed
          plan; when ``cand_df`` is set, it is the conjunctive
          candidate-doc relation (``_phrase_conjunctive_cands``) the
          caller must semi-join the positions scan against — a pure
          prune, never a semantics change.

    Cost is GATED before anything heavy moves: the query terms'
    document frequencies (one term-count-sized term_stats lookup, the
    same vocabulary currency fuzzy/expand resolve against) bound the
    positions-row count exactly, so nothing bulk ever moves
    speculatively (measured: the ungated version spent ~8s
    row-pickling 130k position rows only to fall back). A term with no
    stats row cannot match anywhere — that is an immediate empty
    result, saving the scan entirely.

    HOT-TERM phrases (df sum over the driver cap — the q8 "hot phrase"
    battery shape) get a second chance instead of going straight to
    the distributed plan: the conjunctive candidate set bounds the
    position rows that actually matter, so the Arrow collect is
    re-gated on the CONJUNCTION (one row-capped job whose shuffle is
    the narrow-postings candidate aggregation). Only when even the
    conjunction is over-cap does the distributed plan run — and then
    it inherits the candidate relation as a semi-join prune, so its
    explode is conjunction-bounded too.

    Serving latency is job-count-bound (see wand.py's driver-serve
    rationale): this replaces the eager hit-set checkpoint job + the
    pdf aggregation job + the per-doc aggregation's shuffle with one
    Arrow transfer over the term-clustered positions scan."""
    from .wand import _arrow_limit_one_job

    uniq_terms = sorted(set(terms))
    cache = index.__dict__.setdefault("_phrase_df_cache", {})
    # .get, not check-then-read: a concurrent serving thread's wholesale
    # clear() between the two would KeyError; a racily-missed entry just
    # re-looks-up (cache never stores None — df is a positive count)
    dfs = {}
    for t in uniq_terms:
        v = cache.get((field, t))
        if v is not None:
            dfs[t] = v
    missing = [t for t in uniq_terms if t not in dfs]
    if missing:
        looked = {
            r["term"]: r["df"]
            for r in index.term_stats
            .where(F.col("field") == field)
            .where(in_expr("term", missing))
            .select("term", "df").collect()
        }
        _evict_df_cache(cache)
        for t, d in looked.items():  # present terms only (see cache note)
            cache[(field, t)] = d
        dfs.update(looked)
    if any(t not in dfs for t in uniq_terms):
        return ("served", [], 0)  # vocabulary-absent term: no match
    scan = post.select(key, "term", "ords", "doc_len")
    cand_df = None
    if rows_cap is None:
        rows_cap = PHRASE_DRIVER_MAX_ROWS
    if sum(dfs.values()) > rows_cap:
        if len(uniq_terms) < 2:
            # a single (repeated) hot term: the conjunction IS its
            # posting list — nothing to prune with
            return ("distributed", None)
        # route on the conjunction's PREDICTED size — the independence
        # estimate N * prod(df_i/N) tracks dense synthetic/text corpora
        # well and costs no job (text co-occurrence is positively
        # correlated, so it under-estimates: the 2x margin below plus
        # the row-capped probe collect keep a wrong guess cheap).
        # Dense conjunctions (est ~ sum of dfs — e.g. two terms each in
        # 75% of docs) skip the prune entirely: measured at 100k turns,
        # an unselective intersection shuffle only ADDS latency.
        k_u = len(uniq_terms)
        n_docs = _phrase_field_n(index, field)
        est = float(n_docs or 0)
        for t in uniq_terms:
            est *= dfs[t] / max(n_docs, 1)
        fits = (k_u * min(dfs.values()) <= rows_cap  # guaranteed
                or 2 * k_u * est <= rows_cap)        # predicted
        if not fits:
            if 2 * k_u * est <= sum(dfs.values()):
                # selective but driver-oversized: the distributed plan
                # inherits the candidate relation as a semi-join prune
                return ("distributed", _phrase_conjunctive_cands(
                    index, field, key, uniq_terms))
            return ("distributed", None)
        cand_df = _phrase_conjunctive_cands(index, field, key, uniq_terms)
        # exactly one positions row per (term, candidate doc), so the
        # collect below is conjunction-bounded; over-cap conjunctions
        # hand the candidate relation to the distributed plan instead
        scan = scan.join(cand_df, key, "left_semi")
    tbl = _arrow_limit_one_job(scan, rows_cap + 1)
    # num_rows <= cap proves the limit truncated nothing (belt over the
    # stats gate: serving a TRUNCATED scan would change semantics)
    if tbl is None or tbl.num_rows > rows_cap:
        return ("distributed", cand_df)
    if tbl.num_rows == 0:
        return ("served", [], 0)
    served = _phrase_adjacency_serve(tbl, terms, k)
    if served is None:  # per-doc cap exceeded after the collect
        return ("distributed", cand_df)
    return ("served", served[0], served[1])


def phrase_scores(
    index,
    field: str,
    terms: List[str],
    boost: float = 1.0,
    restrict: Optional[DataFrame] = None,
    mode: str = "elasticlunr",
    k1: float = 1.2,
    b: float = 0.75,
    with_details: bool = False,
    driver_max_rows: Optional[int] = None,
) -> DataFrame:
    """Exact-phrase scoring over stored token ordinals.

    A doc matches iff the analyzed query terms occur at CONSECUTIVE
    post-pipeline token ordinals: the i-th query term at ordinal
    ``base + i`` for some base. The phrase is then scored as a
    pseudo-term — ``phrase_freq`` (number of bases) plays tf and the
    count of matching docs plays df:

      elasticlunr:  sqrt(pf) * (1 + log10(N/(pdf+1)))^2 * flnorm * boost
      bm25:         idf_bm25(pdf) * pf*(k1+1)/(pf + k1*(1-b+b*dl/avgdl))

    The reference stores per-occurrence positions but never consumes
    them (tokenizer.ex:61-66, field.ex:224-230); this operator is the
    natural consumer. Not in the reference's DSL — an extension, like
    BM25 mode.

    Plan shape (100 TB rationale): the postings scan is pruned by the
    pushed ``In(term, ...)`` predicate (term-clustered row groups), the
    ordinal arrays explode to one row per occurrence OF THE QUERY TERMS
    ONLY, and the adjacency test is ONE aggregation keyed by
    (docid, ord - query_idx) — the classic positional-join without any
    per-doc Python or self-join chain. ``pdf`` (global doc frequency of
    the phrase) is a 1-row broadcast; like terms scoring, it is computed
    on the UNRESTRICTED corpus so clause scores are stable under bool
    composition (terms use global term_stats idf the same way).
    """
    key = index.key_col
    empty_schema = _empty_schema(key, with_details)
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], empty_schema)
    src = index.postings_full
    if "ords" not in src.columns:
        raise ValueError(
            "phrase queries need the 'ords' column: this index was built "
            "without positions (store_positions=False) or saved by a "
            "pre-ordinal version — rebuild to enable match_phrase")
    k = len(terms)
    post = src.where(F.col("field") == field) \
              .where(in_expr("term", terms)) \
              .where(F.col("ords").isNotNull())

    # per-query serve-cap override (VERDICT r5 ask #2: a keyword
    # threaded from the query options instead of a module-global write;
    # the cap only ever picks the PLAN, never the results)
    rows_cap = (PHRASE_DRIVER_MAX_ROWS if driver_max_rows is None
                else int(driver_max_rows))
    outcome, cand_prune = "distributed", None
    if (CHECKPOINT_PHRASE_HITS and not with_details
            and rows_cap > 0):
        # CHECKPOINT_PHRASE_HITS=False doubles as the "keep the full
        # distributed lineage inspectable" switch (plan-shape tests) —
        # the driver path, like the checkpoint, would hide the scan
        res = _phrase_per_doc_driver(index, field, post, key, terms, k,
                                      rows_cap=rows_cap)
        outcome = res[0]
        if outcome == "distributed":
            # a hot-term phrase that overflowed even the conjunctive
            # re-gate: the distributed plan inherits the candidate
            # relation, bounding its explode by the conjunction size
            cand_prune = res[1]
    if outcome == "served":
        # integer hit stats computed on the driver; the SAME scoring
        # expressions below make the scores bit-identical to the
        # distributed plan's
        per_rows, pdf = res[1], res[2]
        dtypes = dict(post.select(key, "doc_len").dtypes)
        per_doc = inline_rows(
            spark, per_rows,
            f"{key} {dtypes[key]}, pf bigint, doc_len {dtypes['doc_len']}")
        pdf_df = inline_rows(spark, [(pdf,)], "pdf bigint")
        if restrict is not None:
            per_doc = per_doc.join(restrict.select(key), key, "left_semi")
    elif not with_details:
        # distributed adjacency in ONE shuffle: group the (term, doc)
        # position rows by doc (narrow rows, small int arrays — far
        # less shuffle volume than one row per OCCURRENCE), then solve
        # the phrase inside the row with JVM array algebra: candidate
        # bases = ords(term_0), folded through
        # array_intersect(acc, ords(term_i) - qi) over the query
        # positions. pf = |result|. Replaces the previous
        # posexplode -> (doc, ord-qi, qi) distinct -> two-level
        # aggregation pipeline (three shuffles) — measured ~2x faster
        # on hot-term phrases where every occurrence used to explode.
        if cand_prune is not None:
            # conjunction prune: a pure restriction to docs containing
            # ALL query terms (phrase docs are a subset, so pdf
            # computed after the prune is still the global phrase df)
            post = post.join(cand_prune, key, "left_semi")
        grouped = (post.select(key, "term", "ords", "doc_len")
                   .groupBy(key)
                   .agg(F.first("doc_len").alias("doc_len"),
                        F.map_from_entries(F.collect_list(
                            F.struct("term", "ords"))).alias("m")))
        bases = F.element_at(F.col("m"), F.lit(terms[0]))
        if k > 1:
            rest_qis = F.array(*[
                F.struct(F.lit(qi).alias("qi"), F.lit(t).alias("term"))
                for qi, t in list(enumerate(terms))[1:]
            ])
            bases = F.aggregate(
                rest_qis, bases,
                lambda acc, q: F.array_intersect(
                    acc,
                    F.transform(F.element_at(F.col("m"), q["term"]),
                                lambda x: x - q["qi"])),
            )
        # a doc missing any term yields null (element_at miss
        # propagates through intersect) -> coalesced to 0 and dropped
        hits = (grouped
                .withColumn("pf", F.coalesce(F.size(bases), F.lit(0))
                            .cast("long"))
                .where(F.col("pf") > 0)
                .select(key, "pf", "doc_len"))
        # two consumers (pdf broadcast + scoring): materialize the hit
        # set once — it is exactly phrase-doc-frequency sized.
        # localCheckpoint (GC-cleaned by the ContextCleaner) instead of
        # persist, which would accumulate storage across queries in a
        # long-lived session. CHECKPOINT_PHRASE_HITS=False keeps the
        # full lineage visible for plan-shape tests
        # (tests/test_pushdown.py pins the pushed In(term) on the
        # positions-table scan, which the checkpoint would hide).
        if CHECKPOINT_PHRASE_HITS:
            hits = hits.localCheckpoint(eager=True)
        pdf_df = hits.agg(F.count(F.lit(1)).alias("pdf"))
        if restrict is not None:
            hits = hits.join(restrict.select(key), key, "left_semi")
        per_doc = hits
    else:
        # with_details keeps the per-occurrence explode: it must carry
        # each occurrence's (start, len) character offsets into the
        # matched positions payload, which the array-algebra plan
        # deliberately never materializes
        qdf = inline_rows(spark, list(enumerate(terms)),
                          "qi int, term string")
        # NB: the doc key may itself be named "ord" (doc ordinal) while
        # the exploded token ordinal is aliased "tok_ord" — disjoint
        occ_cols = [F.col(key), F.col("term"), F.col("doc_len"),
                    F.col("positions")]
        occ = post.select(*occ_cols,
                          F.posexplode("ords").alias("occ_i", "tok_ord"))
        occ = occ.join(F.broadcast(qdf), "term")

        hit_key = (F.col("tok_ord") - F.col("qi")).alias("base")
        aggs = [F.count_distinct(F.col("qi")).alias("nq"),
                F.first("doc_len").alias("doc_len"),
                F.collect_list(F.struct(
                    F.element_at("positions",
                                 F.col("occ_i") * 2 + 1).alias("s"),
                    F.element_at("positions",
                                 F.col("occ_i") * 2 + 2).alias("l"),
                )).alias("occ_pos")]
        hits = (occ.groupBy(key, hit_key).agg(*aggs)
                .where(F.col("nq") == k))
        if CHECKPOINT_PHRASE_HITS:
            hits = hits.localCheckpoint(eager=True)
        pdf_df = hits.agg(F.count_distinct(key).alias("pdf"))

        if restrict is not None:
            hits = hits.join(restrict.select(key), key, "left_semi")
        per_aggs = [F.count(F.lit(1)).alias("pf"),
                    F.first("doc_len").alias("doc_len"),
                    F.flatten(F.transform(
                        F.array_sort(F.flatten(F.collect_list("occ_pos"))),
                        lambda s: F.array(s["s"], s["l"]),
                    )).alias("pos_arr")]
        per_doc = hits.groupBy(key).agg(*per_aggs)

    # per-binding memoized field_stats row -> inline literal relation
    # (zero-task broadcast) instead of a per-query broadcast build; raw
    # Row values keep NULL fidelity with the old join
    fr = _fstats_local(index).get(field)
    fs_rows = ([(fr["flnorm"], fr["n_docs"], fr["avg_doc_len"])]
               if fr is not None else [])
    fstats = F.broadcast(inline_rows(
        spark, fs_rows, "flnorm double, n_docs long, avg_doc_len double"))
    scored = per_doc.crossJoin(F.broadcast(pdf_df)).crossJoin(fstats)

    if mode == "elasticlunr":
        idf = F.lit(1.0) + F.log10(
            F.col("n_docs") / (F.col("pdf") + F.lit(1.0)))
        score = F.sqrt(F.col("pf")) * idf * idf * F.col("flnorm")
    elif mode == "bm25":
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("pdf") + F.lit(0.5))
            / (F.col("pdf") + F.lit(0.5))
        )
        score = idf * (F.col("pf") * (k1 + 1.0)) / (
            F.col("pf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avg_doc_len"))
        )
    else:
        raise ValueError(f"unknown scoring mode {mode!r}")

    out_cols = [key, (score * F.lit(float(boost))).alias("score")]
    if with_details:
        out_cols += [
            F.lit(1).alias("matched"),
            F.create_map(F.lit(field), F.col("pos_arr")).alias("positions"),
        ]
    return scored.select(*out_cols)


def proximity_scores(
    index,
    field: str,
    terms: List[str],
    slop: int = 0,
    boost: float = 1.0,
    restrict: Optional[DataFrame] = None,
) -> DataFrame:
    """Two-term proximity (Lucene span_near, an extension like
    match_phrase — the reference stores positions but has no proximity
    operator): docs where some occurrence of each term sits within
    ``slop`` post-pipeline token ordinals; score = boost/(1+min_dist),
    so closer co-occurrences rank first, deterministically.

    Plan shape (100 TB rationale): the positions-table scan is pruned
    by the pushed ``In(term, ...)`` (two terms), each side collapses to
    one row per (doc, term) carrying its ordinal ARRAY, and the min
    distance is a JVM-side nested array transform — no per-occurrence
    explode, no self-join on an exploded table, no Python.
    """
    key = index.key_col
    spark = index.postings.sparkSession
    if len(terms) != 2:
        raise ValueError("proximity_scores takes exactly two terms")
    src = index.postings_full
    if "ords" not in src.columns:
        raise ValueError(
            "span_near needs the 'ords' column: this index was built "
            "without positions (store_positions=False)")
    t1, t2 = terms
    post = src.where(F.col("field") == field) \
              .where(in_expr("term", [t1, t2])) \
              .where(F.col("ords").isNotNull())
    a = post.where(F.col("term") == t1).select(F.col(key), F.col("ords").alias("o1"))
    b = post.where(F.col("term") == t2).select(F.col(key), F.col("ords").alias("o2"))
    pairs = a.join(b, key)
    if restrict is not None:
        pairs = pairs.join(restrict.select(key), key, "left_semi")
    min_dist = F.array_min(F.flatten(F.transform(
        "o1", lambda x: F.transform("o2", lambda y: F.abs(x - y)))))
    return (
        pairs.select(F.col(key), min_dist.alias("dist"))
        .where(F.col("dist") <= F.lit(int(slop)))
        .select(key,
                (F.lit(float(boost)) / (F.lit(1.0) + F.col("dist")))
                .alias("score"))
    )


EMPTY_POSITIONS = 'map<string,array<int>>'


def _details_cols():
    return [
        F.lit(0).alias("matched"),
        F.create_map().cast(EMPTY_POSITIONS).alias("positions"),
    ]


def _universe(index) -> DataFrame:
    """The all-docs relation keyed by the index currency: the docs table
    (docid) or the full ordinals table (ord — includes synthetic negative
    ordinals for zero-content docs, indexer.ordinals_df)."""
    if index.key_col == "docid":
        return index.docs.select("docid")
    return index.ordinals_df(full=True).select("ord")


def match_all_scores(index, boost: float = 1.0,
                     with_details: bool = False) -> DataFrame:
    key = index.key_col
    out = _universe(index).select(
        key, (F.lit(1.0) * F.lit(float(boost))).alias("score")
    )
    return out.select("*", *_details_cols()) if with_details else out


def not_scores(index, inner: DataFrame,
               with_details: bool = False) -> DataFrame:
    key = index.key_col
    out = _universe(index).join(
        inner.select(key), key, "left_anti"
    ).select(key, F.lit(1.0).alias("score"))
    return out.select("*", *_details_cols()) if with_details else out


def union_all(dfs: List[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)
