"""Randomized query-DSL trees: engine vs oracle rank identity.

The hand-written reference query set (tests/oracle/query_set.py) covers
each DSL node once or twice; the COMPOSITIONAL space — bools nested in
bools, `not` under filter chains, msm interacting with boosts, fuzzy
and prefix leaves under must_not — is where rank-identity bugs hide.
This test generates seeded-random query trees over the transcripts
corpus and asserts full-result rank identity (docid sequence + scores
to 1e-9) between the Spark engine and the pure-Python oracle that
implements the reference's formulas (field.ex:160-205,
bool_query.ex:34-197, not_query.ex:23-32).

The generator stays inside the grammar the reference accepts: expand
and fuzziness are mutually exclusive (terms_query.ex:35-60), msm never
exceeds the term count, bools always carry at least one clause.
"""

from __future__ import annotations

import random

import pytest

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.sources.transcripts import transcripts_df, with_docid
from tests.oracle import OracleIndex
from tests.oracle.core import search as oracle_search

SEED = 0xE1A57
N_QUERIES = 48
MAX_DEPTH = 3
FIELDS = ("text", "tool")


def bind_random_attrs(spark, src, idx, oidx):
    """Doc attributes for range/exists leaves, deterministic from the
    sorted docid list and bound IDENTICALLY on both engines; grp is
    None for every 5th doc so exists has real nulls to filter."""
    docids = sorted(r["docid"] for r in src.select("docid").collect())
    attrs = {d: {"mins": (7 * i) % 97,
                 "grp": None if i % 5 == 0 else f"g{i % 4}"}
             for i, d in enumerate(docids)}
    adf = spark.createDataFrame(
        [(d, v["mins"], v["grp"]) for d, v in attrs.items()],
        "docid string, mins long, grp string")
    idx.bind_attributes(adf)
    oidx.bind_attributes(attrs)


@pytest.fixture(scope="module")
def corpus(spark):
    src = with_docid(transcripts_df(spark, n_convs=40, turns_per_conv=5))
    # edge-shape docs: empty text, stopword-only text (zero tokens after
    # analysis), text-only-no-tool — these docs carry no postings in one
    # or both fields yet still belong to the doc universe (the reference
    # counts them via the other field's id rows, index_test.exs:151-172),
    # so match_all / not / bool-must_not paths must emit them
    edge = spark.createDataFrame(
        [("conv-edge", 0, "user", "", "bash", None),
         ("conv-edge", 1, "assistant", "the and of it", "search", None),
         ("conv-edge", 2, "user", "quick fox segment", "", None)],
        src.drop("docid").schema)
    src = src.unionByName(with_docid(edge))
    idx = Index(name="randq").add_field("text").add_field("tool")
    idx.add_documents(src, docid_col="docid")
    idx.materialize()

    oidx = OracleIndex().add_field("text").add_field("tool")
    oidx.add_documents(
        [{"id": r["docid"], "text": r["text"], "tool": r["tool"]}
         for r in src.select("docid", "text", "tool").collect()])

    bind_random_attrs(spark, src, idx, oidx)

    # sampling pools: analyzed vocabulary per field (terms queries match
    # the vocab verbatim), raw words (match queries analyze the string),
    # plus misses/typos/prefixes to exercise empty results, fuzzy and
    # expand paths
    vocab = {f: sorted(oidx.fields[f].term_docs) for f in FIELDS}
    raw_words = sorted({
        w for r in src.select("text").collect()
        for w in r["text"].split()})[:400]
    return idx, oidx, vocab, raw_words


def _words(rng: random.Random, pool, k_max=3, miss_rate=0.2):
    k = rng.randint(1, k_max)
    out = []
    for _ in range(k):
        if rng.random() < miss_rate:
            out.append(rng.choice(["zzyzx", "qwrk", "elixor", "sprak"]))
        else:
            out.append(rng.choice(pool))
    return out


def _leaf(rng: random.Random, vocab, raw_words):
    roll = rng.random()
    if roll < 0.15:
        return {"match_all": {}}
    if roll < 0.27:
        # attribute leaves (engine extension, search/attributes.py;
        # oracle RangeQ/ExistsQ) — range bounds over the mins attr's
        # 0..96 domain, exists over the sometimes-null grp
        boost = rng.choice([1, 1, 2, 0.5])
        if rng.random() < 0.35:
            return {"exists": {"field": rng.choice(["grp", "mins"]),
                               "boost": boost}}
        ops = rng.sample(["gte", "gt", "lte", "lt"], rng.randint(1, 2))
        conds = {op: rng.randint(0, 96) for op in ops}
        conds["boost"] = boost
        return {"range": {"mins": conds}}
    field = rng.choice(FIELDS)
    if roll < 0.55:  # match
        words = _words(rng, raw_words)
        params = {"query": " ".join(words)}
        if rng.random() < 0.3:
            params["operator"] = rng.choice(["or", "and"])
        if rng.random() < 0.25:
            params["minimum_should_match"] = rng.randint(1, len(words))
        if rng.random() < 0.3:
            params["boost"] = rng.choice([2, 0.5, 3])
        r2 = rng.random()
        if r2 < 0.15:
            params["expand"] = True
        elif r2 < 0.3:
            params["fuzziness"] = rng.randint(1, 2)
        return {"match": {field: params}}
    # terms: values drawn from the analyzed vocab (+ occasional miss)
    terms = _words(rng, vocab[field])
    params = {"value": terms if len(terms) > 1 else terms[0]}
    if rng.random() < 0.25:
        params["minimum_should_match"] = rng.randint(1, len(terms))
    if rng.random() < 0.3:
        params["boost"] = rng.choice([2, 0.5])
    r2 = rng.random()
    if r2 < 0.15:
        params["value"] = rng.choice(vocab[field])[:4]
        params["expand"] = True
    elif r2 < 0.3:
        params["fuzziness"] = rng.randint(1, 2)
    elif r2 < 0.4:
        # raw UNANCHORED regex over the vocab (engine extension)
        stem = rng.choice(vocab[field])
        params["value"] = rng.choice(
            [stem[:3], stem[-2:] + "$", "^" + stem[:2], stem[:1] + ".k"])
        params["regex"] = True
    return {"terms": {field: params}}


def _tree(rng: random.Random, vocab, raw_words, depth=0):
    if depth >= MAX_DEPTH or rng.random() < 0.45:
        return _leaf(rng, vocab, raw_words)
    if rng.random() < 0.2:
        return {"not": _tree(rng, vocab, raw_words, depth + 1)}
    node = {}
    if rng.random() < 0.5:
        node["must"] = _tree(rng, vocab, raw_words, depth + 1)
    if rng.random() < 0.3:
        node["must_not"] = _tree(rng, vocab, raw_words, depth + 1)
    n_filter = rng.choice([0, 0, 1, 2])
    if n_filter:
        node["filter"] = [_tree(rng, vocab, raw_words, depth + 1)
                          for _ in range(n_filter)]
    n_should = rng.choice([0, 1, 1, 2, 3])
    if n_should:
        node["should"] = [_tree(rng, vocab, raw_words, depth + 1)
                          for _ in range(n_should)]
        if rng.random() < 0.3:
            node["minimum_should_match"] = rng.randint(1, n_should)
    if not node:
        node["must"] = _leaf(rng, vocab, raw_words)
    return {"bool": node}


@pytest.mark.parametrize("qi", range(N_QUERIES))
def test_random_tree_rank_identity(corpus, qi):
    idx, oidx, vocab, raw_words = corpus
    # deterministic per-case generation: burn qi trees so each test case
    # is independent of which others ran (pytest -k safe)
    rng = random.Random(SEED)
    for _ in range(qi):
        _tree(rng, vocab, raw_words)
    qd = {"query": _tree(rng, vocab, raw_words)}

    got = [(r["docid"], r["score"]) for r in idx.search(qd).collect()]
    want = [(r["ref"], r["score"]) for r in oracle_search(oidx, qd)]

    # per-doc score identity to 1e-9
    gmap, wmap = dict(got), dict(want)
    assert sorted(gmap) == sorted(wmap), qd
    for d, gs in gmap.items():
        assert gs == pytest.approx(wmap[d], abs=1e-9), (qd, d, gs, wmap[d])

    # ordering contract, checked against the engine's OWN exact scores
    # (no tolerance games): search() must return (score desc, docid asc).
    # Full cross-engine sequence identity is not asserted here because
    # deep random trees sum clause scores in different orders on the two
    # engines — exact-tie groups can differ by 1 ulp and legitimately
    # swap adjacent rows; per-doc score identity (above) plus both
    # engines' deterministic orderings pin everything else
    assert got == sorted(got, key=lambda r: (-r[1], r[0])), qd


@pytest.mark.parametrize("qi", range(12))
def test_random_tree_bm25_identity(corpus, qi):
    """BM25 mode (the headline scorer, an engine extension over the
    reference's tf*idf^2*flnorm) under random composition: leaf scores
    sum Robertson-idf saturated-tf entries, composition semantics stay
    the reference's (union, msm, score>0). Referee: the oracle's bm25
    view (tests/oracle/core.py TermsQ bm25 branch)."""
    idx, oidx, vocab, raw_words = corpus
    rng = random.Random(SEED ^ 0xB2525)
    for _ in range(qi):
        _tree(rng, vocab, raw_words)
    qd = {"query": _tree(rng, vocab, raw_words)}

    got = [(r["docid"], r["score"])
           for r in idx.search(qd, mode="bm25").collect()]
    want = [(r["ref"], r["score"]) for r in oracle_search(oidx.bm25(), qd)]
    gmap, wmap = dict(got), dict(want)
    assert sorted(gmap) == sorted(wmap), qd
    for d, gs in gmap.items():
        assert gs == pytest.approx(wmap[d], abs=1e-9), (qd, d, gs, wmap[d])


@pytest.mark.parametrize("qi", range(10))
def test_random_sugar_identity(corpus, qi):
    """String-search and map-query sugar forms (index.ex:181-256 — Q13
    per-field boosts where boost <= 0 drops the field, Q14 map queries
    with bool/expand options) under random inputs, vs the oracle's own
    sugar expansion."""
    idx, oidx, vocab, raw_words = corpus
    rng = random.Random(SEED ^ 0x56A9)
    for _ in range(qi):
        _words(rng, raw_words), rng.random(), rng.random()
    words = " ".join(_words(rng, raw_words, k_max=3))
    form = rng.random()
    if form < 0.33:
        query, options = words, None
    elif form < 0.66:
        query = words
        options = {"fields": {
            "text": {"boost": rng.choice([0, 0.5, 1, 2])},
            "tool": {"boost": rng.choice([0, 1, 2])},
        }}
    else:
        query = {"text": words}
        if rng.random() < 0.5:
            query["tool"] = rng.choice(vocab["tool"])
        options = {"bool": rng.choice(["and", "or"]),
                   "expand": rng.random() < 0.4}

    got = [(r["docid"], r["score"])
           for r in idx.search(query, options=options).collect()]
    want = [(r["ref"], r["score"])
            for r in oracle_search(oidx, query, options=options)]
    gmap, wmap = dict(got), dict(want)
    assert sorted(gmap) == sorted(wmap), (query, options)
    for d, gs in gmap.items():
        assert gs == pytest.approx(wmap[d], abs=1e-9), (query, options, d)
    assert got == sorted(got, key=lambda r: (-r[1], r[0])), (query, options)


@pytest.mark.parametrize("mode", ["elasticlunr", "bm25"])
@pytest.mark.parametrize("qi", range(12))
def test_random_tree_details_identity(corpus, qi, mode):
    """include_details=True under random composition: the full result
    shape %{ref, score, matched, positions} (index.ex:258-266,
    bool_query.ex:108-170). matched counts should clauses; positions
    merge per field across clauses — compared as per-field multisets of
    (start, len) pairs (the reference's within-field append order is an
    ETS-iteration artifact, not part of the contract). bm25 mode reports
    ALL matched entries' positions per leaf (engine extension)."""
    idx, oidx, vocab, raw_words = corpus
    rng = random.Random(SEED ^ 0xD7A11)
    for _ in range(qi):
        _tree(rng, vocab, raw_words)
    qd = {"query": _tree(rng, vocab, raw_words)}

    rows = {r["docid"]: r
            for r in idx.search(qd, include_details=True,
                                mode=mode).collect()}
    oview = oidx if mode == "elasticlunr" else oidx.bm25()
    want = {r["ref"]: r for r in oracle_search(oview, qd)}
    assert sorted(rows) == sorted(want), qd
    for docid, w in want.items():
        r = rows[docid]
        assert r["score"] == pytest.approx(w["score"], abs=1e-9), (qd, docid)
        if "matched" in w:
            assert r["matched"] == w["matched"], (qd, docid)
        got_pos = {
            f: sorted(zip(p[::2], p[1::2]))
            for f, p in (dict(r["positions"]) if r["positions"] else {}).items()
            if p
        }
        want_pos = {
            f: sorted(map(tuple, pos))
            for f, pos in w.get("positions", {}).items() if pos
        }
        assert got_pos == want_pos, (qd, docid)


@pytest.mark.parametrize("qi", range(8))
def test_random_tree_cursor_pages_tile(corpus, qi):
    """search_after pagination over random trees: successive cursor
    pages must tile the engine's full (score desc, docid asc) ordering
    exactly — engine-vs-engine, so float clause-sum ordering is
    identical on both sides and the check is exact."""
    idx, oidx, vocab, raw_words = corpus
    rng = random.Random(SEED ^ 0xA9E5)
    for _ in range(qi):
        _tree(rng, vocab, raw_words)
    qd = {"query": _tree(rng, vocab, raw_words)}

    full = [(r["docid"], r["score"]) for r in idx.search(qd).collect()]
    pages, cur = [], None
    while True:
        rows = idx.search(qd, top_k=7, search_after=cur).collect()
        if not rows:
            break
        pages.extend((r["docid"], r["score"]) for r in rows)
        cur = (rows[-1]["score"], rows[-1]["docid"])
        assert len(pages) <= len(full), qd  # no duplicates past the end
    assert pages == full, qd
