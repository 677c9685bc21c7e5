"""match_phrase: exact-phrase matching over stored token ordinals.

The reference stores per-occurrence positions but never consumes them
(tokenizer.ex:61-66, field.ex:224-230) — phrase queries are this
engine's positions consumer (an extension, like BM25 mode). Semantics:
the analyzed query terms must occur at CONSECUTIVE post-pipeline token
ordinals (stopword removal collapses gaps on both the doc and query
side). Scoring treats the phrase as a pseudo-term: phrase_freq plays
tf, the phrase's doc count plays df.
"""

import math

import pytest

from ex_elasticlunr_spark import Index

DOCS = [
    ("1", "the quick brown fox"),        # quick=0 brown=1 fox=2
    ("2", "quick fox runs fast"),        # quick=0 fox=1 run=2 fast=3
    ("3", "fox quick"),                  # reversed -> no match
    ("4", "quick fox quick fox"),        # two phrase occurrences
    ("5", "quick quick fox"),            # quick@0,1 fox@2
]
# corpus vocabulary after the default pipeline: quick, brown, fox, run,
# fast  -> 5 unique terms
FLNORM = 1.0 / math.sqrt(5)
N_DOCS = 5


@pytest.fixture(scope="module")
def idx(spark):
    sdf = spark.createDataFrame(DOCS, "id string, content string")
    ix = Index(name="phrase").add_field("content")
    ix.add_documents(sdf, docid_col="id")
    ix.materialize()
    return ix


def results(df):
    return {r["docid"]: r["score"] for r in df.collect()}


def el_score(pf: int, pdf: int) -> float:
    idf = 1.0 + math.log10(N_DOCS / (pdf + 1.0))
    return math.sqrt(pf) * idf * idf * FLNORM


def test_phrase_adjacency_and_scores(idx):
    got = results(idx.search({"query": {"match_phrase": {"content": "quick fox"}}}))
    # doc 2 (one occurrence), 4 (two: bases 0 and 2), 5 (quick@1 fox@2);
    # NOT doc 1 (brown between) and NOT doc 3 (reversed)
    assert set(got) == {"2", "4", "5"}
    assert got["2"] == pytest.approx(el_score(1, 3))
    assert got["4"] == pytest.approx(el_score(2, 3))
    assert got["5"] == pytest.approx(el_score(1, 3))


def test_phrase_stopword_gap_collapses(idx):
    # query-side stopword removal: "quick the fox" analyzes to the same
    # [quick, fox] phrase
    a = results(idx.search({"query": {"match_phrase": {"content": "quick fox"}}}))
    b = results(idx.search({"query": {"match_phrase": {"content": "quick the fox"}}}))
    assert a == b


def test_phrase_duplicate_term(idx):
    got = results(idx.search({"query": {"match_phrase": {"content": "quick quick"}}}))
    assert set(got) == {"5"}
    assert got["5"] == pytest.approx(el_score(1, 1))


def test_phrase_boost_and_single_token(idx):
    # boost scales linearly
    base = results(idx.search({"query": {"match_phrase": {"content": "quick fox"}}}))
    boosted = results(idx.search(
        {"query": {"match_phrase": {"content": {"query": "quick fox",
                                                 "boost": 2.0}}}}))
    for d, s in base.items():
        assert boosted[d] == pytest.approx(2.0 * s)
    # a single analyzed token degenerates to a plain terms lookup
    one = results(idx.search({"query": {"match_phrase": {"content": "brown"}}}))
    term = results(idx.search({"query": {"terms": {"content": "brown"}}}))
    assert one == term


def test_phrase_no_match_and_match_all_degeneration(idx):
    assert results(idx.search(
        {"query": {"match_phrase": {"content": "brown quick"}}})) == {}
    # zero analyzed tokens -> match_all
    allr = results(idx.search({"query": {"match_phrase": {"content": "the"}}}))
    assert set(allr) == {"1", "2", "3", "4", "5"}


def test_phrase_bm25_mode(idx):
    got = results(idx.search(
        {"query": {"match_phrase": {"content": "quick fox"}}}, mode="bm25"))
    assert set(got) == {"2", "4", "5"}
    # doc 4: pf=2, doc_len=4, avgdl=(3+4+2+4+3)/5
    avgdl = 16 / 5
    idf = math.log(1.0 + (N_DOCS - 3 + 0.5) / (3 + 0.5))
    pf, dl = 2, 4
    want = idf * (pf * 2.2) / (pf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert got["4"] == pytest.approx(want)


def test_phrase_in_bool_should(idx):
    # phrase as a should clause (restrict path): base = terms fast
    # (doc 2 only), should adds the phrase score for doc 2
    q = {"query": {"bool": {
        "filter": [{"terms": {"content": "fast"}}],
        "should": [{"match_phrase": {"content": "quick fox"}}]}}}
    got = results(idx.search(q))
    assert set(got) == {"2"}
    # filter score seeds base (bool_query.ex:110-124) + phrase should
    tscore = results(idx.search({"query": {"terms": {"content": "fast"}}}))["2"]
    assert got["2"] == pytest.approx(tscore + el_score(1, 3))


def test_phrase_details_positions(idx):
    rows = {r["docid"]: r for r in idx.search(
        {"query": {"match_phrase": {"content": "quick fox"}}},
        include_details=True).collect()}
    assert set(rows) == {"2", "4", "5"}
    r = rows["2"]
    assert r["matched"] == 1
    # "quick fox runs fast": quick@(0,5), fox@(6,3), packed sorted by start
    assert list(r["positions"]["content"]) == [0, 5, 6, 3]
    # doc 4 "quick fox quick fox": all four occurrences participate
    assert list(rows["4"]["positions"]["content"]) == [0, 5, 6, 3, 10, 5, 16, 3]


def test_phrase_save_load_roundtrip(idx, spark, tmp_path):
    path = str(tmp_path / "phrase_idx")
    idx.save(path)
    loaded = Index.load(spark, path)
    got = results(loaded.search(
        {"query": {"match_phrase": {"content": "quick fox"}}}))
    assert set(got) == {"2", "4", "5"}
    assert got["4"] == pytest.approx(el_score(2, 3))
