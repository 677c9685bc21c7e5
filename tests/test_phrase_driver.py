"""Driver-serve phrase fast path (scorer._phrase_per_doc_driver):
identity with the distributed plan.

The driver path collects the query terms' position rows once (pushed
In(term) scan, row-capped), computes the INTEGER hit statistics
(pf, pdf, doc_len) with vectorized numpy adjacency, and feeds them
into the SAME Spark scoring expressions the distributed plan uses —
so scores must be EXACTLY equal (==, not approx) between the paths,
in both scoring modes, under bool composition (restrict), on fresh
(docid-keyed) and loaded (ord-keyed) indexes, and across the cap
fallbacks.
"""

import pytest

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.search import scorer

DOCS = [
    ("1", "the quick brown fox", "alpha"),
    ("2", "quick fox runs fast", "alpha"),
    ("3", "fox quick", "beta"),
    ("4", "quick fox quick fox", "beta"),
    ("5", "quick quick fox", "beta"),
    ("6", "slow red fox naps", "beta"),
    ("7", "quick fox quick brown fox jumps", "alpha"),
]

QUERIES = [
    {"query": {"match_phrase": {"content": "quick fox"}}},
    {"query": {"match_phrase": {"content": "quick fox quick"}}},
    {"query": {"match_phrase": {"content": "red fox"}}},
    {"query": {"match_phrase": {"content": "missing phrase"}}},
    # restrict path: phrase as a should past a filter base
    {"query": {"bool": {
        "filter": [{"terms": {"content": "fast"}}],
        "should": [{"match_phrase": {"content": "quick fox"}}]}}},
    # phrase as a must (required clause drives restrict forwarding)
    {"query": {"bool": {
        "must": {"match_phrase": {"content": "quick fox"}},
        "should": [{"terms": {"tag": "beta"}}]}}},
]


@pytest.fixture(scope="module")
def idx(spark):
    sdf = spark.createDataFrame(DOCS, "id string, content string, tag string")
    ix = Index(name="phrase_driver").add_field("content").add_field("tag")
    ix.add_documents(sdf, docid_col="id")
    ix.materialize()
    return ix


@pytest.fixture(scope="module")
def loaded(idx, spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pd") / "idx")
    idx.save(path)
    return Index.load(spark, path)


def _rows(df):
    return {r["docid"]: r["score"] for r in df.collect()}


def _both(ix, query, **kw):
    served = _rows(ix.search(query, **kw))
    old = scorer.PHRASE_DRIVER_MAX_ROWS
    scorer.PHRASE_DRIVER_MAX_ROWS = 0
    try:
        dist = _rows(ix.search(query, **kw))
    finally:
        scorer.PHRASE_DRIVER_MAX_ROWS = old
    return served, dist


@pytest.mark.parametrize("qi", range(len(QUERIES)))
@pytest.mark.parametrize("mode", ["elasticlunr", "bm25"])
def test_identity_fresh(idx, qi, mode):
    served, dist = _both(idx, QUERIES[qi], mode=mode)
    assert served == dist  # bit-identical scores, same doc set


@pytest.mark.parametrize("qi", [0, 4, 5])
@pytest.mark.parametrize("mode", ["elasticlunr", "bm25"])
def test_identity_loaded_ord_keyed(loaded, qi, mode):
    served, dist = _both(loaded, QUERIES[qi], mode=mode)
    assert served == dist


def test_doc_cap_falls_back(idx):
    """Over-cap per-doc sets fall back mid-function (after the collect)
    to the distributed plan — same results."""
    q = QUERIES[0]
    want = _rows(idx.search(q))
    old = scorer.PHRASE_DRIVER_MAX_DOCS
    scorer.PHRASE_DRIVER_MAX_DOCS = 0
    try:
        assert _rows(idx.search(q)) == want
    finally:
        scorer.PHRASE_DRIVER_MAX_DOCS = old


def test_details_keeps_distributed_path(idx):
    """with_details needs per-occurrence positions — it must keep the
    distributed plan (and still agree on the matched docs/scores)."""
    got = {r["docid"]: r for r in idx.search(
        QUERIES[0], include_details=True).collect()}
    plain = _rows(idx.search(QUERIES[0]))
    assert set(got) == set(plain)
    for d, r in got.items():
        assert r["score"] == plain[d]
        assert r["positions"]["content"]  # positions present
