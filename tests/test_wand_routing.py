"""Opportunistic WAND routing in Index.search (index.py _route_wand):
finite top-k string / single-field terms/match queries on a
segments-bound index serve through the block-max fast path. Routed
results must equal the exhaustive executor's exactly, and routing must
never trigger a segment build by itself."""

import os

import pytest

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.sources.transcripts import transcripts_df, with_docid

QUERIES = [
    {"query": {"terms": {"text": ["elixir", "tool"]}}},
    {"query": {"terms": {"text": {"value": "spark", "boost": 2.5}}}},
    {"query": {"terms": {"text": {"value": ["elixir", "tool", "run"],
                                  "minimum_should_match": 2}}}},
    {"query": {"terms": {"text": {"value": "el", "expand": True}}}},
    {"query": {"terms": {"text": {"value": "elixor", "fuzziness": 1}}}},
    {"query": {"terms": {"text": {"value": "eli.*r", "regex": True}}}},
    {"query": {"match": {"text": "elixir tool run"}}},
    {"query": {"match": {"text": {"query": "elixir tool",
                                  "operator": "and"}}}},
]


@pytest.fixture(scope="module")
def saved(spark, tmp_path_factory):
    src = with_docid(transcripts_df(spark, n_convs=40, turns_per_conv=5))
    idx = Index(name="route").add_field("text").add_field("tool")
    idx.add_documents(src, docid_col="docid")
    path = str(tmp_path_factory.mktemp("route") / "wh")
    idx.inverted.save(path, block_size=64)
    return Index.load(spark, path)


def _rows(df):
    return [(r["docid"], round(r["score"], 9)) for r in df.collect()]


@pytest.mark.parametrize("mode", ["bm25", "elasticlunr"])
@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_routed_equals_executor(saved, mode, qi, monkeypatch):
    q = QUERIES[qi]
    got = _rows(saved.search(q, top_k=10, mode=mode))
    monkeypatch.setenv("EX_SPARK_NO_WAND_ROUTE", "1")
    want = _rows(saved.search(q, top_k=10, mode=mode))
    assert got == want and got


@pytest.mark.parametrize("mode", ["bm25", "elasticlunr"])
def test_routed_string_search(saved, mode, monkeypatch):
    got = _rows(saved.search("elixir tool run", top_k=10, mode=mode))
    monkeypatch.setenv("EX_SPARK_NO_WAND_ROUTE", "1")
    want = _rows(saved.search("elixir tool run", top_k=10, mode=mode))
    assert got == want and got


def test_routed_string_with_boosts(saved, monkeypatch):
    opts = {"fields": {"text": {"boost": 2.0}, "tool": {"boost": 0}}}
    got = _rows(saved.search("elixir search", top_k=10, mode="bm25",
                             options=opts))
    monkeypatch.setenv("EX_SPARK_NO_WAND_ROUTE", "1")
    want = _rows(saved.search("elixir search", top_k=10, mode="bm25",
                              options=opts))
    assert got == want and got


def test_full_results_and_details_not_routed(saved):
    # full result sets (top_k=None) and details queries keep the
    # executor plan (WAND is a top-k scorer)
    q = {"query": {"terms": {"text": "elixir"}}}
    full = saved.search(q)
    assert "docid" in full.columns and full.count() > 10
    det = saved.search(q, include_details=True)
    assert "positions" in det.columns


def test_fresh_index_never_builds_segments(spark):
    src = with_docid(transcripts_df(spark, n_convs=10, turns_per_conv=4))
    idx = Index(name="fresh").add_field("text")
    idx.add_documents(src, docid_col="docid")
    assert idx.inverted._segments is None
    idx.search({"query": {"terms": {"text": "elixir"}}}, top_k=5).collect()
    assert idx.inverted._segments is None  # routing must not encode
