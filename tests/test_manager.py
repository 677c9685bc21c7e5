"""IndexManager CRUD lifecycle (reference manager/index_manager_test.exs)
and update_documents (B3: remove-then-re-add semantics)."""

import math
import os

import pytest

from ex_elasticlunr_spark import Index, IndexManager
from ex_elasticlunr_spark.analysis import Pipeline
from ex_elasticlunr_spark.functions.udfs import AnalyzerConfig
from tests.oracle import OracleIndex
from tests.oracle.core import search as oracle_search

TOKENIZER_ONLY = AnalyzerConfig(stages=())


def _mk_index(spark, name, rows):
    sdf = spark.createDataFrame(rows, "id string, content string")
    idx = Index(name=name, pipeline=TOKENIZER_ONLY).add_field("content")
    idx.add_documents(sdf, docid_col="id")
    return idx


def test_manager_crud(spark, tmp_path):
    mgr = IndexManager(spark, str(tmp_path / "warehouse"))
    assert mgr.list() == []

    idx = _mk_index(spark, "users", [("1", "rose is a flower")])
    mgr.save(idx)
    assert mgr.list() == ["users"]

    # get from a cold manager (disk round-trip, like preload on boot)
    mgr2 = IndexManager(spark, str(tmp_path / "warehouse"))
    loaded = mgr2.get("users")
    res = loaded.search({"query": {"terms": {"content": "rose"}}}).collect()
    assert [r["docid"] for r in res] == ["1"]

    assert mgr2.get("missing") is None

    mgr2.save(_mk_index(spark, "docs", [("7", "hello world")]))
    assert mgr2.list() == ["docs", "users"]
    assert set(mgr2.preload()) == {"docs", "users"}

    mgr2.remove("users")
    assert mgr2.list() == ["docs"]


def test_update_documents_matches_oracle(spark):
    rows = [("1", "this is a test"), ("30", "this is another test")]
    idx = _mk_index(spark, "upd", rows)
    upd = spark.createDataFrame(
        [("1", "totally different words")], "id string, content string")
    idx.update_documents(upd, docid_col="id")

    oidx = OracleIndex(pipeline=Pipeline([]))
    oidx.add_field("content")
    oidx.add_documents([{"id": 1, "content": "this is a test"},
                        {"id": 30, "content": "this is another test"}])
    oidx.remove_documents(["1"])
    oidx.add_documents([{"id": 1, "content": "totally different words"}])

    for q in ({"query": {"terms": {"content": "totally"}}},
              {"query": {"terms": {"content": "test"}}},
              {"query": {"terms": {"content": "another"}}}):
        got = [(r["docid"], round(r["score"], 9))
               for r in idx.search(q).collect()]
        want = [(r["ref"], round(r["score"], 9))
                for r in oracle_search(oidx, q)]
        assert got == want, q


def test_introspection_q17(spark):
    # field_test.exs:35-39 tf golden + has_token/get_token shapes
    idx = _mk_index(spark, "intro", [("1", "hello world hello")])
    assert idx.has_token("content", "hello")
    assert not idx.has_token("content", "missing")

    tf = {r["docid"]: r["tf"] for r in
          idx.term_frequency("content", "hello").collect()}
    assert tf == {"1": pytest.approx(2 ** 0.5)}

    tok = idx.get_token("content", "hello")
    assert tok["df"] == 1
    assert tok["idf"] == pytest.approx(1 + math.log10(1 / 2))
    docs = tok["documents"].collect()
    assert docs[0]["tf_raw"] == 2
    # packed positions [start0, len0, start1, len1] in occurrence order
    assert list(docs[0]["positions"]) == [0, 5, 12, 5]

    vocab = {r["term"] for r in idx.tokens("content").collect()}
    assert vocab == {"hello", "world"}
    assert [r["docid"] for r in idx.documents("content").collect()] == ["1"]



def test_query_pipeline_q16(spark):
    # field.ex:149-157 / index_test.exs:265-315: a distinct query
    # pipeline (here: one that expands a token into synonyms) is used
    # only when analyzing the query string
    from ex_elasticlunr_spark.analysis import Pipeline, Token

    def synonym_expander(tok: Token):
        if tok.token == "pup":
            return [tok.with_token("pup"), tok.with_token("dog")]
        return tok

    cfg = AnalyzerConfig(stages=(),
                         query_pipeline=Pipeline([synonym_expander]))
    sdf = spark.createDataFrame(
        [("1", "the dog barks"), ("2", "a cat sleeps")],
        "id string, content string")
    idx = Index(name="q16").add_field("content", analyzer=cfg)
    idx.add_documents(sdf, docid_col="id")

    # "pup" is not in the corpus, but the query pipeline expands it to
    # include "dog" -> doc 1 matches
    res = idx.search({"query": {"match": {"content": "pup"}}}).collect()
    assert [r["docid"] for r in res] == ["1"]
    # index-side analysis did NOT use the expander: "pup" not indexed
    assert not idx.has_token("content", "pup")


def test_documents_size(spark):
    """B6: max over fields of the per-field id-count
    (reference core/index.ex:161-175, index_test.exs counts)."""
    from ex_elasticlunr_spark import Index

    sdf = spark.createDataFrame(
        [("1", "quick fox", "run"), ("2", "lazy dog", None), ("3", None, None)],
        "id string, text string, tool string")
    idx = Index(name="ds").add_field("text").add_field("tool")
    idx.add_documents(sdf, docid_col="id")
    # ref/id field indexes all 3 docs; text indexes 2, tool indexes 1
    assert idx.documents_size() == 3


def test_blackhole_storage(spark, tmp_path):
    """B11: noop provider (reference storage/blackhole.ex:7-18) — write
    computes the plan but persists nothing; read errors; delete noop."""
    from ex_elasticlunr_spark import Blackhole, Index, IndexManager

    mgr = IndexManager(spark, str(tmp_path / "wh"), storage=Blackhole())
    sdf = spark.createDataFrame([("1", "quick fox")], "id string, text string")
    idx = Index(name="bh").add_field("text")
    idx.add_documents(sdf, docid_col="id")
    mgr.save(idx)                       # runs the write plan, stores nothing
    assert mgr.list() == []
    assert (tmp_path / "wh" / "bh").exists() is False
    mgr2 = IndexManager(spark, str(tmp_path / "wh"), storage=Blackhole())
    assert mgr2.get("bh") is None


def test_manager_update_roundtrip(spark, tmp_path):
    """get -> add_documents -> save to the SAME path must not hit
    Spark's overwrite-while-reading error (staging + atomic swap)."""
    from ex_elasticlunr_spark import Index, IndexManager

    wh = str(tmp_path / "wh2")
    mgr = IndexManager(spark, wh)
    sdf = spark.createDataFrame(
        [("1", "quick fox"), ("2", "lazy dog")], "id string, text string")
    idx = Index(name="rt").add_field("text")
    idx.add_documents(sdf, docid_col="id")
    mgr.save(idx)

    mgr2 = IndexManager(spark, wh)
    got = mgr2.get("rt")
    more = spark.createDataFrame([("3", "sly fox")], "id string, text string")
    got.add_documents(more, docid_col="id")
    mgr2.update(got)                    # save over the path being read

    mgr3 = IndexManager(spark, wh)
    reloaded = mgr3.get("rt")
    res = reloaded.search({"query": {"terms": {"text": "fox"}}}).collect()
    assert sorted(r["docid"] for r in res) == ["1", "3"]


def test_update_documents_on_loaded_v4(spark, tmp_path):
    """B3 on the v4 split layout: load -> update_documents (remove+re-add)
    -> save -> reload; positions must survive the narrow/full split."""
    from ex_elasticlunr_spark import Index

    path = str(tmp_path / "u4")
    sdf = spark.createDataFrame(
        [("1", "quick fox runs"), ("2", "lazy dog sleeps")],
        "id string, text string")
    idx = Index(name="u").add_field("text")
    idx.add_documents(sdf, docid_col="id")
    idx.save(path)

    loaded = Index.load(spark, path)
    upd = spark.createDataFrame([("1", "quick cat naps")], "id string, text string")
    loaded.update_documents(upd, docid_col="id")
    loaded.save(path)

    back = Index.load(spark, path)
    assert [r["docid"] for r in
            back.search({"query": {"terms": {"text": "cat"}}}).collect()] == ["1"]
    assert back.search({"query": {"terms": {"text": "fox"}}}).count() == 0
    # positions preserved through the round trip (details path reads flat)
    row = back.search({"query": {"terms": {"text": "cat"}}},
                      include_details=True).first()
    assert row["positions"]["text"] == [6, 3]
    # dog doc untouched
    assert back.search({"query": {"terms": {"text": "dog"}}}).count() == 1


def test_saved_universe_ordinals_are_durable(spark, tmp_path):
    """save() persists the zero-content ordinal extension
    (ordinals_extra) so a LOADED index answers match_all/not without
    re-running the docs-vs-ordinals anti-join in every query plan; the
    synthetic negative ordinals still surface the null-field docs
    (index_test.exs:151-172 counts them in the universe)."""
    from ex_elasticlunr_spark import Index, IndexManager

    sdf = spark.createDataFrame(
        [("1", "quick fox", "run"), ("2", "lazy dog", None),
         ("3", None, None)],
        "id string, text string, tool string")
    idx = Index(name="ordx").add_field("text").add_field("tool")
    idx.add_documents(sdf, docid_col="id")
    mgr = IndexManager(spark, str(tmp_path / "wh"))
    mgr.save(idx)

    from ex_elasticlunr_spark.build.indexer import table_path

    assert os.path.exists(
        table_path(str(tmp_path / "wh" / "ordx"), "ordinals_extra"))
    idx2 = mgr.get("ordx")
    # load bound the durable union (no lazy anti-join pending)
    assert idx2.inverted._ordinals_all is not None
    full = {r["docid"]: r["ord"]
            for r in idx2.inverted.ordinals_df(full=True).collect()}
    assert full["3"] < 0 and full["1"] >= 0 and full["2"] >= 0

    got = sorted(r["docid"] for r in
                 idx2.search({"query": {"match_all": {}}}).collect())
    assert got == ["1", "2", "3"]
    got = sorted(r["docid"] for r in
                 idx2.search({"query": {"not": {"terms":
                                                {"text": "quick"}}}}).collect())
    assert got == ["2", "3"]
