"""IndexManager CRUD lifecycle (reference manager/index_manager_test.exs)
and update_documents (B3: remove-then-re-add semantics)."""

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
