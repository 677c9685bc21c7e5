"""Query-time synonym filter (analysis/synonyms.py,
Index.with_query_synonyms): protocol unit tests + engine identity with
the equivalent hand-expanded terms query."""

import pytest

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.analysis.pipeline import Pipeline
from ex_elasticlunr_spark.analysis.synonyms import SynonymFilter, synonym_groups
from ex_elasticlunr_spark.analysis.token import Token


class TestFilterProtocol:
    def test_expansion_and_passthrough(self):
        f = SynonymFilter({"fast": ["quick", "speedi"]})
        t = Token("fast", start=3, length=4)
        out = f(t)
        assert [x.token for x in out] == ["fast", "quick", "speedi"]
        # expansions inherit the source position
        assert all((x.start, x.length) == (3, 4) for x in out)
        t2 = Token("slow", start=0, length=4)
        assert f(t2) is t2  # unmapped: pass through untouched

    def test_self_and_empty_synonyms_dropped(self):
        f = SynonymFilter({"fast": ["fast", "", "quick"]})
        out = f(Token("fast", start=0, length=4))
        assert [x.token for x in out] == ["fast", "quick"]

    def test_groups_symmetric(self):
        m = synonym_groups(["fast", "quick", "speedi"], ["big", "larg"])
        assert m["fast"] == ["quick", "speedi"]
        assert m["quick"] == ["fast", "speedi"]
        assert m["big"] == ["larg"] and m["larg"] == ["big"]

    def test_pipeline_dedupe_eq(self):
        a = SynonymFilter({"a": ["b"]})
        b = SynonymFilter({"a": ["b"]})
        c = SynonymFilter({"a": ["c"]})
        assert a == b and hash(a) == hash(b) and a != c

    def test_in_pipeline_run(self):
        # appended post-stem: mapping in stemmed form
        p = Pipeline.default()
        p2 = Pipeline(list(p.callbacks) + [SynonymFilter({"fast": ["quick"]})],
                      p.separator)
        assert p2.run_terms("The fast fox") == ["fast", "quick", "fox"]


@pytest.fixture(scope="module")
def idx(spark):
    rows = [("0", "fast join on the merge path"),
            ("1", "a quick window sort"),
            ("2", "fast fast fast query"),
            ("3", "merge window join")]
    df = spark.createDataFrame(rows, "docid string, text string")
    ix = Index(name="syn", store_positions=False).add_field("text")
    ix.add_documents(df, docid_col="docid", dedupe=False)
    ix.materialize()
    return ix


class TestQueryTimeSynonyms:
    def test_bridges_missing_vocab(self, idx):
        # "rapid" never occurs; the synonym view makes it find "fast"
        assert idx.search({"query": {"match": {"text": "rapid"}}},
                          top_k=None).count() == 0
        view = idx.with_query_synonyms({"rapid": ["fast"]})
        got = view.search({"query": {"match": {"text": "rapid"}}},
                          top_k=None).collect()
        want = idx.search({"query": {"terms": {"text": ["rapid", "fast"]}}},
                          top_k=None).collect()
        assert {(r.docid, r.score) for r in got} \
            == {(r.docid, r.score) for r in want}
        assert sorted(r.docid for r in got) == ["0", "2"]

    def test_view_does_not_mutate_base(self, idx):
        idx.with_query_synonyms({"rapid": ["fast"]})
        assert idx.search({"query": {"match": {"text": "rapid"}}},
                          top_k=None).count() == 0

    def test_symmetric_group_both_directions(self, idx):
        view = idx.with_query_synonyms(synonym_groups(["fast", "quick"]))
        got = view.search({"query": {"match": {"text": "quick"}}},
                          top_k=None).collect()
        # matches both the quick doc and the fast docs
        assert sorted(r.docid for r in got) == ["0", "1", "2"]
        # elasticlunr leaf = max over terms: each doc's score equals its
        # best single-term score from the expanded set
        for term_set in (["quick", "fast"],):
            want = {r.docid: r.score for r in idx.search(
                {"query": {"terms": {"text": term_set}}},
                top_k=None).collect()}
        for r in got:
            assert r.score == pytest.approx(want[r.docid], abs=1e-9)

    def test_multiword_query_expands_only_mapped(self, idx):
        view = idx.with_query_synonyms({"rapid": ["fast"]})
        got = view.search({"query": {"match": {"text": "rapid merge"}}},
                          top_k=None).collect()
        want = idx.search(
            {"query": {"terms": {"text": ["rapid", "fast", "merg"]}}},
            top_k=None).collect()
        assert {(r.docid, r.score) for r in got} \
            == {(r.docid, r.score) for r in want}

    def test_search_text_sugar_through_view(self, idx):
        view = idx.with_query_synonyms({"rapid": ["fast"]})
        got = view.search("rapid", top_k=None).collect()
        assert sorted(r.docid for r in got) == ["0", "2"]

    def test_index_side_analysis_unchanged(self, idx):
        # the view only rewires QUERY analysis; term_frequency (index
        # introspection) still sees the stored vocabulary
        view = idx.with_query_synonyms({"rapid": ["fast"]})
        assert not view.has_token("text", "rapid")
        assert view.has_token("text", "fast")


def test_string_synonym_value_treated_as_single_term():
    """{"fast": "quick"} must mean one synonym, not the characters
    q/u/i/c/k (str satisfies Sequence[str])."""
    from ex_elasticlunr_spark.analysis.synonyms import SynonymFilter

    f = SynonymFilter({"fast": "quick"})
    assert f.mapping == {"fast": ["quick"]}


def test_string_group_raises():
    from ex_elasticlunr_spark.analysis.synonyms import synonym_groups

    with pytest.raises(TypeError, match="wrap it in a list"):
        synonym_groups("fast", "quick")


def test_search_many_honors_synonym_view(spark):
    """Bulk search must analyze through the Index-level view config:
    with_query_synonyms only swaps the Index's analyzers, not the
    inverted tables' — search_many used to read the latter and silently
    ignore the view."""
    docs = spark.createDataFrame(
        [("a", "fast engine"), ("b", "slow engine")],
        "docid string, text string")
    ix = Index(name="sm-syn", store_positions=False).add_field("text")
    ix.add_documents(docs, docid_col="docid", dedupe=False)
    view = ix.with_query_synonyms({"rapid": ["fast"]})
    hits = {r["docid"]
            for r in view.search_many({"q": "rapid"}, "text").collect()}
    assert hits == {"a"}
    # the base index is unaffected: 'rapid' is out-of-vocabulary
    assert ix.search_many({"q": "rapid"}, "text").count() == 0


def test_search_many_mixed_key_types(spark):
    docs = spark.createDataFrame([("a", "fast engine")],
                                 "docid string, text string")
    ix = Index(name="sm-mixed", store_positions=False).add_field("text")
    ix.add_documents(docs, docid_col="docid", dedupe=False)
    got = {r["query_id"]
           for r in ix.search_many({1: "fast", "b": "engine"},
                                   "text").collect()}
    assert got == {"1", "b"}
