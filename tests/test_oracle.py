"""Validate the pure-Python oracle against the reference's own test
expectations (test/dsl_test.exs, test/core/index_test.exs,
test/core/field_test.exs). The oracle is then the rank-identity referee
for the Spark engine.
"""

import math

import pytest

from ex_elasticlunr_spark.analysis import Pipeline
from tests.oracle import core as oc
from tests.oracle.core import (
    BoolQ,
    MatchAllQ,
    MatchQ,
    NotQ,
    OracleIndex,
    TermsQ,
    parse,
    search,
)

LOREM = (
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit. Maecenas "
    "viverra enim non purus rutrum porta ut non urna. Nullam eu ante eget "
    "nisi laoreet pretium. Curabitur varius velit vel viverra facilisis. "
    "Pellentesque et condimentum mauris. Quisque faucibus varius interdum. "
    "Fusce cursus pretium tempus. Ut gravida tortor et mi dignissim "
    "sagittis. Aliquam ullamcorper dignissim arcu sollicitudin fermentum. "
    "Nunc elementum tortor ex, sit amet posuere lectus accumsan quis. "
    "Vivamus sit amet eros blandit, sagittis quam at, vulputate felis. Ut "
    "faucibus pretium feugiat. Fusce diam felis, euismod ac tellus id, "
    "blandit venenatis dolor. Nullam porttitor suscipit diam, a feugiat "
    "dui pharetra at."
)

DOCS = [
    {"id": 1, "content": "The quick fox jumped over the lazy dog"},
    {"id": 2, "content": LOREM},
    {"id": 3, "content": "Lorem dog"},
    {"id": 4, "content": "livebook is elixir's own jupyter. it's a very impressive impression."},
    {"id": 5, "content": "there are lots of contributors to the elixir project and many cool "
                          "projects using elixir, ex. livebook, elixir_nx and so on"},
]


@pytest.fixture
def index():
    # dsl_test.exs uses a tokenizer-only pipeline (its callback is
    # identity on Token structs)
    idx = OracleIndex(pipeline=Pipeline([]))
    idx.add_field("content")
    idx.add_documents(DOCS)
    return idx


class TestMatchAll:
    def test_all_docs_score_one(self, index):
        result = MatchAllQ().score(index)
        assert len(result) == 5
        assert all(r["score"] == 1.0 for r in result)


class TestTerms:
    def test_base(self, index):
        result = TermsQ(field="content", terms=["fox"]).score(index)
        assert len(result) == 1
        assert result[0]["ref"] == "1"

    def test_boost(self, index):
        base = TermsQ(field="content", terms=["fox"]).score(index)
        boosted = TermsQ(field="content", terms=["fox"], boost=2).score(index)
        assert len(base) == len(boosted) == 1
        assert boosted[0]["score"] == base[0]["score"] * 2

    def test_score_formula(self, index):
        # tf=sqrt(1), idf=1+log10(5/2), flnorm=1/sqrt(unique terms)
        f = index.fields["content"]
        uniq = len(f.term_docs)
        expected = 1.0 * (1 + math.log10(5 / 2)) ** 2 * (1 / math.sqrt(uniq))
        result = TermsQ(field="content", terms=["fox"]).score(index)
        assert result[0]["score"] == pytest.approx(expected)

    def test_max_over_terms_not_sum(self, index):
        # doc1 matches both "quick" and "fox" (each df=1): a multi-term
        # terms query takes the MAX single-term score, not the sum
        single = TermsQ(field="content", terms=["fox"]).score(index)
        multi = TermsQ(field="content", terms=["quick", "fox"]).score(index)
        d1 = [r for r in multi if r["ref"] == "1"][0]
        assert d1["score"] == pytest.approx(single[0]["score"])

    def test_expand(self, index):
        result = TermsQ(field="content", terms=["liveboo"], expand=True).score(index)
        assert sorted(r["ref"] for r in result) == ["4", "5"]

    def test_fuzzy(self, index):
        result = TermsQ(field="content", terms=["fax"], fuzziness=1).score(index)
        assert [r["ref"] for r in result] == ["1"]

    def test_msm(self, index):
        result = TermsQ(
            field="content", terms=["quick", "fox", "lorem"], minimum_should_match=2
        ).score(index)
        assert [r["ref"] for r in result] == ["1"]


class TestBool:
    def test_must_with_should(self, index):
        q = BoolQ(
            must=TermsQ(field="content", terms=["lorem"]),
            should=[TermsQ(field="content", terms=["dog"])],
        )
        assert len(q.score(index)) == 1

    def test_must_not(self, index):
        q = BoolQ(
            must=TermsQ(field="content", terms=["lorem"]),
            must_not=TermsQ(field="content", terms=["ipsum"]),
            should=[TermsQ(field="content", terms=["dog"])],
        )
        result = q.score(index)
        assert len(result) > 0
        assert [r["ref"] for r in result] == ["3"]

    def test_should_sums_clause_scores(self, index):
        s1 = TermsQ(field="content", terms=["quick"]).score(index)
        s2 = TermsQ(field="content", terms=["fox"]).score(index)
        q = BoolQ(should=[
            TermsQ(field="content", terms=["quick"]),
            TermsQ(field="content", terms=["fox"]),
        ])
        result = q.score(index)
        d1 = [r for r in result if r["ref"] == "1"][0]
        assert d1["score"] == pytest.approx(s1[0]["score"] + s2[0]["score"])
        assert d1["matched"] == 2

    def test_search_me_is_empty(self, index):
        assert search(index, "me") == []


class TestMatch:
    def test_base(self, index):
        result = MatchQ(field="content", query="brown fox").score(index)
        assert len(result) == 1
        assert result[0]["ref"] == "1"

    def test_msm(self, index):
        result = MatchQ(
            field="content", query="brown fox quick", minimum_should_match=2
        ).score(index)
        assert len(result) == 1
        assert result[0]["ref"] == "1"

    def test_and_operator(self, index):
        result = MatchQ(
            field="content", query="fox quick", operator="and",
            minimum_should_match=0,
        ).score(index)
        assert len(result) == 1
        assert result[0]["ref"] == "1"

    def test_and_operator_excludes_partial(self, index):
        result = MatchQ(
            field="content", query="fox lorem", operator="and",
            minimum_should_match=0,
        ).score(index)
        assert result == []


class TestNot:
    def test_inner_query(self, index):
        q = NotQ(BoolQ(should=[
            MatchQ(field="content", query="quick"),
            MatchQ(field="content", query="lorem"),
        ]))
        result = q.score(index)
        assert sorted(r["ref"] for r in result) == ["4", "5"]
        assert all(r["score"] == 1.0 for r in result)


class TestParse:
    def test_terms_shapes(self):
        q = parse({"terms": {"name": "nelson"}})
        assert isinstance(q, TermsQ) and q.terms == ["nelson"]
        q = parse({"terms": {"name": {"value": "kim"}}})
        assert isinstance(q, TermsQ) and q.terms == ["kim"]
        q = parse({"terms": {"name": "john", "country": "us"}})
        assert isinstance(q, BoolQ) and len(q.should) == 2
        q = parse({"terms": {}})
        assert isinstance(q, MatchAllQ)

    def test_match_shapes(self):
        q = parse({"match": {}})
        assert isinstance(q, MatchAllQ)
        q = parse({"match": {"country": "us"}})
        assert isinstance(q, MatchQ) and q.query == "us"
        q = parse({"match": {"country": {"query": "us", "operator": "and"}}})
        assert q.operator == "and" and q.minimum_should_match == 0
        q = parse({"match": {"city": "arizona", "country": "us"}})
        assert isinstance(q, BoolQ) and q.minimum_should_match == 2

    def test_bool_shape(self):
        q = parse({"bool": {
            "must": {"terms": {"country": "us"}},
            "must_not": {"terms": {"gender": "male"}},
            "filter": {"match": {"balance": 1000}},
            "should": {"match": {"account_type": "savings"}},
        }})
        assert isinstance(q.must, TermsQ)
        assert isinstance(q.must_not, TermsQ)
        assert len(q.filter) == 1 and len(q.should) == 1
        assert q._default_msm() == 0  # must AND filter both present

    def test_not_shape(self):
        q = parse({"not": {"bool": {}}})
        assert isinstance(q, NotQ) and isinstance(q.inner, BoolQ)

    def test_match_all_boost(self):
        q = parse({"match_all": {"boost": 2.5}})
        assert isinstance(q, MatchAllQ) and q.boost == 2.5


class TestSearchEntryPoints:
    def test_string_search_all_fields(self, index):
        results = search(index, "dog")
        assert [r["ref"] for r in results] == ["3", "1"] or \
               [r["ref"] for r in results] == ["1", "3"]
        # doc3 is shorter — same tf/idf/norm, so equal scores; tie-break
        # is docid asc
        assert results[0]["ref"] == "1"

    def test_dsl_search(self, index):
        results = search(index, {"query": {"match": {"content": "fox quick"}}})
        assert results[0]["ref"] == "1"

    def test_map_query_sugar(self, index):
        results = search(index, {"content": "fox quick"})
        assert results[0]["ref"] == "1"

    def test_top_k(self, index):
        results = search(index, {"query": {"match_all": {}}}, top_k=3)
        assert len(results) == 3


class TestIndexBookkeeping:
    def test_remove_then_stats(self):
        # index_test.exs:190-218
        idx = OracleIndex(pipeline=Pipeline([]))
        idx.add_field("content")
        idx.add_documents([
            {"id": 1, "content": "this is a test"},
            {"id": 30, "content": "this is another test"},
        ])
        idx.remove_documents(["1"])
        f = idx.fields["content"]
        assert "another" in f.term_docs
        assert f.idf["another"] > 0
        assert list(f.term_docs["another"]) == ["30"]

    def test_tf_sqrt(self):
        # field_test.exs:35-39: single doc "hello world" -> tf 1.0
        idx = OracleIndex(pipeline=Pipeline([]))
        idx.add_field("content")
        idx.add_documents([{"id": 1, "content": "hello world"}])
        assert idx.fields["content"].tf("hello", "1") == 1.0

    def test_duplicate_doc_skipped(self):
        idx = OracleIndex(pipeline=Pipeline([]))
        idx.add_field("content")
        idx.add_documents([{"id": 1, "content": "hello"}])
        idx.add_documents([{"id": 1, "content": "different now"}])
        f = idx.fields["content"]
        assert "different" not in f.term_docs
        assert len(f.ids) == 1

    def test_levenshtein(self):
        assert oc.levenshtein("kitten", "sitting") == 3
        assert oc.levenshtein("", "abc") == 3
        assert oc.levenshtein("same", "same") == 0
