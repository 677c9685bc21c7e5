"""Compound scoring queries (constant_score / dis_max / boosting —
extensions; the reference's DSL stops at bool, dsl/query.ex:17-26) and
the histogram / significant_terms aggregations: engine vs expectations
derived from the engine's own single-clause results plus hand oracles
over a deterministic corpus."""

import math

import pytest

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.analysis.pipeline import Pipeline

WORDS = ["spark", "merge", "window", "fast", "join", "sort", "query"]


def _docs(spark, n=40):
    rows = []
    for i in range(n):
        text = " ".join(WORDS[(i + j) % len(WORDS)]
                        for j in range(3 + i % 5))
        rows.append((str(i), text, 7 * i))
    return spark.createDataFrame(rows, "docid string, text string, mins long")


@pytest.fixture(scope="module")
def idx(spark):
    docs = _docs(spark)
    ix = Index(name="compound-test", store_positions=False).add_field("text")
    ix.add_documents(docs, docid_col="docid", dedupe=False)
    ix.bind_attributes(docs.select("docid", "mins"))
    ix.materialize()
    return ix


def _scores(idx, query, **kw):
    return {r.docid: r.score
            for r in idx.search({"query": query}, top_k=None, **kw).collect()}


class TestConstantScore:
    def test_root(self, idx):
        base = _scores(idx, {"terms": {"text": "spark"}})
        got = _scores(idx, {"constant_score": {
            "filter": {"terms": {"text": "spark"}}, "boost": 3.5}})
        assert got == {d: 3.5 for d in base}
        assert got  # non-trivial

    def test_default_boost_one(self, idx):
        got = _scores(idx, {"constant_score": {
            "filter": {"match": {"text": "spark merge"}}}})
        assert set(got.values()) == {1.0}

    def test_range_inner(self, idx):
        got = _scores(idx, {"constant_score": {
            "filter": {"range": {"mins": {"lt": 28}}}, "boost": 2.0}})
        assert got == {str(i): 2.0 for i in range(4)}

    def test_inside_bool_should_sums(self, idx):
        base = _scores(idx, {"terms": {"text": "spark"}})
        got = _scores(idx, {"bool": {"should": [
            {"terms": {"text": "spark"}},
            {"constant_score": {"filter": {"terms": {"text": "spark"}},
                                "boost": 10.0}},
        ]}})
        assert got == pytest.approx({d: s + 10.0 for d, s in base.items()})

    def test_parse_requires_filter(self, idx):
        with pytest.raises(ValueError, match="constant_score"):
            idx.search({"query": {"constant_score": {"boost": 2}}}).collect()


class TestDisMax:
    CLAUSES = [{"terms": {"text": "spark"}}, {"terms": {"text": "fast"}},
               {"terms": {"text": "window"}}]

    def _clause_scores(self, idx, mode="elasticlunr"):
        return [_scores(idx, c, mode=mode) for c in self.CLAUSES]

    @pytest.mark.parametrize("mode", ["elasticlunr", "bm25"])
    @pytest.mark.parametrize("tie", [0.0, 0.3])
    def test_max_plus_tiebreak(self, idx, mode, tie):
        per = self._clause_scores(idx, mode=mode)
        want = {}
        for d in set().union(*per):
            ss = [p[d] for p in per if d in p]
            want[d] = round(max(ss) + tie * (sum(ss) - max(ss)), 6)
        got = _scores(idx, {"dis_max": {"queries": self.CLAUSES,
                                        "tie_breaker": tie}}, mode=mode)
        # expectation composes per-clause scores ALREADY rounded to 6
        # decimals; the engine rounds once at the end — allow 1 ulp
        assert got == pytest.approx(want, abs=2e-6)
        # ranks differ from bool/should when tie < 1 somewhere
        assert len(got) == len(want) > 0

    def test_boost_scales(self, idx):
        plain = _scores(idx, {"dis_max": {"queries": self.CLAUSES}})
        boosted = _scores(idx, {"dis_max": {"queries": self.CLAUSES,
                                            "boost": 2.0}})
        assert boosted == pytest.approx({d: 2 * s for d, s in plain.items()})

    def test_parse_requires_queries(self, idx):
        with pytest.raises(ValueError, match="dis_max"):
            idx.search({"query": {"dis_max": {"tie_breaker": 0.5}}}).collect()


class TestBoosting:
    def test_demotes_not_excludes(self, idx):
        pos = _scores(idx, {"terms": {"text": "spark"}})
        neg = _scores(idx, {"range": {"mins": {"lt": 70}}})
        got = _scores(idx, {"boosting": {
            "positive": {"terms": {"text": "spark"}},
            "negative": {"range": {"mins": {"lt": 70}}},
            "negative_boost": 0.25,
        }})
        want = {d: s * (0.25 if d in neg else 1.0)
                for d, s in pos.items()}
        assert got == pytest.approx(want)
        # both demoted and undemoted docs present
        assert any(d in neg for d in pos) and any(d not in neg for d in pos)

    def test_default_negative_boost(self, idx):
        pos = _scores(idx, {"terms": {"text": "fast"}})
        got = _scores(idx, {"boosting": {
            "positive": {"terms": {"text": "fast"}},
            "negative": {"terms": {"text": "fast"}},
        }})
        assert got == pytest.approx(
            {d: s * 0.5 for d, s in pos.items()})

    def test_parse_requires_both(self, idx):
        with pytest.raises(ValueError, match="boosting"):
            idx.search({"query": {"boosting": {
                "positive": {"match_all": {}}}}}).collect()


class TestFacetHistogram:
    def test_counts(self, idx):
        matched = set(_scores(idx, {"terms": {"text": "spark"}}))
        want = {}
        for d in matched:
            b = (7 * int(d)) // 50 * 50
            want[float(b)] = want.get(float(b), 0) + 1
        got = idx.facet_histogram({"query": {"terms": {"text": "spark"}}},
                                  "mins", interval=50)
        rows = got.collect()
        assert {r.bucket: r.doc_count for r in rows} == want
        assert [r.bucket for r in rows] == sorted(want)  # bucket order

    def test_min_count_and_bad_interval(self, idx):
        got = idx.facet_histogram({"query": {"match_all": {}}}, "mins",
                                  interval=50, min_count=2).collect()
        assert all(r.doc_count >= 2 for r in got)
        with pytest.raises(ValueError, match="interval"):
            idx.facet_histogram({"query": {"match_all": {}}}, "mins",
                                interval=0)


class TestSignificantTerms:
    def _oracle(self, idx, matched, top_n=10, min_doc_count=2):
        """JLH over the analyzed corpus, computed independently."""
        pipe = Pipeline.default()
        docs = {r.docid: set(pipe.run_terms(r.text))
                for r in _docs(idx._attributes.sparkSession).collect()}
        n_docs = len(docs)
        fg_docs = {d: t for d, t in docs.items() if d in matched}
        fg_total = len(fg_docs)
        terms = set().union(*docs.values())
        out = []
        for t in sorted(terms):
            fg = sum(1 for v in fg_docs.values() if t in v)
            bg = sum(1 for v in docs.values() if t in v)
            if fg < min_doc_count:
                continue
            fg_pct, bg_pct = fg / fg_total, bg / n_docs
            if fg_pct <= bg_pct:
                continue
            out.append((t, fg, bg,
                        round((fg_pct - bg_pct) * (fg_pct / bg_pct), 9)))
        out.sort(key=lambda r: (-r[3], r[0]))
        return out[:top_n]

    def test_vs_oracle(self, idx):
        q = {"query": {"terms": {"text": "spark"}}}
        matched = set(_scores(idx, q["query"]))
        want = self._oracle(idx, matched)
        got = [(r.term, r.fg_count, r.bg_count, r.score)
               for r in idx.significant_terms(q, "text").collect()]
        assert got == pytest.approx(want)
        assert got  # the co-occurring neighbors of "spark" surface

    def test_match_all_has_no_significant_terms(self, idx):
        # fg == corpus -> fg_pct == bg_pct for every term -> empty
        got = idx.significant_terms({"query": {"match_all": {}}},
                                    "text").collect()
        assert got == []
