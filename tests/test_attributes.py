"""Doc-attribute extensions: range clauses, date histograms, field
collapsing (search/attributes.py) — engine vs a pure-Python oracle over
a deterministic corpus, plus tie/edge determinism pins."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ex_elasticlunr_spark import Index

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _docs(spark, n=40):
    rows = []
    words = ["spark", "merge", "window", "fast", "join", "sort", "query"]
    for i in range(n):
        text = " ".join(words[(i + j) % len(words)]
                        for j in range(3 + i % 5))
        rows.append((str(i), text, f"grp{i % 7}",
                     T0 + dt.timedelta(minutes=7 * i), 7 * i))
    return spark.createDataFrame(
        rows,
        "docid string, text string, grp string, ts timestamp, mins long")


@pytest.fixture(scope="module")
def idx(spark):
    docs = _docs(spark)
    ix = Index(name="attr-test", store_positions=False).add_field("text")
    ix.add_documents(docs, docid_col="docid", dedupe=False)
    ix.bind_attributes(docs.select("docid", "grp", "ts", "mins"))
    ix.materialize()
    return ix


def _base_scores(idx, terms):
    """Engine scores for a terms query, docid -> score."""
    return {r.docid: r.score
            for r in idx.search({"query": {"terms": {"text": terms}}},
                                top_k=None).collect()}


class TestRange:
    def test_filter_restricts_must(self, idx):
        lo, hi = "2026-01-01 00:30:00", "2026-01-01 02:00:00"
        got = idx.search({"query": {"bool": {
            "must": {"terms": {"text": "spark"}},
            "filter": [{"range": {"ts": {"gte": lo, "lt": hi}}}],
        }}}).collect()
        base = _base_scores(idx, "spark")
        lo_m, hi_m = 30, 120
        want = {d: s for d, s in base.items()
                if lo_m <= 7 * int(d) < hi_m}
        assert {r.docid: r.score for r in got} == want
        assert got  # non-trivial slice

    def test_root_range_constant_score(self, idx):
        got = idx.search(
            {"query": {"range": {"ts": {"lt": "2026-01-01 00:22:00"}}}}
        ).collect()
        assert sorted(int(r.docid) for r in got) == [0, 1, 2, 3]
        assert {r.score for r in got} == {1.0}

    def test_bounds_inclusive_exclusive(self, idx):
        # gte/lte hit the boundary docs, gt/lt exclude them
        at = (T0 + dt.timedelta(minutes=14)).strftime("%Y-%m-%d %H:%M:%S")
        inc = idx.search({"query": {"range": {"ts": {"gte": at,
                                                     "lte": at}}}}).collect()
        assert [r.docid for r in inc] == ["2"]
        exc = idx.search({"query": {"range": {"ts": {"gt": at,
                                                     "lt": at}}}}).collect()
        assert exc == []

    def test_numeric_like_string_attr(self, idx):
        got = idx.search(
            {"query": {"range": {"grp": {"gte": "grp5"}}}}).collect()
        assert {r.docid[-1] for r in got} <= set("0123456789")
        want = {str(i) for i in range(40) if f"grp{i % 7}" >= "grp5"}
        assert {r.docid for r in got} == want

    def test_unbound_attributes_raise(self, spark):
        docs = _docs(spark, 5)
        ix = Index(name="nobind",
                   store_positions=False).add_field("text")
        ix.add_documents(docs, docid_col="docid", dedupe=False)
        with pytest.raises(ValueError, match="bind_attributes"):
            ix.search({"query": {"range": {"ts": {"gte": "2026-01-01"}}}}) \
              .collect()

    def test_bad_bounds_raise(self, idx):
        with pytest.raises(ValueError, match="range bounds"):
            idx.search({"query": {"range": {"ts": {"between": "x"}}}})
        with pytest.raises(ValueError, match="unknown attribute"):
            idx.search({"query": {"range": {"nope": {"gte": 1}}}}).collect()

    def test_range_under_should_and_not(self, idx):
        # range composes like any node: NOT range = complement universe
        got = idx.search({"query": {"not": {
            "range": {"ts": {"lt": "2026-01-01 00:22:00"}}}}}).collect()
        assert sorted(int(r.docid) for r in got) == list(range(4, 40))


class TestDateHistogram:
    def test_hourly_counts(self, idx):
        got = idx.facet_date_histogram(
            {"query": {"match_all": {}}}, "ts", interval="hour").collect()
        want = {}
        for i in range(40):
            b = (T0 + dt.timedelta(minutes=7 * i)).replace(minute=0)
            want[b] = want.get(b, 0) + 1
        assert {r.bucket: r.doc_count for r in got} == want
        assert [r.bucket for r in got] == sorted(want)  # ordered

    def test_matched_only(self, idx):
        got = idx.facet_date_histogram(
            {"query": {"terms": {"text": "spark"}}}, "ts",
            interval="day").collect()
        n = len(_base_scores(idx, "spark"))
        assert sum(r.doc_count for r in got) == n

    def test_bad_interval(self, idx):
        with pytest.raises(ValueError, match="interval"):
            idx.facet_date_histogram({"query": {"match_all": {}}}, "ts",
                                     interval="fortnight")


class TestCollapse:
    def test_best_doc_per_group(self, idx):
        scores = _base_scores(idx, ["spark", "merg", "window"])
        got = idx.search_collapse(
            {"query": {"terms": {"text": ["spark", "merg", "window"]}}},
            "grp", top_k=None).collect()
        # oracle: per grp, (score desc, docid asc) winner + group size
        groups = {}
        for d, s in scores.items():
            groups.setdefault(f"grp{int(d) % 7}", []).append((d, s))
        want = {}
        for g, members in groups.items():
            best = min(members, key=lambda p: (-p[1], p[0]))
            want[g] = (best[0], best[1], len(members))
        assert {r.grp: (r.docid, r.score, r.group_size)
                for r in got} == want
        # ordered (score desc, docid asc)
        keys = [(-r.score, r.docid) for r in got]
        assert keys == sorted(keys)

    def test_tie_breaks_on_docid(self, spark):
        # four docs with IDENTICAL text -> identical scores; the winner
        # per group must be the lexicographically smallest docid
        rows = [(d, "alpha beta", "g1") for d in ["9", "10", "b", "a"]]
        df = spark.createDataFrame(
            rows, "docid string, text string, grp string")
        ix = Index(name="ties", store_positions=False).add_field("text")
        ix.add_documents(df, docid_col="docid", dedupe=False)
        ix.bind_attributes(df.select("docid", "grp"))
        got = ix.search_collapse(
            {"query": {"terms": {"text": "alpha"}}}, "grp").collect()
        assert len(got) == 1
        assert got[0].docid == "10"  # string order: "10" < "9" < "a" < "b"
        assert got[0].group_size == 4

    def test_topk_limits_groups(self, idx):
        got = idx.search_collapse(
            {"query": {"match_all": {}}}, "grp", top_k=3).collect()
        assert len(got) == 3


class TestExists:
    def test_null_and_nonnull(self, spark):
        rows = [("0", "alpha beta", "g"), ("1", "alpha", None),
                ("2", "beta", "h"), ("3", "alpha beta gamma", None)]
        df = spark.createDataFrame(
            rows, "docid string, text string, grp string")
        ix = Index(name="exists", store_positions=False).add_field("text")
        ix.add_documents(df, docid_col="docid", dedupe=False)
        ix.bind_attributes(df.select("docid", "grp"))
        got = ix.search({"query": {"exists": {"field": "grp"}}}).collect()
        assert sorted(r.docid for r in got) == ["0", "2"]
        assert {r.score for r in got} == {1.0}
        # as a bool filter: must scores survive, null-grp docs drop
        got = ix.search({"query": {"bool": {
            "must": {"terms": {"text": "alpha"}},
            "filter": [{"exists": {"field": "grp"}}],
        }}}).collect()
        assert [r.docid for r in got] == ["0"]

    def test_bad_shapes(self, idx):
        with pytest.raises(ValueError, match="exists takes"):
            idx.search({"query": {"exists": "ts"}})
        with pytest.raises(ValueError, match="unknown attribute"):
            idx.search({"query": {"exists": {"field": "nope"}}}).collect()


class TestStats:
    def test_numeric_stats_over_match(self, idx):
        # attribute: minutes offset = 7*i; matched set = docs with
        # "spark" — oracle the five stats in python
        docs = sorted(int(d) for d in _base_scores(idx, "spark"))
        mins = [7 * i for i in docs]
        ix2 = idx  # grp/ts bound; bind a numeric column too
        got = ix2.facet_stats(
            {"query": {"terms": {"text": "spark"}}}, "mins").collect()
        assert len(got) == 1
        r = got[0]
        assert r.doc_count == len(mins)
        assert r.min_v == float(min(mins))
        assert r.max_v == float(max(mins))
        assert abs(r.avg_v - sum(mins) / len(mins)) < 1e-9
        assert r.sum_v == float(sum(mins))

    def test_unknown_attr(self, idx):
        with pytest.raises(ValueError, match="unknown attribute"):
            idx.facet_stats({"query": {"match_all": {}}}, "nope")


class TestDecay:
    @pytest.mark.parametrize("shape", ["exp", "gauss", "linear"])
    def test_decay_oracle(self, idx, shape):
        import math

        base = _base_scores(idx, ["spark", "merg"])
        origin = "2026-01-01 02:00:00"
        o_s = (T0 + dt.timedelta(hours=2) - dt.datetime(1970, 1, 1)
               ).total_seconds()
        scale, decay = 3600.0, 0.5
        got = idx.search_decay(
            {"query": {"terms": {"text": ["spark", "merg"]}}},
            "ts", origin, scale, decay=decay, shape=shape,
            top_k=None).collect()

        def mult(d):
            ts = (T0 + dt.timedelta(minutes=7 * int(d))
                  - dt.datetime(1970, 1, 1)).total_seconds()
            dist = abs(ts - o_s)
            if shape == "exp":
                return math.exp(math.log(decay) / scale * dist)
            if shape == "gauss":
                s2 = -(scale ** 2) / (2 * math.log(decay))
                return math.exp(-dist * dist / (2 * s2))
            s = scale / (1 - decay)
            return max(0.0, (s - dist) / s)

        want = {d: s * mult(d) for d, s in base.items()}
        assert set(r.docid for r in got) == set(want)
        for r in got:
            assert abs(r.score - want[r.docid]) < 1e-9, r.docid
        # ordered (score desc, docid asc)
        keys = [(-r.score, r.docid) for r in got]
        assert keys == sorted(keys)

    def test_recency_reorders(self, idx):
        # identical base scores -> latest doc wins under decay from a
        # late origin
        got = idx.search_decay(
            {"query": {"match_all": {}}}, "ts",
            "2026-01-01 04:33:00", 3600.0, top_k=3).collect()
        assert [r.docid for r in got][0] == "39"  # closest to origin

    def test_param_validation(self, idx):
        with pytest.raises(ValueError, match="shape"):
            idx.search_decay({"query": {"match_all": {}}}, "ts",
                             "2026-01-01", 10.0, shape="step").collect()
        with pytest.raises(ValueError, match="decay"):
            idx.search_decay({"query": {"match_all": {}}}, "ts",
                             "2026-01-01", 10.0, decay=1.5).collect()
        with pytest.raises(ValueError, match="scale"):
            idx.search_decay({"query": {"match_all": {}}}, "ts",
                             "2026-01-01", -1.0).collect()


class TestAttributePushdown:
    def test_range_predicate_reaches_parquet_scan(self, spark, tmp_path):
        # attributes read from parquet: the range bounds must land in
        # the scan's PushedFilters, and only (docid, ts) is read
        import datetime as dtm

        p = str(tmp_path / "attrs.parquet")
        rows = [(str(i), "spark text", f"g{i % 3}",
                 T0 + dtm.timedelta(minutes=i)) for i in range(50)]
        spark.createDataFrame(
            rows, "docid string, text string, grp string, ts timestamp"
        ).write.parquet(p)
        df = spark.read.parquet(p)
        ix = Index(name="push-attrs",
                   store_positions=False).add_field("text")
        ix.add_documents(df, docid_col="docid", dedupe=False)
        ix.bind_attributes(spark.read.parquet(p).drop("text"))
        res = ix.search({"query": {"range": {"ts": {
            "gte": "2026-01-01 00:10:00", "lt": "2026-01-01 00:20:00"}}}})
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "GreaterThanOrEqual(ts" in plan
        assert "LessThan(ts" in plan
        assert res.count() == 10


class TestHardening:
    """Regression pins for the silent-failure modes: NULL-cast bound
    literals, NULL attribute values in aggregations, duplicate
    attribute rows."""

    def test_unparseable_timestamp_bound_raises(self, idx):
        # F.lit('2026-02-30').cast(timestamp) would NULL out and match
        # NOTHING silently; the compile must raise instead
        with pytest.raises(ValueError, match="unparseable"):
            idx.search({"query": {"bool": {
                "must": {"terms": {"text": "spark"}},
                "filter": [{"range": {"ts": {"gte": "2026-02-30"}}}],
            }}}).collect()

    def test_unparseable_numeric_bound_raises(self, idx):
        with pytest.raises(ValueError, match="unparseable"):
            idx.search({"query": {"range": {"mins": {"lt": "abc"}}}})

    def test_unparseable_decay_origin_raises(self, idx):
        with pytest.raises(ValueError, match="unparseable"):
            idx.search_decay({"query": {"terms": {"text": "spark"}}},
                             "ts", "not-a-date", 3600.0)

    def test_date_histogram_drops_null_attr(self, spark):
        docs = spark.createDataFrame(
            [("a", "spark fast", dt.datetime(2026, 1, 1, 10)),
             ("b", "spark slow", None),
             ("c", "spark mid", dt.datetime(2026, 1, 1, 11))],
            "docid string, text string, ts timestamp")
        ix = Index(name="nullts", store_positions=False).add_field("text")
        ix.add_documents(docs, docid_col="docid", dedupe=False)
        ix.bind_attributes(docs.select("docid", "ts"))
        rows = ix.facet_date_histogram(
            {"query": {"terms": {"text": "spark"}}}, "ts",
            interval="hour").collect()
        assert all(r["bucket"] is not None for r in rows)
        assert sum(r["doc_count"] for r in rows) == 2

    def test_collapse_drops_null_group(self, spark):
        docs = spark.createDataFrame(
            [("a", "spark fast", "g1"), ("b", "spark slow", None),
             ("c", "spark mid", "g1")],
            "docid string, text string, grp string")
        ix = Index(name="nullgrp", store_positions=False).add_field("text")
        ix.add_documents(docs, docid_col="docid", dedupe=False)
        ix.bind_attributes(docs.select("docid", "grp"))
        rows = ix.search_collapse(
            {"query": {"terms": {"text": "spark"}}}, "grp").collect()
        assert [r["grp"] for r in rows] == ["g1"]
        assert rows[0]["group_size"] == 2

    def test_bind_attributes_dedupe_deterministic(self, spark):
        docs = spark.createDataFrame(
            [("a", "spark one")], "docid string, text string")
        attrs = spark.createDataFrame(
            [("a", "g2", 5), ("a", "g1", 9)],
            "docid string, grp string, mins int")
        ix = Index(name="dupattr", store_positions=False).add_field("text")
        ix.add_documents(docs, docid_col="docid", dedupe=False)
        ix.bind_attributes(attrs, dedupe=True)
        got = ix._attributes.collect()
        assert len(got) == 1
        # lexicographically smallest row per docid wins
        assert (got[0]["grp"], got[0]["mins"]) == ("g1", 9)

    def test_duplicate_attr_rows_without_dedupe_double_count(self, spark):
        # the documented contract: duplicates multiply membership —
        # pinned so the dedupe=True escape hatch stays honest
        docs = spark.createDataFrame(
            [("a", "spark one")], "docid string, text string")
        attrs = spark.createDataFrame(
            [("a", 1), ("a", 1)], "docid string, mins int")
        ix = Index(name="dupattr2", store_positions=False).add_field("text")
        ix.add_documents(docs, docid_col="docid", dedupe=False)
        ix.bind_attributes(attrs)
        n = ix.search({"query": {"range": {"mins": {"gte": 0}}}},
                      top_k=None).count()
        assert n == 2  # duplicated membership, as documented
        ix.bind_attributes(attrs, dedupe=True)
        assert ix.search({"query": {"range": {"mins": {"gte": 0}}}},
                         top_k=None).count() == 1
