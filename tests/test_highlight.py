"""Snippet/highlight operators over stored ordinals and char positions.

The reference stores per-occurrence positions (tokenizer.ex:61-66,
field.ex:224-230) and surfaces them raw in results (core/index.ex:
258-266); these tests pin the two consumers built on top of them.
"""

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.search import highlight


def _idx(spark, rows):
    df = spark.createDataFrame(rows, "docid string, text string")
    idx = Index(name="hl").add_field("text")
    idx.add_documents(df, docid_col="docid")
    return idx.inverted, df


def test_snippet_ords_golden(spark):
    inv, _ = _idx(spark, [
        # analyzed: [quick, fox, jump, lazi, dog, quick, end]
        ("1", "the quick fox jumped a lazy dog quick end"),
        ("2", "nothing here"),
    ])
    rows = {r["docid"]: r for r in
            highlight.snippet_ords(inv, "text", ["quick"], window=3)
            .collect()}
    assert list(rows) == ["1"]
    r = rows["1"]
    assert r["first_ord"] == 0
    assert r["n_matches"] == 2
    assert r["snippet"] == "quick fox jump"


def test_snippet_ords_window_beyond_tail(spark):
    inv, _ = _idx(spark, [("1", "alpha beta")])
    r = highlight.snippet_ords(inv, "text", ["beta"], window=8).collect()[0]
    # window truncates at the document tail
    assert r["first_ord"] == 1 and r["snippet"] == "beta"


def test_highlight_spans_golden(spark):
    text = "the quick fox jumped a lazy dog quick end"
    inv, df = _idx(spark, [("1", text)])
    r = highlight.highlight_spans(inv, "text", ["quick"], df, context=4) \
        .collect()[0]
    starts = [(s["start"], s["length"]) for s in r["spans"]]
    assert starts == [(4, 5), (32, 5)]
    # excerpt spans first_start-4 .. last_end+4 in the ORIGINAL text
    assert r["excerpt"] == text[0:41]  # max(4-4,0)=0 .. 32+5+4=41
    assert "quick" in r["excerpt"]


def test_highlight_spans_no_match_is_empty(spark):
    inv, df = _idx(spark, [("1", "alpha beta")])
    assert highlight.highlight_spans(inv, "text", ["zzz"], df).count() == 0


def test_snippet_ords_requires_token_ordinals(spark):
    """Without stored token ordinals the explode would silently return
    zero rows (indistinguishable from no hits) — fail fast instead,
    both for store_positions=False builds and compat-loaded reference
    dumps (char positions, NULL ords)."""
    import pytest
    from pyspark.sql import functions as F

    from ex_elasticlunr_spark import Index
    from ex_elasticlunr_spark.search import highlight

    docs = spark.createDataFrame([("a", "spark fast")],
                                 "docid string, text string")
    ix = Index(name="noords", store_positions=False).add_field("text")
    ix.add_documents(docs, docid_col="docid", dedupe=False)
    with pytest.raises(ValueError, match="token ordinals"):
        highlight.snippet_ords(ix.inverted, "text", ["spark"])
    # compat marker path
    ix2 = Index(name="hasords").add_field("text")
    ix2.add_documents(docs, docid_col="docid", dedupe=False)
    ix2.inverted.has_token_ordinals = False
    with pytest.raises(ValueError, match="token ordinals"):
        highlight.snippet_ords(ix2.inverted, "text", ["spark"])
