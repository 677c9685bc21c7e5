"""Analyzer goldens ported from the reference test suite.

Sources: /root/reference/test/tokenizer_test.exs,
test/pipeline/trimmer_test.exs, test/pipeline/stop_word_filter_test.exs,
test/pipeline/stemmer_test.exs (+ stemmer_fixture.json),
test/pipeline_test.exs.
"""

import json
import os

from ex_elasticlunr_spark.analysis import (
    Pipeline,
    Token,
    is_stop_word,
    stem,
    tokenize,
    trim_str,
)

HERE = os.path.dirname(__file__)


class TestTokenizer:
    def test_positions(self):
        # tokenizer_test.exs:7-17 — "the man came home"
        toks = tokenize("the man came home")
        assert [(t.token, t.start, t.length) for t in toks] == [
            ("the", 0, 3),
            ("man", 4, 3),
            ("came", 8, 4),
            ("home", 13, 4),
        ]

    def test_downcase(self):
        assert [t.token for t in tokenize("FOO BAR")] == ["foo", "bar"]

    def test_hyphen_and_space_split(self):
        toks = tokenize("take the New York-San Francisco flight")
        assert [t.token for t in toks] == [
            "take", "the", "new", "york", "san", "francisco", "flight",
        ]

    def test_separated_hyphen(self):
        toks = tokenize("Solve for A - B")
        assert [t.token for t in toks] == ["solve", "for", "a", "b"]

    def test_custom_separators(self):
        assert [t.token for t in tokenize("html/css/javascript", r"/")] == [
            "html", "css", "javascript",
        ]
        assert [t.token for t in tokenize(r"a\b\c", r"\\")] == ["a", "b", "c"]
        assert [t.token for t in tokenize("foo/bar%baz", r"[/%]+")] == [
            "foo", "bar", "baz",
        ]

    def test_number(self):
        assert [t.token for t in tokenize(42)] == ["42"]

    def test_leading_trailing_separators(self):
        assert [t.token for t in tokenize("  hello  world  ")] == ["hello", "world"]
        assert tokenize("   ") == []
        assert tokenize("") == []


class TestTrimmer:
    def test_goldens(self):
        # trimmer_test.exs:22-31
        cases = {
            "hello.": "hello",
            "it's": "it's",
            "james'": "james",
            "stop!'": "stop",
            "[[[tag]]]": "tag",
            "~!@@@hello***()()()]]": "hello",
            "": "",
        }
        for raw, want in cases.items():
            assert trim_str(raw) == want, raw

    def test_empty_result_kept_semantics(self):
        # pure punctuation trims to empty string (NOT dropped by trimmer)
        assert trim_str("~!@@@") == ""


class TestStopWords:
    def test_membership(self):
        from ex_elasticlunr_spark.analysis.stop_words import STOP_WORDS
        fixture = json.load(open(os.path.join(HERE, "fixtures", "stop_words.json")))
        assert len(fixture) == 119
        assert set(fixture) == set(STOP_WORDS)
        for w in fixture:
            assert is_stop_word(w)
        assert not is_stop_word("elixir")
        assert not is_stop_word("spark")


class TestStemmer:
    def test_reference_fixture(self):
        fixture = json.load(open(os.path.join(HERE, "fixtures", "stemmer_fixture.json")))
        for word, want in fixture.items():
            assert stem(word) == want, word

    def test_consignment_worlds(self):
        # pipeline_test.exs:48-53
        assert stem("consignment") == "consign"
        assert stem("worlds") == "world"


class TestPipeline:
    def test_default_pipeline(self):
        # pipeline_test.exs:45-62 semantics: tokenize -> trim -> stop -> stem
        p = Pipeline.default()
        assert p.run_terms("consignment worlds") == ["consign", "world"]

    def test_stop_words_dropped(self):
        p = Pipeline.default()
        assert p.run_terms("the quick fox") == ["quick", "fox"]

    def test_empty_token_survives_trim(self):
        # a pure-punctuation token trims to "" and is kept (reference
        # Pipeline filters only nil)
        p = Pipeline.default()
        assert p.run_terms("hello ***") == ["hello", ""]

    def test_expanding_callback(self):
        # index_test.exs:265-315 uses a lambda that expands one token
        def expander(tok: Token):
            if tok.token == "ab":
                return [tok, tok.with_token("ba")]
            return tok

        p = Pipeline([expander])
        assert p.run_terms("ab cd") == ["ab", "ba", "cd"]

    def test_positions(self):
        p = Pipeline.default()
        toks = p.run("The quick fox")
        assert [(t.token, t.start, t.length) for t in toks] == [
            ("quick", 4, 5),
            ("fox", 10, 3),
        ]

    def test_editing(self):
        def a(t):
            return t

        def b(t):
            return t

        p = Pipeline([a])
        p2 = p.insert_after(b, a)
        assert p2.callbacks == [a, b]
        p3 = p2.remove(a)
        assert p3.callbacks == [b]
        p4 = Pipeline([a]).insert_before(b, a)
        assert p4.callbacks == [b, a]


def test_trimmer_ascii_parity():
    """Elixir ~r/\\W/ without the `u` flag is ASCII-only (PCRE), so
    non-ASCII letters trim as non-word chars (trimmer.ex:8-9)."""
    from ex_elasticlunr_spark.analysis.trimmer import trim_str

    assert trim_str("über.") == "ber"
    assert trim_str("naïve") == "naïve"     # 'ï' is mid-word, untouched
    assert trim_str("café") == "caf"        # trailing 'é' is \W in ASCII
    assert trim_str("it's") == "it's"


def test_tokenizer_ascii_separator():
    """ASCII \\s: NBSP is NOT a separator (reference PCRE semantics)."""
    from ex_elasticlunr_spark.analysis.tokenizer import tokenize

    toks = [t.token for t in tokenize("foo bar baz")]
    assert toks == ["foo bar", "baz"]


def test_unicode_mode_goldens():
    """AnalyzerConfig(unicode=True) lifts re.ASCII: \\W/\\s classes follow
    Unicode (documented deviation from reference parity); the default
    ASCII mode keeps the reference's PCRE-without-`u` semantics."""
    from ex_elasticlunr_spark.functions.udfs import AnalyzerConfig

    text = "Über-café naïve fox. L'élève—ok"
    ascii_p = AnalyzerConfig().to_pipeline()
    uni_p = AnalyzerConfig(unicode=True).to_pipeline()
    # ASCII trimmer strips non-ASCII letters at token edges (ü, é)
    assert ascii_p.run_terms(text) == ["ber", "caf", "naïv", "fox",
                                       "l'élève—ok"]
    # Unicode trimmer keeps them; interior chars were never trimmed
    assert uni_p.run_terms(text) == ["über", "café", "naïv", "fox",
                                     "l'élève—ok"]


def test_unicode_mode_manifest_roundtrip(spark, tmp_path):
    """The unicode flag survives save()/load() via the manifest."""
    from ex_elasticlunr_spark import Index
    from ex_elasticlunr_spark.functions.udfs import AnalyzerConfig

    df = spark.createDataFrame(
        [("1", "Über café"), ("2", "plain text")], "docid string, text string")
    idx = Index(name="u", pipeline=AnalyzerConfig(unicode=True))
    idx.add_field("text")
    idx.add_documents(df, docid_col="docid")
    path = str(tmp_path / "uindex")
    idx.save(path)
    loaded = Index.load(spark, path)
    assert loaded.analyzers["text"].unicode is True
    # the unicode term survives indexing end-to-end
    assert loaded.has_token("text", "über")
