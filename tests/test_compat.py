"""Reference .index line-protocol compat: parse the reference's OWN
fixture (test/support/fixture/users.index) and round-trip our writer
through our reader (serializer_test.exs / deserializer_test.exs model).
"""

import gzip

from ex_elasticlunr_spark import compat
from ex_elasticlunr_spark.index import Index
from ex_elasticlunr_spark.functions.udfs import AnalyzerConfig

FIXTURE = "/root/reference/test/support/fixture/users.index"


def test_parse_reference_fixture():
    with gzip.open(FIXTURE, "rt") as fh:
        desc = compat.parse_index_lines(fh)
    assert desc["name"] == "users"
    assert desc["ref"] == "id"
    assert set(desc["fields"]) == {"address", "education", "id", "name"}
    # numeric pipeline refs resolve through the settings pipeline
    assert desc["fields"]["address"]["pipeline"] == [
        "Elixir.Elasticlunr.Pipeline.Trimmer",
        "Elixir.Elasticlunr.Pipeline.StopWordFilter",
        "Elixir.Elasticlunr.Pipeline.Stemmer",
    ]
    assert desc["fields"]["id"]["pipeline"] == [
        "Elixir.Elasticlunr.Index.IdPipeline"]
    assert desc["fields"]["id"]["store_positions"] is False


def test_read_reference_fixture_as_index():
    idx = compat.read_index_schema(FIXTURE)
    assert idx.name == "users"
    assert idx.ref == "id"
    # the IdPipeline ref field is implicit; the 3 content fields carry
    # the default trim/stop/stem analyzer
    assert set(idx.analyzers) == {"address", "education", "name"}
    assert idx.analyzers["name"].stages == ("trim", "stop", "stem")
    assert idx.store_positions is True


def test_write_read_roundtrip(tmp_path):
    idx = Index(name="rt", ref="docid").add_field("text").add_field(
        "title", AnalyzerConfig(stages=("trim",)))
    path = str(tmp_path / "rt.index")
    compat.write_index_schema(idx, path)
    back = compat.read_index_schema(path)
    assert back.name == "rt" and back.ref == "docid"
    assert set(back.analyzers) == {"text", "title"}
    assert back.analyzers["text"].stages == ("trim", "stop", "stem")
    assert back.analyzers["title"].stages == ("trim",)
    # the written file is valid input for the reference's own parser
    with gzip.open(path, "rt") as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0].startswith("settings#name:rt|ref:docid|pipeline:Elixir.")
    assert any(line.startswith("field#name:docid|pipeline:"
                                "Elixir.Elasticlunr.Index.IdPipeline")
               for line in lines)
