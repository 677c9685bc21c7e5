"""Reference serialization compat: read/write the ``.index`` gzip line
protocol (reference deserializer.ex:6-93, protocol_implementations.ex
Serializer impls, storage/disk.ex:23-49).

The reference's Disk provider writes TWO files per index: ``<name>.index``
(gzipped lines ``command#key:value|key:value`` carrying the SCHEMA —
settings, db, fields + their pipelines) and ``<name>.data`` (an Erlang
ETS ``tab2file`` dump of the posting rows). The ``.index`` side is fully
supported here, both directions; the ``.data`` blob is Erlang external
term format and is NOT a data interchange format — our data plane is the
parquet warehouse (build/indexer.py), so ``read_index_schema`` returns an
empty Index with the reference's fields/pipelines/settings, exactly like
the reference's own deserializer before the ETS load (disk.ex:38-41).
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, List, Optional, Tuple

from .functions.udfs import AnalyzerConfig
from .index import Index

# reference pipeline callback module <-> our analyzer stage names
_CALLBACK_TO_STAGE = {
    "Elixir.Elasticlunr.Pipeline.Trimmer": "trim",
    "Elixir.Elasticlunr.Pipeline.StopWordFilter": "stop",
    "Elixir.Elasticlunr.Pipeline.Stemmer": "stem",
}
_STAGE_TO_CALLBACK = {v: k for k, v in _CALLBACK_TO_STAGE.items()}
_ID_PIPELINE = "Elixir.Elasticlunr.Index.IdPipeline"


def _parse_opts(opts: str) -> Dict[str, str]:
    """``key:value|key:value`` -> dict (deserializer.ex:80-88)."""
    out: Dict[str, str] = {}
    for option in opts.split("|"):
        key, _, value = option.partition(":")
        out[key] = value
    return out


def parse_index_lines(lines) -> dict:
    """Parse the line protocol into a plain description dict:
    {name, ref, pipeline: [callback...], fields: {name: {pipeline: [...],
    store_documents, store_positions}}}."""
    desc: dict = {"fields": {}}
    default_pipeline: List[str] = []
    for line in lines:
        command, _, rest = line.strip().partition("#")
        if command == "settings":
            opts = _parse_opts(rest)
            desc["name"] = opts.get("name", "index")
            desc["ref"] = opts.get("ref", "id")
            default_pipeline = opts.get("pipeline", "").split(",")
            desc["pipeline"] = default_pipeline
        elif command == "db":
            desc["db"] = _parse_opts(rest)
        elif command == "field":
            opts = _parse_opts(rest)
            raw = opts.get("pipeline", "")
            callbacks = [
                default_pipeline[int(c)] if c.isdigit() else c
                for c in raw.split(",") if c
            ]
            desc["fields"][opts["name"]] = {
                "pipeline": callbacks,
                "store_documents": opts.get("store_documents") == "true",
                "store_positions": opts.get("store_positions") == "true",
            }
    return desc


def _stages_of(callbacks: List[str]) -> Tuple[str, ...]:
    return tuple(
        _CALLBACK_TO_STAGE[c] for c in callbacks if c in _CALLBACK_TO_STAGE
    )


def read_index_schema(path: str, spark=None) -> Index:
    """``<name>.index`` (gzip line protocol) -> empty Index with the
    reference's fields + analyzer pipelines. The ref/IdPipeline field
    becomes the docid universe (it is not an analyzed field here)."""
    with gzip.open(path, "rt") as fh:
        desc = parse_index_lines(fh)
    store_positions = any(
        f["store_positions"] for f in desc["fields"].values()
    ) or not desc["fields"]
    idx = Index(name=desc.get("name", "index"), ref=desc.get("ref", "id"),
                store_positions=store_positions)
    for fname, f in sorted(desc["fields"].items()):
        if f["pipeline"] == [_ID_PIPELINE] or fname == desc.get("ref"):
            continue  # the ref field is implicit (IdPipeline, index.ex:39-47)
        idx.add_field(fname, AnalyzerConfig(stages=_stages_of(f["pipeline"])))
    return idx


def serialize_index_lines(index: Index) -> List[str]:
    """Index -> the reference's line protocol (Serializer impls,
    protocol_implementations.ex:38-66): settings, db, one field line per
    field (pipeline referenced by position in the default pipeline when
    it matches, verbatim otherwise) + the implicit ref/IdPipeline field."""
    default_stages = ("trim", "stop", "stem")
    default_cbs = [_STAGE_TO_CALLBACK[s] for s in default_stages]
    pipeline_pos = {cb: str(i) for i, cb in enumerate(default_cbs)}

    lines = [
        "settings#name:{}|ref:{}|pipeline:{}".format(
            index.name, index.ref, ",".join(default_cbs)),
        "db#name:elasticlunr_{}|options:compressed,named_table,set,public"
        .format(index.name),
    ]
    fields = dict(index.analyzers)
    sp = "true" if index.store_positions else "false"
    for fname in sorted(fields):
        cbs = [_STAGE_TO_CALLBACK[s] for s in fields[fname].stages
               if s in _STAGE_TO_CALLBACK]
        ref = ",".join(pipeline_pos.get(c, c) for c in cbs)
        lines.append(
            f"field#name:{fname}|pipeline:{ref}"
            f"|store_documents:true|store_positions:{sp}")
    lines.append(
        f"field#name:{index.ref}|pipeline:{_ID_PIPELINE}"
        "|store_documents:false|store_positions:false")
    return lines


def write_index_schema(index: Index, path: str) -> None:
    """Write ``<name>.index`` in the reference's gzip line format."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with gzip.open(path, "wt") as fh:
        fh.write("\n".join(serialize_index_lines(index)) + "\n")
