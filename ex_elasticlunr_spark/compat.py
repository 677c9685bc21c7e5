"""Reference serialization compat: read/write the ``.index`` gzip line
protocol (reference deserializer.ex:6-93, protocol_implementations.ex
Serializer impls, storage/disk.ex:23-49).

The reference's Disk provider writes TWO files per index: ``<name>.index``
(gzipped lines ``command#key:value|key:value`` carrying the SCHEMA —
settings, db, fields + their pipelines) and ``<name>.data`` (a DETS dump
of the ETS posting rows, storage/disk.ex:23-31 via db.ex:52-70
``:ets.to_dets``). Both sides are supported for READING a reference
index end-to-end:

* ``read_index_schema`` / ``write_index_schema`` — the ``.index`` line
  protocol, both directions (deserializer.ex:6-93).
* ``read_data_rows`` — the ``.data`` DETS container. Every object in a
  DETS file is stored as an Erlang ``term_to_binary`` blob (External
  Term Format, publicly specified in the Erlang/OTP ERTS docs), so
  rather than re-implementing the DETS v9 hash-table layout the reader
  scans for version-tagged ETF terms and strictly decodes each
  candidate (a false-positive 0x83 byte fails the tag parse and is
  skipped; real objects decode to the reference's row shapes
  ``{{:field_term, f, t, id}, %{positions, total}}``,
  ``{{:field_tf, f, t, id}, tf}``, ``{{:field_idf, f, t}, idf}``,
  ``{{:field_ids, f, id}}``, ``{{:field_flnorm, f}, flnorm}`` —
  core/field.ex:217-241).
* ``read_disk_index`` — schema + rows -> a QUERYABLE Index (postings
  reconstructed from field_term rows, stats re-derived by the B5
  aggregation and cross-checkable against the stored
  field_idf/field_flnorm rows).

Writing ``.data`` is deliberately out of scope: our durable data plane
is the parquet warehouse (build/indexer.py).
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


def read_index_schema(path: str) -> Index:
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


# ---------------------------------------------------------------------------
# .data (DETS dump of the ETS posting rows) — reader
# ---------------------------------------------------------------------------

def _etf_decode(buf: bytes, i: int):
    """Decode one Erlang External Term Format term at ``buf[i:]`` ->
    (python value, end offset). Covers the tags the reference's row
    terms use (ERTS "External Term Format" public spec); atoms decode
    to plain strings. Raises ValueError on any unknown/invalid tag —
    the scanner relies on that to reject false-positive version bytes.
    """
    import struct

    t = buf[i]
    i += 1
    if t == 97:  # SMALL_INTEGER_EXT
        return buf[i], i + 1
    if t == 98:  # INTEGER_EXT
        return struct.unpack(">i", buf[i:i + 4])[0], i + 4
    if t == 70:  # NEW_FLOAT_EXT
        return struct.unpack(">d", buf[i:i + 8])[0], i + 8
    if t == 100:  # ATOM_EXT (latin1)
        n = struct.unpack(">H", buf[i:i + 2])[0]
        return buf[i + 2:i + 2 + n].decode("latin1"), i + 2 + n
    if t == 115:  # SMALL_ATOM_EXT
        n = buf[i]
        return buf[i + 1:i + 1 + n].decode("latin1"), i + 1 + n
    if t == 119:  # SMALL_ATOM_UTF8_EXT
        n = buf[i]
        return buf[i + 1:i + 1 + n].decode("utf8"), i + 1 + n
    if t == 118:  # ATOM_UTF8_EXT
        n = struct.unpack(">H", buf[i:i + 2])[0]
        return buf[i + 2:i + 2 + n].decode("utf8"), i + 2 + n
    if t in (104, 105):  # SMALL_TUPLE_EXT / LARGE_TUPLE_EXT
        if t == 104:
            n = buf[i]
            i += 1
        else:
            n = struct.unpack(">I", buf[i:i + 4])[0]
            i += 4
        out = []
        for _ in range(n):
            v, i = _etf_decode(buf, i)
            out.append(v)
        return tuple(out), i
    if t == 109:  # BINARY_EXT (reference strings)
        n = struct.unpack(">I", buf[i:i + 4])[0]
        return buf[i + 4:i + 4 + n].decode("utf8", "replace"), i + 4 + n
    if t == 116:  # MAP_EXT
        n = struct.unpack(">I", buf[i:i + 4])[0]
        i += 4
        out = {}
        for _ in range(n):
            k, i = _etf_decode(buf, i)
            v, i = _etf_decode(buf, i)
            out[k if not isinstance(k, (tuple, list, dict)) else str(k)] = v
        return out, i
    if t == 108:  # LIST_EXT
        n = struct.unpack(">I", buf[i:i + 4])[0]
        i += 4
        out = []
        for _ in range(n):
            v, i = _etf_decode(buf, i)
            out.append(v)
        tail, i = _etf_decode(buf, i)  # improper tails don't occur here
        return out, i
    if t == 106:  # NIL_EXT
        return [], i
    if t == 107:  # STRING_EXT (byte list)
        n = struct.unpack(">H", buf[i:i + 2])[0]
        return list(buf[i + 2:i + 2 + n]), i + 2 + n
    if t == 110:  # SMALL_BIG_EXT
        n, sign = buf[i], buf[i + 1]
        i += 2
        val = int.from_bytes(buf[i:i + n], "little")
        return (-val if sign else val), i + n
    raise ValueError(f"unsupported ETF tag {t}")


def read_data_rows(path: str) -> dict:
    """``<name>.data`` (DETS container) -> the reference's ETS rows.

    Returns {"field_term": [(field, term, docid, total, positions)],
             "field_tf":   [(field, term, docid, tf)],
             "field_idf":  [(field, term, idf)],
             "field_ids":  [(field, docid)],
             "field_flnorm": [(field, flnorm)]}
    with docids stringified (our docid column type) and positions
    flattened to [start0, len0, start1, len1, ...].

    The DETS v9 hash-table layout is not decoded; every stored object
    is a ``term_to_binary`` blob, so the reader scans for the ETF
    version byte (131) and strictly decodes each candidate — an invalid
    candidate fails the tag parse and is skipped, a valid one consumes
    its exact span (core/field.ex:217-241 row shapes).
    """
    data = open(path, "rb").read()
    out: dict = {"field_term": [], "field_tf": [], "field_idf": [],
                 "field_ids": [], "field_flnorm": []}
    i = 0
    while True:
        j = data.find(b"\x83", i)
        if j < 0:
            break
        # advance conservatively: only a RECOGNIZED row shape consumes
        # its full decoded span — a false-positive 0x83 that happens to
        # decode as some long tuple must not swallow the bytes of a real
        # DETS object that starts inside it (that would silently drop
        # posting rows from the replayed index)
        i = j + 1
        try:
            term, end = _etf_decode(data, j + 1)
        except Exception:  # noqa: BLE001 — scanner: skip non-term bytes
            continue
        if not (isinstance(term, tuple) and term
                and isinstance(term[0], tuple) and term[0]):
            continue
        key = term[0]
        kind = key[0]
        # shape extraction under the same false-positive tolerance as
        # the decode: a stray 0x83 can decode to a recognized kind and
        # arity with WRONG inner types (float("x"), a non-dict meta) —
        # treat any extraction failure as not-a-row and resume at j+1
        # rather than abort the whole read
        try:
            if kind == "field_term" and len(key) == 4 and len(term) == 2:
                meta = term[1] or {}
                pos = []
                for p in meta.get("positions") or []:
                    pos.extend([int(p[0]), int(p[1])])
                out["field_term"].append(
                    (key[1], key[2], str(key[3]),
                     int(meta.get("total", 1)), pos))
            elif kind == "field_tf" and len(key) == 4 and len(term) == 2:
                out["field_tf"].append((key[1], key[2], str(key[3]),
                                        float(term[1])))
            elif kind == "field_idf" and len(key) == 3 and len(term) == 2:
                out["field_idf"].append((key[1], key[2], float(term[1])))
            elif kind == "field_ids" and len(key) == 3:
                out["field_ids"].append((key[1], str(key[2])))
            elif kind == "field_flnorm" and len(key) == 2 and len(term) == 2:
                out["field_flnorm"].append((key[1], float(term[1])))
            else:
                continue  # unrecognized shape: cursor stays at j + 1
        except (TypeError, ValueError, AttributeError, IndexError,
                KeyError):
            continue  # recognized arity, wrong inner types: not a row
        i = end
    return out


def read_disk_index(spark, index_path: str, data_path: Optional[str] = None
                    ) -> Index:
    """Load a reference Disk-provider index (``.index`` + ``.data``) as
    a QUERYABLE Index — the full storage/disk.ex:33-49 read path: schema
    from the line protocol, posting rows from the DETS dump, stats
    re-derived by the B5 aggregation (recalculate_idf semantics; the
    stored field_idf/field_flnorm rows come out identical — pinned by
    tests/test_compat.py against the reference's own users fixture).

    Positions are reattached to postings; token ORDINALS are not stored
    by the reference, so match_phrase is unavailable on such an index
    (exactly the reference's feature set — it never consumes positions).
    """
    from pyspark.sql import functions as F

    from .build.indexer import _finalize
    from .functions.literals import inline_rows

    idx = read_index_schema(index_path)
    if data_path is None:
        data_path = index_path[:-len(".index")] + ".data"
    rows = read_data_rows(data_path)

    postings = inline_rows(
        spark,
        [(f, t, d, tot, pos or None)
         for f, t, d, tot, pos in rows["field_term"]],
        "field string, term string, docid string, tf_raw long, "
        "positions array<int>",
    ).withColumn("tf", F.sqrt(F.col("tf_raw"))) \
     .withColumn("ords", F.lit(None).cast("array<int>"))
    ids = inline_rows(spark, sorted(set(rows["field_ids"])),
                      "field string, docid string")
    docs = ids.select("docid").distinct()
    analyzers = dict(idx.analyzers)
    for f, _ in rows["field_ids"]:
        if f != idx.ref:  # the ref field is implicit (IdPipeline)
            analyzers.setdefault(f, AnalyzerConfig())
    idx.analyzers = analyzers
    idx.inverted = _finalize(postings, docs, analyzers,
                             store_positions=True, ids=ids)
    # the reference stores {start,len} CHAR positions but no token
    # ordinals — consumers that need the token stream (snippet_ords)
    # must fail fast instead of exploding a null array to zero rows
    idx.inverted.has_token_ordinals = False
    return idx
