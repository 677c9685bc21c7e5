"""Pure-Python single-process oracle for the elasticlunr query semantics.

This is TEST infrastructure (the rank-identity referee), not engine code.
It reimplements the reference's exact formulas and query algebra:

* tf(term, doc)    = sqrt(occurrences)            field.ex:235
* idf(term)        = 1 + log10(N / (df + 1))      field.ex:340-341
* flnorm(field)    = 1 / sqrt(unique_terms)       field.ex:328-335 (0 if empty)
* per-(doc,term)   = tf * idf^2 * flnorm          terms_query.ex:89
* terms per-doc    = MAX over matched terms, * boost   terms_query.ex:80-97
* bool should      = SUM of clause scores, matched count  bool_query.ex:154-170
* keep iff matched >= minimum_should_match and score > 0  bool_query.ex:176-177
* not              = all docids minus matches, score 1    not_query.ex:23-32
* match_all        = all docids, score 1.0*boost          match_all_query.ex:19-23
* match rewrite    = analyze query -> terms/match_all     match_query.ex:34-83

Deviations from the reference (documented, intentional):
* fuzzy matching uses the postings of the *matched vocabulary term*
  (the reference's match_with_fuzz at field.ex:376-389 looks up the
  original query term's postings — an apparent bug its own tests never
  exercise beyond the exact-term case, which both semantics satisfy);
* result ordering adds a deterministic tie-break (score desc, docid asc)
  — the reference's plain sort (index.ex:262-265) leaves ties unordered.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ex_elasticlunr_spark.analysis import Pipeline, Token


def levenshtein(a: str, b: str) -> int:
    """Edit distance (reference utlis.ex:2-33)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class OracleField:
    def __init__(self, name: str, pipeline: Pipeline,
                 query_pipeline: Optional[Pipeline] = None):
        self.name = name
        self.pipeline = pipeline
        self.query_pipeline = query_pipeline
        # term -> docid -> {"total": int, "positions": [(start, len)]}
        self.term_docs: Dict[str, Dict[str, dict]] = {}
        self.ids: Dict[str, None] = {}  # insertion-ordered set
        self.idf: Dict[str, float] = {}
        self.flnorm: float = 0.0
        # per-doc indexed token count (post-pipeline), INCLUDING 0 for
        # zero-token docs — BM25 doc-length norm; the engine's doc_stats
        # rows carry the same (sentinel rows, build/indexer.py)
        self.doc_len: Dict[str, int] = {}

    # -- build ----------------------------------------------------------
    def add(self, docs: Sequence[Tuple[str, Union[str, int, float]]]) -> None:
        for docid, content in docs:
            if docid in self.ids:  # duplicate guard (field.ex:85)
                continue
            self.ids[docid] = None
            n_toks = 0
            for tok in self.pipeline.run(content):
                attrs = self.term_docs.setdefault(tok.token, {}).setdefault(
                    docid, {"total": 0, "positions": []}
                )
                attrs["total"] += 1
                attrs["positions"].append((tok.start, tok.length))
                n_toks += 1
            self.doc_len[docid] = n_toks
        self._recalculate()

    def remove(self, docids: Sequence[str]) -> None:
        for docid in docids:
            self.ids.pop(docid, None)
            self.doc_len.pop(docid, None)
            for term in list(self.term_docs):
                self.term_docs[term].pop(docid, None)
                if not self.term_docs[term]:
                    del self.term_docs[term]
        self._recalculate()

    def avg_doc_len(self) -> float:
        # mean over ALL docs in the field (zero-token docs included),
        # matching field_stats.avg_doc_len = avg over doc_stats rows
        return (sum(self.doc_len.values()) / len(self.ids)) if self.ids else 0.0

    def _recalculate(self) -> None:
        n = len(self.ids)
        uniq = len(self.term_docs)
        self.flnorm = 1.0 / math.sqrt(uniq) if uniq > 0 else 0.0
        self.idf = {
            term: 1.0 + math.log10(n / (len(docs) + 1))
            for term, docs in self.term_docs.items()
        }

    # -- analysis -------------------------------------------------------
    def analyze(self, content, is_query: bool = False) -> List[Token]:
        p = self.query_pipeline if (is_query and self.query_pipeline) else self.pipeline
        return p.run(content)

    def tf(self, term: str, docid: str) -> float:
        return math.sqrt(self.term_docs[term][docid]["total"])

    # -- terms lookup (field.ex:160-205) --------------------------------
    def terms(self, terms: Sequence[Union[str, re.Pattern]],
              fuzziness: int = 0, minimum_should_match: int = 1,
              docs: Optional[Sequence[str]] = None) -> Dict[str, List[dict]]:
        allowed = set(docs) if docs is not None else None
        matching: Dict[str, List[dict]] = {}

        def add_matches(vocab_term: str) -> None:
            for docid in self.term_docs.get(vocab_term, {}):
                if allowed is not None and docid not in allowed:
                    continue
                attrs = self.term_docs[vocab_term][docid]
                matching.setdefault(docid, []).append(
                    {
                        "term": vocab_term,
                        "tf": self.tf(vocab_term, docid),
                        "tf_raw": attrs["total"],
                        "df": len(self.term_docs[vocab_term]),
                        "idf": self.idf[vocab_term],
                        "norm": self.flnorm,
                        "doc_len": self.doc_len.get(docid, 0),
                        "positions": list(attrs["positions"]),
                    }
                )

        # vocabulary scans iterate TERM-SORTED, mirroring the reference's
        # ETS ordered_set iteration (db.ex:9-19, field.ex:372-386) — a
        # Python dict iterates in insertion order, which would change
        # which equal-score entry is "first" for the argmax tie-break in
        # TermsQ.score. (Deliberate deviation kept from the reference:
        # match_with_fuzz looks up postings of the matched VOCAB term;
        # the reference's `matching_ids(field, term)` at field.ex:379-381
        # passes the QUERY term, which returns nothing for out-of-vocab
        # query terms and would make fuzzy search a no-op — its own
        # fixtures only exercise in-vocab fuzz.)
        for t in terms:
            if isinstance(t, re.Pattern):
                for vocab_term in sorted(self.term_docs):
                    # search(), not match(): expand patterns carry their
                    # own ^ anchor; raw regex patterns are unanchored
                    # (the engine's rlike / Java find() semantics)
                    if t.search(vocab_term):
                        add_matches(vocab_term)
            elif fuzziness > 0:
                for vocab_term in sorted(self.term_docs):
                    if levenshtein(vocab_term, t) <= fuzziness:
                        add_matches(vocab_term)
            else:
                if t in self.term_docs:
                    add_matches(t)

        if minimum_should_match > 1:
            matching = {
                d: entries
                for d, entries in matching.items()
                if len(entries) >= minimum_should_match
            }
        return matching


class OracleIndex:
    def __init__(self, ref: str = "id", pipeline: Optional[Pipeline] = None):
        self.ref = ref
        self.pipeline = pipeline if pipeline is not None else Pipeline.default()
        self.fields: Dict[str, OracleField] = {}
        # leaf scoring mode: "elasticlunr" (reference parity: max over
        # terms of tf*idf^2*flnorm) or "bm25" (engine extension: sum over
        # matched entries of Robertson idf * saturated tf) — composition
        # semantics (bool/not/match_all) are mode-independent
        self.mode = "elasticlunr"
        self.k1 = 1.2
        self.b = 0.75
        # docid -> {attr: value} for range/exists clauses (mirrors
        # Index.bind_attributes); None values mean "attribute absent"
        self.attributes: Dict[str, dict] = {}

    def bind_attributes(self, attrs: Dict[str, dict]) -> "OracleIndex":
        self.attributes = attrs
        return self

    def bm25(self, k1: float = 1.2, b: float = 0.75) -> "OracleIndex":
        """A shallow view of this index scoring leaves in BM25 mode —
        shares field data; mirrors Index.search_bm25 (index.py)."""
        import copy

        out = copy.copy(self)
        out.mode, out.k1, out.b = "bm25", k1, b
        return out

    def add_field(self, name: str, pipeline: Optional[Pipeline] = None,
                  query_pipeline: Optional[Pipeline] = None) -> "OracleIndex":
        self.fields[name] = OracleField(
            name, pipeline if pipeline is not None else self.pipeline, query_pipeline
        )
        return self

    def add_documents(self, documents: Sequence[dict]) -> "OracleIndex":
        for doc in documents:
            docid = str(doc[self.ref])
            for fname, f in self.fields.items():
                if fname in doc and doc[fname] is not None:
                    f.add([(docid, doc[fname])])
        return self

    def remove_documents(self, docids: Sequence[str]) -> "OracleIndex":
        for f in self.fields.values():
            f.remove([str(d) for d in docids])
        return self

    def all(self) -> List[str]:
        seen: Dict[str, None] = {}
        for f in self.fields.values():
            for docid in f.ids:
                seen.setdefault(docid, None)
        return list(seen)


# ---------------------------------------------------------------------------
# Query AST
# ---------------------------------------------------------------------------


@dataclass
class TermsQ:
    field: str
    terms: List[str]
    boost: float = 1.0
    expand: bool = False
    fuzziness: int = 0
    minimum_should_match: int = 1
    regex: bool = False  # engine extension: unanchored vocab regex

    def score(self, index: OracleIndex, filtered: Optional[List[str]] = None):
        f = index.fields[self.field]
        if self.expand:
            terms: List[Union[str, re.Pattern]] = [
                re.compile("^" + re.escape(t) + ".*") for t in self.terms]
        elif self.regex:
            # engine extension: raw UNANCHORED patterns over the vocab
            # (scorer.py uses rlike, i.e. Java find() semantics)
            terms = [re.compile(t) for t in self.terms]
        else:
            terms = list(self.terms)
        docs = f.terms(
            terms,
            fuzziness=self.fuzziness,
            minimum_should_match=self.minimum_should_match,
            docs=filtered,
        )
        if index.mode == "bm25":
            # engine extension (search/scorer.py bm25 branch): SUM over
            # matched (query term, vocab term) entries of Robertson idf
            # * saturated tf with doc-length norm; N/avgdl include
            # zero-token docs (field_stats semantics)
            n = len(f.ids)
            avgdl = f.avg_doc_len()
            k1, b = index.k1, index.b
            out = []
            for docid, entries in docs.items():
                s = 0.0
                for e in entries:
                    idf = math.log(1.0 + (n - e["df"] + 0.5) / (e["df"] + 0.5))
                    tf_part = (e["tf_raw"] * (k1 + 1.0)) / (
                        e["tf_raw"]
                        + k1 * (1.0 - b + b * e["doc_len"] / avgdl)
                    )
                    s += idf * tf_part
                # details parity with the engine's bm25 branch
                # (scorer.py): ALL matched entries' positions,
                # term-sorted, and matched = entry count
                pos = [
                    p
                    for e in sorted(entries,
                                    key=lambda e: (e["term"], e["positions"]))
                    for p in e["positions"]
                ]
                out.append({"ref": docid, "score": s * self.boost,
                            "matched": len(entries),
                            "positions": {self.field: pos}})
            return out

        out = []
        for docid, entries in docs.items():
            best_score, best = 0.0, None
            for e in entries:  # strict > keeps the first max (terms_query.ex:82-84)
                s = e["tf"] * e["idf"] ** 2 * e["norm"]
                if s > best_score:
                    best_score, best = s, e
            out.append(
                {
                    "ref": docid,
                    "score": best_score * self.boost,
                    # the reference's terms result carries no matched
                    # count (terms_query.ex:91-97); the engine emits
                    # matched = (query term, vocab term) entry count for
                    # terms roots as a details extension — mirrored here
                    # so the referee can check it
                    "matched": len(entries),
                    "positions": {self.field: best["positions"] if best else []},
                }
            )
        return out


@dataclass
class MatchAllQ:
    boost: float = 1.0

    def score(self, index: OracleIndex, filtered=None):
        return [{"ref": d, "score": 1.0 * self.boost, "positions": {}} for d in index.all()]


@dataclass
class MatchQ:
    field: str
    query: Union[str, int, float]
    boost: float = 1.0
    expand: bool = False
    fuzziness: int = 0
    operator: str = "or"
    minimum_should_match: int = 1

    def rewrite(self, index: OracleIndex):
        tokens = index.fields[self.field].analyze(self.query, is_query=True)
        n = len(tokens)
        if n == 0:
            return MatchAllQ()
        if n == 1:
            return TermsQ(
                field=self.field, terms=[tokens[0].token], boost=self.boost,
                expand=self.expand, fuzziness=self.fuzziness,
            )
        msm = self.minimum_should_match
        if self.operator == "and" and msm == 0:
            msm = n
        return TermsQ(
            field=self.field, terms=[t.token for t in tokens], boost=self.boost,
            expand=self.expand, fuzziness=self.fuzziness, minimum_should_match=msm,
        )

    def score(self, index: OracleIndex, filtered=None):
        return self.rewrite(index).score(index, filtered)


_RANGE_FNS = {
    "gte": lambda v, b: v >= b,
    "gt": lambda v, b: v > b,
    "lte": lambda v, b: v <= b,
    "lt": lambda v, b: v < b,
}


@dataclass
class RangeQ:
    """Attribute range clause (engine extension,
    search/attributes.py range_scores): constant-score membership of
    docs whose bound attribute satisfies every gte/gt/lte/lt bound;
    docs with a missing/None attribute never match."""

    attr: str
    conds: dict
    boost: float = 1.0

    def _match(self, v) -> bool:
        return v is not None and all(
            _RANGE_FNS[op](v, b) for op, b in self.conds.items())

    def score(self, index: OracleIndex, filtered=None):
        cands = filtered if filtered is not None else index.all()
        attrs = index.attributes
        return [
            {"ref": d, "score": 1.0 * self.boost, "positions": {}}
            for d in cands
            if self._match(attrs.get(d, {}).get(self.attr))
        ]


@dataclass
class ExistsQ:
    """Attribute non-null clause (engine extension,
    search/attributes.py exists_scores)."""

    attr: str
    boost: float = 1.0

    def score(self, index: OracleIndex, filtered=None):
        cands = filtered if filtered is not None else index.all()
        attrs = index.attributes
        return [
            {"ref": d, "score": 1.0 * self.boost, "positions": {}}
            for d in cands
            if attrs.get(d, {}).get(self.attr) is not None
        ]


@dataclass
class NotQ:
    inner: object

    def score(self, index: OracleIndex, filtered=None):
        # reference (not_query.ex:23-25) forwards options[:filtered] to
        # the inner query but rejects from the UNRESTRICTED doc universe
        matched = {r["ref"] for r in self.inner.score(index, filtered=filtered)}
        return [
            {"ref": d, "score": 1.0, "positions": {}}
            for d in index.all()
            if d not in matched
        ]


@dataclass
class BoolQ:
    should: List[object] = dc_field(default_factory=list)
    must: Optional[object] = None
    must_not: Optional[object] = None
    filter: List[object] = dc_field(default_factory=list)
    minimum_should_match: Optional[int] = None

    def _default_msm(self) -> int:
        # bool_query.ex:313-322: 1 if should nonempty and (must empty OR
        # filter empty), else 0. Computed on the RAW filter list (before
        # must_not folding — the default is fixed at initial construction).
        if self.minimum_should_match is not None:
            return self.minimum_should_match
        if self.should and (self.must is None or not self.filter):
            return 1
        return 0

    def filter_clauses(self) -> List[object]:
        clauses = list(self.filter)
        if self.must_not is not None:
            clauses = [NotQ(self.must_not)] + clauses
        return clauses

    def score(self, index: OracleIndex, filtered=None):
        msm = self._default_msm()

        # filter chain: each clause scored restricted to prior survivors,
        # keep score > 0 (dsl/query.ex:39-46, bool_query.ex:180-197)
        base = None  # None == "no base restriction" (False in the reference)
        for clause in self.filter_clauses():
            restrict = None if base is None else [r["ref"] for r in base]
            res = _score(clause, index, restrict)
            base = [r for r in res if r["score"] > 0]

        # must: scored, restricted to filter survivors (bool_query.ex:199-213)
        if self.must is not None:
            restrict = None if base is None else [r["ref"] for r in base]
            base = _score(self.must, index, restrict)

        docs: Dict[str, dict] = {}
        restricted: Optional[List[str]] = None
        if base is not None:
            restricted = []
            for r in base:
                restricted.append(r["ref"])
                docs[r["ref"]] = {
                    "ref": r["ref"],
                    "score": r.get("score") or 0.0,
                    "matched": 0,
                    "positions": {},
                }

        for clause in self.should:
            for r in _score(clause, index, restricted):
                ob = docs.setdefault(
                    r["ref"],
                    {"ref": r["ref"], "score": 0.0, "matched": 0, "positions": {}},
                )
                ob["score"] += r.get("score", 0.0)
                ob["matched"] += 1
                for fld, pos in r.get("positions", {}).items():
                    ob["positions"].setdefault(fld, []).extend(pos)

        return [
            d for d in docs.values() if d["matched"] >= msm and d["score"] > 0
        ]


def _score(node, index: OracleIndex, filtered=None):
    # TermsQ (and MatchQ via rewrite) honors the docs restriction
    # (options[:filtered] read in terms_query.ex:70-76); NotQ receives
    # it too and forwards it to its INNER query while still rejecting
    # from the unrestricted universe (not_query.ex:23-31 — the default
    # Query.filter at dsl/query.ex:39-46 passes options through, so a
    # not inside a bool filter chain sees the prior clause's survivors)
    if isinstance(node, (TermsQ, MatchQ, NotQ, RangeQ, ExistsQ)):
        return node.score(index, filtered)
    return node.score(index)


# ---------------------------------------------------------------------------
# DSL parsing (dsl/query_repository.ex, per-node parse/3)
# ---------------------------------------------------------------------------

_OPTION_KEYS = {"boost", "expand", "fuzziness", "minimum_should_match",
                "operator", "regex"}


def parse(query: dict):
    (kind, value), = query.items()
    return _parse(kind, value)


def _parse(kind: str, options):
    if kind == "match_all":
        return MatchAllQ(boost=options.get("boost", 1) if isinstance(options, dict) else 1)
    if kind == "terms":
        return _parse_terms(options)
    if kind == "match":
        return _parse_match(options)
    if kind == "bool":
        return _parse_bool(options)
    if kind == "not":
        return NotQ(parse(options))
    if kind == "range":
        fields = {k: v for k, v in options.items() if k not in _OPTION_KEYS}
        (attr, params), = fields.items()
        conds = {k: v for k, v in params.items() if k in _RANGE_FNS}
        return RangeQ(attr=attr, conds=conds,
                      boost=params.get("boost", options.get("boost", 1)))
    if kind == "exists":
        return ExistsQ(attr=options["field"], boost=options.get("boost", 1))
    raise ValueError(f"Unknown query type {kind}")


def _parse_terms(options: dict):
    if not options:
        return MatchAllQ()
    fields = {k: v for k, v in options.items() if k not in _OPTION_KEYS}
    if len(fields) > 1:
        return BoolQ(should=[_parse_terms({f: v}) for f, v in fields.items()])
    (fname, params), = fields.items()
    if isinstance(params, dict):
        terms = params.get("value")
        opts = params
    else:
        terms = params
        opts = {}
    terms = terms if isinstance(terms, list) else [terms]
    return TermsQ(
        field=fname,
        terms=[str(t) for t in terms],
        boost=opts.get("boost", 1),
        expand=opts.get("expand", False),
        regex=opts.get("regex", False),
        fuzziness=opts.get("fuzziness", 0),
        minimum_should_match=opts.get("minimum_should_match", 1),
    )


def _parse_match(options: dict):
    if not options:
        return MatchAllQ()
    fields = {k: v for k, v in options.items() if k not in _OPTION_KEYS}
    if len(fields) > 1:
        return BoolQ(
            should=[_parse_match({f: v}) for f, v in fields.items()],
            minimum_should_match=len(fields),
        )
    (fname, params), = fields.items()
    if not isinstance(params, dict):
        params = {"query": params}
    operator = params.get("operator", "or")
    default_msm = 0 if operator == "and" else 1
    return MatchQ(
        field=fname,
        query=params.get("query"),
        boost=params.get("boost", 1),
        expand=params.get("expand", False),
        fuzziness=params.get("fuzziness", 0),
        operator=operator,
        minimum_should_match=params.get("minimum_should_match", default_msm),
    )


def _parse_bool(options: dict):
    should = options.get("should")
    if should is None:
        should = []
    elif not isinstance(should, list):
        should = [should]
    should = [parse(s) for s in should]

    filt = options.get("filter")
    if filt is None:
        filt = []
    elif not isinstance(filt, list):
        filt = [filt]
    filt = [parse(f) for f in filt]

    must = options.get("must")
    must = parse(must) if must is not None else None
    must_not = options.get("must_not")
    must_not = parse(must_not) if must_not is not None else None

    msm = options.get("minimum_should_match")
    if msm is not None and not msm <= len(should):
        msm = None  # bool_query.ex:296-311 keeps it only if <= #should

    return BoolQ(
        should=should, must=must, must_not=must_not, filter=filt,
        minimum_should_match=msm,
    )


# ---------------------------------------------------------------------------
# Search entry points (index.ex:177-266)
# ---------------------------------------------------------------------------


def search(index: OracleIndex, query, options: Optional[dict] = None,
           top_k: Optional[int] = None) -> List[dict]:
    if query is None:
        return []
    if isinstance(query, str) and options is None:
        dsl = {
            "query": {
                "bool": {
                    "should": [
                        {"match": {f: query}}
                        for f in index.fields
                        if f != index.ref
                    ]
                }
            }
        }
    elif isinstance(query, str) and "fields" in (options or {}):
        fields = options["fields"]
        matches = [
            {"match": {f: query}, "boost": fields[f]["boost"]}
            for f in fields
            if f != index.ref and fields[f].get("boost", 0) > 0
        ]
        # boost applies to the match clause (index.ex:200-224)
        should = [
            {"match": {next(iter(m["match"])): {"query": query, "boost": m["boost"]}}}
            for m in matches
        ]
        dsl = {"query": {"bool": {"should": should}}}
    elif isinstance(query, dict) and "query" in query:
        dsl = query
    elif isinstance(query, dict):
        opts = options or {"operator": "OR"}
        should = [
            {
                "expand": opts.get("expand", False),
                "match": {f: {"query": content, "operator": opts.get("bool", "or").lower()}},
            }
            for f, content in query.items()
        ]
        # "expand" rides on the match options (index.ex:229-256)
        should = [
            {"match": {k: dict(v, expand=s["expand"]) for k, v in s["match"].items()}}
            for s in should
        ]
        dsl = {"query": {"bool": {"should": should}}}
    else:
        raise ValueError("Root object must have a query element")

    node = parse(dsl["query"])
    results = node.score(index)
    results.sort(key=lambda r: (-r["score"], r["ref"]))
    return results[:top_k] if top_k else results
