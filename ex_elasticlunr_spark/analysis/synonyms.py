"""Synonym token filter (extension).

The reference's pipeline protocol (pipeline.ex:27-40) already allows a
callback to return a LIST of tokens — the runner flat-maps — but ships
no synonym stage. This one expands a token into itself plus its
synonym group, the standard query-time synonym treatment: under
elasticlunr scoring (max over terms) a synonym is an equally-good
alternative. NOTE msm and ``operator:"and"`` count over the EXPANDED
token list (match rewrite sets msm after analysis, dsl/nodes.py) — a
view that expands "fast" to [fast, quick] makes operator:"and" demand
BOTH terms. Synonym views compose with OR-style matching; combine with
msm only if the inflated count is what you mean
(Index.with_query_synonyms documents the same caveat).

The filter is a picklable class instance, so it rides the existing
AnalyzerConfig.extra / query_pipeline seams into the executor-side
pandas UDF unchanged. Mappings are matched against the token text AT
THE FILTER'S PIPELINE POSITION — append it after "stem" and write the
mapping in stemmed form (the common choice, since query and index
vocabularies meet post-stem).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from .token import Token


class SynonymFilter:
    """Token -> [token, *synonyms]; pass-through for unmapped tokens.

    ``mapping`` is one-directional ({"fast": ["quick", "speedy"]}).
    For symmetric groups pass the same group under every member (or use
    :func:`synonym_groups`).
    """

    def __init__(self, mapping: Dict[str, Sequence[str]]):
        # a bare string satisfies Sequence[str] but would iterate
        # character-by-character ({"fast": "quick"} -> q/u/i/c/k);
        # treat it as the obvious intent: one synonym
        self.mapping: Dict[str, List[str]] = {
            k: [s for s in ([v] if isinstance(v, str) else v)
                if s and s != k]
            for k, v in mapping.items()
        }

    def __call__(self, token: Token):
        syns = self.mapping.get(token.token)
        if not syns:
            return token
        # expansions inherit the source token's position: a synonym hit
        # highlights the text the user actually typed/wrote
        return [token] + [token.with_token(s) for s in syns]

    def __eq__(self, other):  # pipeline dedupe (pipeline.ex add/insert)
        return (type(other) is SynonymFilter
                and other.mapping == self.mapping)

    def __hash__(self):
        return hash(tuple(sorted(
            (k, tuple(v)) for k, v in self.mapping.items())))


def synonym_groups(*groups: Sequence[str]) -> Dict[str, List[str]]:
    """Symmetric mapping from undirected synonym groups:
    synonym_groups(["fast", "quick"], ...) maps every member to the
    rest of its group."""
    out: Dict[str, List[str]] = {}
    for g in groups:
        if isinstance(g, str):
            # a bare string would be iterated character-by-character —
            # always a caller bug, never an intent
            raise TypeError(
                f"synonym_groups takes sequences of terms, got the "
                f"string {g!r}; wrap it in a list")
        for m in g:
            out.setdefault(m, [])
            out[m].extend(s for s in g if s != m and s not in out[m])
    return out
