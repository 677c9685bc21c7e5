"""Analysis pipeline: an ordered list of token callbacks folded over the
token stream (reference: lib/elasticlunr/pipeline.ex:27-40,80-97).

Each callback takes one Token and returns a Token, a list of Tokens
(UDTF-style expansion), or None (drop). The runner flat-maps + filters
None — exactly the reference's ``excute_runner``. Editing ops
(add/insert_before/insert_after/remove with dedupe) mirror
pipeline.ex:18-77.

Inside Spark these same callbacks run batched inside one vectorized
pandas UDF (functions/udfs.py) — the per-Token protocol here is the
*semantic* contract (and what the oracle uses), not the execution plan.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

from . import porter2
from .stop_words import is_stop_word
from .token import Token
from .tokenizer import DEFAULT_SEPARATOR, tokenize
from .trimmer import trim

Callback = Callable[[Token], Union[Token, List[Token], None]]


def trimmer(token: Token) -> Token:
    return trim(token)


def unicode_trimmer(token: Token) -> Token:
    """Opt-in Unicode variant (AnalyzerConfig(unicode=True)): ``\\W``
    follows Unicode word chars — a documented deviation from reference
    parity (the reference's PCRE classes are ASCII-only)."""
    return trim(token, ascii_mode=False)


def stop_word_filter(token: Token) -> Optional[Token]:
    return None if is_stop_word(token.token) else token


def stemmer(token: Token) -> Token:
    return token.with_token(porter2.stem(token.token))


def id_pipeline_callback(token: Token) -> Token:
    """IdPipeline: identity (reference core/index.ex:1-10)."""
    return token


DEFAULT_RUNNERS: List[Callback] = [trimmer, stop_word_filter, stemmer]


class Pipeline:
    def __init__(self, callbacks: Optional[Sequence[Callback]] = None,
                 separator: str = DEFAULT_SEPARATOR,
                 unicode: bool = False):
        self.callbacks: List[Callback] = list(callbacks or [])
        self.separator = separator
        self.unicode = unicode

    @classmethod
    def default(cls) -> "Pipeline":
        return cls(DEFAULT_RUNNERS)

    def run(self, content: Union[str, int, float, List[Token]]) -> List[Token]:
        tokens = (content if isinstance(content, list)
                  else tokenize(content, self.separator,
                                ascii_mode=not self.unicode))
        for cb in self.callbacks:
            out: List[Token] = []
            for tok in tokens:
                res = cb(tok)
                if res is None:
                    continue
                if isinstance(res, list):
                    out.extend(t for t in res if t is not None)
                else:
                    out.append(res)
            tokens = out
        return tokens

    def run_terms(self, content: Union[str, int, float]) -> List[str]:
        return [t.token for t in self.run(content)]

    # -- editing (reference pipeline.ex:18-77) --------------------------
    def add(self, cb: Callback) -> "Pipeline":
        cbs = [cb] + [c for c in self.callbacks if c is not cb]
        return Pipeline(cbs, self.separator, self.unicode)

    def insert_before(self, cb: Callback, anchor: Callback) -> "Pipeline":
        return self._insert(cb, anchor, 0)

    def insert_after(self, cb: Callback, anchor: Callback) -> "Pipeline":
        return self._insert(cb, anchor, 1)

    def _insert(self, cb: Callback, anchor: Callback, off: int) -> "Pipeline":
        try:
            idx = self.callbacks.index(anchor)
        except ValueError:
            return self.add(cb)
        cbs = list(self.callbacks)
        cbs.insert(idx + off, cb)
        seen, out = set(), []
        for c in cbs:
            if id(c) not in seen:
                seen.add(id(c))
                out.append(c)
        return Pipeline(out, self.separator, self.unicode)

    def remove(self, cb: Callback) -> "Pipeline":
        return Pipeline([c for c in self.callbacks if c is not cb],
                        self.separator, self.unicode)


ID_PIPELINE = Pipeline([id_pipeline_callback])
