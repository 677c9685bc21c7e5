"""Tokenizer: downcase + split on separator-character runs, with positions.

Semantics pinned against the reference (lib/elasticlunr/tokenizer.ex:4-66):

* the whole string is downcased first; positions refer to the downcased
  string (same indices as the original for ASCII);
* the separator is a regex tested against ONE character at a time
  (``match_string?/2``), so any regex behaves like a character class —
  a char c is a separator iff ``separator.search(c)`` matches;
* tokens are the maximal runs of non-separator characters; empty slices
  are suppressed (tokenizer.ex:32 ``slice_length > 0``), i.e. leading/
  trailing/repeated separators emit nothing;
* each token carries ``(start, length)`` — pinned by
  test/tokenizer_test.exs:10-17 ("man" -> start 4, "end" 3);
* numbers are stringified then tokenized (tokenizer.ex:10-14).

The default separator is ``[\\s\\-]+`` (tokenizer.ex:4).

``ascii_mode`` (default True) pins regex classes to ASCII for reference
parity; ``ascii_mode=False`` is the opt-in Unicode deviation
(AnalyzerConfig(unicode=True)) where ``\\s``/``\\w`` classes follow
Unicode — real transcripts are Unicode, the reference is not.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Union

from .token import Token

DEFAULT_SEPARATOR = r"[\s\-]+"

_FAST = {}  # (separator, ascii_mode) -> compiled "non-separator run" regex


def _run_regex(separator: str, ascii_mode: bool = True) -> re.Pattern:
    """Compile a regex matching maximal runs of non-separator chars.

    Because the reference tests the separator per-character, the set of
    separator chars is exactly {c : separator matches somewhere in "c"}.
    For the common character-class patterns we can derive the complement
    class directly; for arbitrary patterns we fall back to a per-char scan.
    """
    key = (separator, ascii_mode)
    pat = _FAST.get(key)
    if pat is None:
        m = re.fullmatch(r"\[([^\]]*)\]\+?", separator)
        if m:
            # re.ASCII: the reference's Elixir regexes are PCRE without
            # the `u` flag, so \s/\w classes are ASCII-only
            flags = re.ASCII if ascii_mode else 0
            pat = re.compile(r"[^" + m.group(1) + r"]+", flags)
        else:
            pat = None
        _FAST[key] = pat if pat is not None else False
        return _run_regex(separator, ascii_mode) if pat is not None else None
    return pat or None


def tokenize(
    content: Union[str, int, float], separator: str = DEFAULT_SEPARATOR,
    ascii_mode: bool = True,
) -> List[Token]:
    if not isinstance(content, str):
        if isinstance(content, float) and content.is_integer():
            content = repr(content)
        else:
            content = str(content)
    s = content.lower()
    run = _run_regex(separator, ascii_mode)
    if run is not None:
        return [Token(m.group(0), m.start(), m.end() - m.start()) for m in run.finditer(s)]
    # generic fallback: per-character separator test (reference semantics)
    sep = re.compile(separator, re.ASCII if ascii_mode else 0)
    tokens: List[Token] = []
    start = None
    for i, ch in enumerate(s):
        if sep.search(ch):
            if start is not None:
                tokens.append(Token(s[start:i], start, i - start))
                start = None
        elif start is None:
            start = i
    if start is not None:
        tokens.append(Token(s[start:], start, len(s) - start))
    return tokens


def tokenize_raw(
    content: Union[str, int, float], separator: str = DEFAULT_SEPARATOR,
    ascii_mode: bool = True,
) -> List[tuple]:
    """``(token, start, length)`` PLAIN tuples — the allocation-light
    twin of ``tokenize`` for the bulk analyzer (NamedTuple construction
    is a measurable share of ingest CPU at corpus scale). Identical
    values; exotic separators fall back through ``tokenize``."""
    if not isinstance(content, str):
        if isinstance(content, float) and content.is_integer():
            content = repr(content)
        else:
            content = str(content)
    s = content.lower()
    run = _run_regex(separator, ascii_mode)
    if run is not None:
        return [(m.group(0), m.start(), m.end() - m.start())
                for m in run.finditer(s)]
    return [(t.token, t.start, t.length)
            for t in tokenize(content, separator, ascii_mode)]


def tokenize_terms(content: Union[str, int, float], separator: str = DEFAULT_SEPARATOR) -> List[str]:
    """Terms only (no positions) — cheaper hot path for stats-only callers."""
    return [t.token for t in tokenize(content, separator)]
