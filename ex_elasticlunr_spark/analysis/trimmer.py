"""Trimmer: strip leading ``^\\W+`` and trailing ``\\W+$`` from a token.

Reference: lib/elasticlunr/pipeline/trimmer.ex:7-12. Note the result may
be the empty string (e.g. a token made only of punctuation) — the
reference does NOT drop empty tokens at this stage (Pipeline filters only
nil), so neither do we.

Goldens (test/pipeline/trimmer_test.exs:22-31): ``hello.``->``hello``,
``it's``->``it's``, ``james'``->``james``, ``stop!'``->``stop``,
``[[[tag]]]``->``tag``, ``~!@@@hello***()()()]]``->``hello``.
"""

from __future__ import annotations

import re

from .token import Token

# re.ASCII: Elixir ~r/\W/ without the `u` flag is PCRE ASCII-only, so
# e.g. "über." trims to "ber" in the reference — parity over prettiness.
# ascii_mode=False (AnalyzerConfig(unicode=True)) is the opt-in Unicode
# deviation where \W follows Unicode word characters.
_LEAD = re.compile(r"^\W+", re.ASCII)
_TRAIL = re.compile(r"\W+$", re.ASCII)
_LEAD_U = re.compile(r"^\W+")
_TRAIL_U = re.compile(r"\W+$")

# fast-path predicate: a token whose FIRST and LAST characters are word
# characters cannot match ^\W+ or \W+$ in either regex mode (ascii word
# chars are word chars under unicode \w too), so the two regex passes —
# the bulk-ingest trim cost for the overwhelmingly common clean token —
# can be skipped entirely
_WORD = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def trim_str(s: str, ascii_mode: bool = True) -> str:
    if s and s[0] in _WORD and s[-1] in _WORD:
        return s
    if ascii_mode:
        return _TRAIL.sub("", _LEAD.sub("", s))
    return _TRAIL_U.sub("", _LEAD_U.sub("", s))


def trim(token: Token, ascii_mode: bool = True) -> Token:
    return token.with_token(trim_str(token.token, ascii_mode))
