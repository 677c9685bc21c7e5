"""Token value type.

Mirrors the reference's ``%Token{token, metadata}`` where metadata is
``%{start, end}`` and — counter-intuitively — ``end`` is the token
*length*, not the end offset (reference: lib/elasticlunr/tokenizer.ex:61-66,
pinned by test/tokenizer_test.exs:10-17: "man" at %{start: 4, end: 3}).
We call the second element ``length`` to avoid the trap.
"""

from __future__ import annotations

from typing import NamedTuple


class Token(NamedTuple):
    token: str
    start: int = 0
    length: int = 0

    def with_token(self, token: str) -> "Token":
        return self._replace(token=token)
