"""English stop-word filter.

The 119-word list is copied verbatim from the reference
(lib/elasticlunr/pipeline/stop_word_filter.ex:6-126) — data parity is
required for identical df/idf. Filtering is exact membership on the
already-downcased token (stop_word_filter.ex:128-130).
"""

from __future__ import annotations

import json
import os
from typing import FrozenSet

_HERE = os.path.dirname(__file__)

STOP_WORDS: FrozenSet[str] = frozenset(
    json.load(open(os.path.join(_HERE, "stop_words.json")))
)


def is_stop_word(term: str) -> bool:
    return term in STOP_WORDS
