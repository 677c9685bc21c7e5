"""English stop-word filter.

The 119-word list is copied verbatim from the reference
(lib/elasticlunr/pipeline/stop_word_filter.ex:6-126) — data parity is
required for identical df/idf. Filtering is exact membership on the
already-downcased token (stop_word_filter.ex:128-130).

Embedded as a literal (not a data file) so the package works from a
--py-files zip on a cluster; tests/fixtures/stop_words.json pins the
same list for the test suite (tests/test_analysis.py cross-checks).
"""

from __future__ import annotations

from typing import FrozenSet

STOP_WORDS: FrozenSet[str] = frozenset((
    "a", "able", "about", "across", "after", "all", "almost",
    "also", "am", "among", "an", "and", "any", "are",
    "as", "at", "be", "because", "been", "but", "by",
    "can", "cannot", "could", "dear", "did", "do", "does",
    "either", "else", "ever", "every", "for", "from", "get",
    "got", "had", "has", "have", "he", "her", "hers",
    "him", "his", "how", "however", "i", "if", "in",
    "into", "is", "it", "its", "just", "least", "let",
    "like", "likely", "may", "me", "might", "most", "must",
    "my", "neither", "no", "nor", "not", "of", "off",
    "often", "on", "only", "or", "other", "our", "own",
    "rather", "said", "say", "says", "she", "should", "since",
    "so", "some", "than", "that", "the", "their", "them",
    "then", "there", "these", "they", "this", "tis", "to",
    "too", "twas", "us", "wants", "was", "we", "were",
    "what", "when", "where", "which", "while", "who", "whom",
    "why", "will", "with", "would", "yet", "you", "your",
))


def is_stop_word(term: str) -> bool:
    return term in STOP_WORDS
