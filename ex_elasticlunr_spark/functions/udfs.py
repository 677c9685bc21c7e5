"""Vectorized (Arrow/pandas) UDFs — the only place Python touches row
data inside the engine; everything else is built-in Column expressions.

Per the north rule ("no per-row Python anywhere" at the Spark row level):
analysis runs batched inside pandas UDFs — one Python call per Arrow
batch, with stemming amortized over the batch's *unique* tokens
(each unique token stemmed once, then mapped), mirroring how the
reference amortizes nothing (it stems token-at-a-time,
lib/elasticlunr/pipeline/stemmer.ex:7-9) — this is one of the places a
vectorized rebuild wins.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..analysis import Pipeline, Token
from ..analysis import porter2
from ..analysis.stop_words import STOP_WORDS
from ..analysis.tokenizer import DEFAULT_SEPARATOR, tokenize
from ..analysis.trimmer import trim_str

TOKEN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType()),
            StructField("start", IntegerType()),
            StructField("length", IntegerType()),
        ]
    )
)

TERMS_SCHEMA = ArrayType(StringType())


class AnalyzerConfig:
    """Serializable analyzer description shipped to executors.

    ``stages`` is a subset/ordering of ("trim", "stop", "stem") — the
    default mirrors the reference's default_runners
    (lib/elasticlunr/pipeline.ex:24-25). ``extra`` allows user callbacks
    (must be picklable) with the reference's Token->Token|list|None
    protocol, applied after the named stages.
    """

    def __init__(
        self,
        stages: tuple = ("trim", "stop", "stem"),
        separator: str = DEFAULT_SEPARATOR,
        extra: Optional[list] = None,
    ):
        self.stages = tuple(stages)
        self.separator = separator
        self.extra = list(extra or [])

    def to_pipeline(self) -> Pipeline:
        """Equivalent driver-side Pipeline (used to analyze query strings)."""
        from ..analysis.pipeline import stemmer, stop_word_filter, trimmer

        named = {"trim": trimmer, "stop": stop_word_filter, "stem": stemmer}
        cbs = [named[s] for s in self.stages] + self.extra
        return Pipeline(cbs, self.separator)

    # -- batch-vectorized execution (executor side) ----------------------
    def analyze_batch(self, texts: pd.Series, positions: bool) -> pd.Series:
        do_trim = "trim" in self.stages
        do_stop = "stop" in self.stages
        do_stem = "stem" in self.stages
        stem_cache: dict = {}

        def stem1(t: str) -> str:
            s = stem_cache.get(t)
            if s is None:
                s = porter2.stem(t)
                stem_cache[t] = s
            return s

        extra = self.extra
        sep = self.separator

        def one(text) -> list:
            if text is None:
                return []
            toks = tokenize(text, sep)
            if do_trim:
                toks = [Token(trim_str(t.token), t.start, t.length) for t in toks]
            if do_stop:
                toks = [t for t in toks if t.token not in STOP_WORDS]
            if do_stem:
                toks = [Token(stem1(t.token), t.start, t.length) for t in toks]
            for cb in extra:
                out: List[Token] = []
                for t in toks:
                    r = cb(t)
                    if r is None:
                        continue
                    out.extend(r if isinstance(r, list) else [r])
                toks = out
            if positions:
                return [(t.token, t.start, t.length) for t in toks]
            return [t.token for t in toks]

        return texts.map(one)


def analyze_udf(config: Optional[AnalyzerConfig] = None, positions: bool = True):
    """Column function: text -> array<struct<term,start,length>> (or
    array<string> when positions=False)."""
    config = config or AnalyzerConfig()
    schema = TOKEN_SCHEMA if positions else TERMS_SCHEMA

    @F.pandas_udf(schema)
    def _analyze(texts: pd.Series) -> pd.Series:
        return config.analyze_batch(texts, positions)

    return _analyze
