from .pipeline import (
    DEFAULT_RUNNERS,
    ID_PIPELINE,
    Pipeline,
    id_pipeline_callback,
    stemmer,
    stop_word_filter,
    trimmer,
)
from .porter2 import stem
from .stop_words import STOP_WORDS, is_stop_word
from .token import Token
from .tokenizer import DEFAULT_SEPARATOR, tokenize, tokenize_terms
from .trimmer import trim, trim_str

__all__ = [
    "DEFAULT_RUNNERS", "ID_PIPELINE", "Pipeline", "id_pipeline_callback",
    "stemmer", "stop_word_filter", "trimmer", "stem", "STOP_WORDS",
    "is_stop_word", "Token", "DEFAULT_SEPARATOR", "tokenize",
    "tokenize_terms", "trim", "trim_str",
]
