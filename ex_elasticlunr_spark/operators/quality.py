"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (whole-stage codegen; no UDFs), so every
operator has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..analysis.stop_words import STOP_WORDS
from .dedup import normalized

_STOP_ARR = sorted(STOP_WORDS)


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "docid") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate.

    ws_tokens:  whitespace-delimited tokens
    word_tokens: alphanumeric runs (regexp) — punctuation-insensitive
    bpe_est:   ceil(chars/4) heuristic subword count (common rule of
               thumb for byte-pair encodings)
    """
    norm = normalized(F.col(text_col))
    return df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(r"[a-z0-9]+"), 0))
        .cast("long").alias("word_tokens"),
        F.ceil(F.length(norm) / F.lit(4.0)).cast("long").alias("bpe_est"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "docid") -> DataFrame:
    """Heuristic quality features + composite score in [0,1]:

      len_score      = least(chars/500, 1)             (length prior)
      punct_ratio    = non-alnum-non-space chars / chars
      stop_ratio     = stopword tokens / tokens        (English prior)
      mean_word_len  = chars-in-words / words
      quality        = 0.4*len + 0.3*(1-punct) + 0.3*least(2*stop, 1)
    """
    norm = normalized(F.col(text_col))
    words = F.split(norm, " ")
    nwords = F.greatest(F.size(words), F.lit(1))
    # count stopword OCCURRENCES (array_intersect would dedup)
    stop_occ = F.size(F.filter(words, lambda w: w.isin(_STOP_ARR)))
    chars = F.greatest(F.length(norm), F.lit(1))
    punct = F.length(F.regexp_replace(norm, r"[a-z0-9 ]", ""))
    word_chars = F.length(F.regexp_replace(norm, r" ", ""))
    return df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.round(F.least(F.length(norm) / F.lit(500.0), F.lit(1.0)), 6).alias("len_score"),
        F.round(punct / chars, 6).alias("punct_ratio"),
        F.round(stop_occ / nwords, 6).alias("stop_ratio"),
        F.round(word_chars / nwords, 6).alias("mean_word_len"),
        F.round(
            F.lit(0.4) * F.least(F.length(norm) / F.lit(500.0), F.lit(1.0))
            + F.lit(0.3) * (F.lit(1.0) - punct / chars)
            + F.lit(0.3) * F.least(F.lit(2.0) * stop_occ / nwords, F.lit(1.0)),
            6,
        ).alias("quality"),
    )


# minimal per-language marker profiles (function words + diacritics) for
# the n-gram/marker heuristic; deterministic and SQL-portable
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "que", "de"],
    "fr": ["le", "les", "des", "est", "une"],
    "de": ["der", "die", "das", "und", "ist"],
}


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "docid") -> DataFrame:
    """Marker-word language heuristic: score(lang) = matched marker
    occurrences / tokens; prediction = argmax (ties -> lexicographic
    lang); 'und' (undetermined) when no marker matches."""
    norm = normalized(F.col(text_col))
    words = F.split(norm, " ")
    nwords = F.greatest(F.size(words), F.lit(1))
    scores = [
        F.round(
            F.size(F.filter(words, lambda w: w.isin(markers))) / nwords, 6
        ).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    out = df.select(F.col(id_col).cast("string").alias("docid"), norm.alias("_n"), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:  # first (lexicographic) argmax wins
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return out.select(
        "docid", *[f"score_{l}" for l in langs], pred.alias("pred_lang")
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "docid") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (the classic 'fingerprint' dedup key), plus the
    exact-content hash."""
    norm = normalized(F.col(text_col))
    sorted_toks = F.array_join(
        F.array_sort(F.array_distinct(F.split(norm, " "))), " "
    )
    return df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.md5(norm).alias("content_hash"),
        F.md5(sorted_toks).alias("fingerprint"),
    )


def winnow_fingerprints(df: DataFrame, k: int = 8, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "docid") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    'Winnowing: Local Algorithms for Document Fingerprinting', SIGMOD
    2003 — the MOSS algorithm): hash every k-gram of the normalized
    text, slide a window over ``w`` consecutive k-gram hashes, keep
    each window's minimum (rightmost position on ties), and emit the
    distinct selected hashes per document. Any substring match of
    length >= w + k - 1 guarantees a shared fingerprint — the standard
    near-dup / provenance primitive at corpus scale.

    Definition details (shared with the SQL oracle): windows are
    anchored at every gram position and truncated at the document tail;
    the k-gram hash is the first 8 hex chars of md5 (engine-portable);
    the rightmost-min tie-break uses the combined key
    h * 2^20 + (2^20 - 1 - pos), so positions must be < 2^20 (1M-char
    documents; the normalizer caps far below that here).

    Shape: the k-gram explode is map-side; the only shuffles are the
    per-document window (partitioned by docid — skew-free and
    document-bounded) and the distinct.
    """
    from pyspark.sql import Window

    norm = normalized(F.col(text_col))
    grams = F.expr(
        "transform(sequence(1, greatest(length(trim(regexp_replace("
        f"lower({text_col}), '\\\\s+', ' '))) - {k - 1}, 1)), "
        "i -> substring(trim(regexp_replace("
        f"lower({text_col}), '\\\\s+', ' ')), i, {k}))"
    )
    g = (
        df.select(F.col(id_col).cast("string").alias("docid"),
                  F.posexplode(grams).alias("pos", "gram"))
        .withColumn(
            "h",
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long"))
        .withColumn(
            "key",
            F.col("h") * F.lit(1 << 20)
            + (F.lit((1 << 20) - 1) - F.col("pos")))
    )
    win = (Window.partitionBy("docid").orderBy("pos")
           .rowsBetween(0, w - 1))
    sel = g.withColumn("sel_key", F.min("key").over(win))
    return (
        sel.select(
            "docid",
            (F.col("sel_key") / F.lit(1 << 20)).cast("long").alias("fp"))
        .distinct()
    )


# identical pattern strings run on both engines: Java regex (Spark) and
# RE2 (DuckDB) — keep to the common subset (no backrefs, no lookaround)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "docid") -> DataFrame:
    """Redact common PII shapes (emails, IPv4s, phone-shaped numbers)
    -> (docid, scrubbed, n_email, n_ipv4, n_phone).

    A standard training-data hygiene pass. Pure column expressions
    (regexp_count + chained regexp_replace, whole-stage codegen): at
    100 TB this is a map-only scan with no shuffle at all. Counts are
    measured on the ORIGINAL text; replacements apply in PII_PATTERNS
    order (emails first so their host parts are gone before the looser
    numeric patterns run).
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat))
                      .cast("long").alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(
        F.col(id_col).cast("string").alias("docid"),
        scrubbed.alias("scrubbed"),
        *counts,
    )
