"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (whole-stage codegen; no UDFs), so every
operator has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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
    # normalized() once through an intermediate Project: the lambda-free
    # outputs still can't share subexpressions with the others in one
    # interpreted Project, and CollapseProject keeps the split because
    # the regexp chain is non-cheap (guide §4 — the same value was
    # being recomputed 3x per row)
    norm_df = df.select(F.col(id_col).cast("string").alias("docid"),
                        normalized(F.col(text_col)).alias("_norm"))
    norm = F.col("_norm")
    return norm_df.select(
        "docid",
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(r"[a-z0-9]+"), 0))
        .cast("long").alias("word_tokens"),
        F.ceil(F.length(norm) / F.lit(4.0)).cast("long").alias("bpe_est"),
    )


def chunk_documents(df: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "docid") -> DataFrame:
    """Fixed token-window chunking with overlap — the standard
    training-data prep step (context-window packing, embedding input).

    One output row per chunk: (docid, chunk_idx, n_tokens, chunk).
    Windows start at multiples of ``chunk_tokens - overlap``; a trailing
    window is emitted only if it contains at least one token not
    already covered by the previous window (start + overlap < n), and
    the final chunk keeps the short tail.

    Pure column expressions, map-only (no shuffle): per-document
    boundaries make this embarrassingly parallel at any corpus size;
    skew is bounded by max document length, not corpus size.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    norm = normalized(F.col(text_col))
    base = df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.split(norm, " ").alias("toks"),
    ).where(F.col(text_col).isNotNull() & (F.size("toks") > 0)
            & (F.element_at("toks", 1) != ""))
    n = F.size("toks")
    starts = F.sequence(F.lit(0), n - 1, F.lit(step))
    return (
        base.select("docid", "toks",
                    F.posexplode(starts).alias("chunk_idx", "start"))
        .where((F.col("start") == 0)
               | (F.col("start") + F.lit(overlap) < F.size("toks")))
        .select(
            "docid",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(F.lit(chunk_tokens), F.size("toks") - F.col("start"))
            .cast("long").alias("n_tokens"),
            F.array_join(
                F.slice("toks", F.col("start") + 1, F.lit(chunk_tokens)),
                " ").alias("chunk"),
        )
    )


def data_split(df: DataFrame, val_frac: float = 0.1,
               seed: str = "split-v1", id_col: str = "docid") -> DataFrame:
    """Deterministic train/validation assignment by id hash — the
    reproducible alternative to random sampling for dataset curation:
    the same (docid, seed) always lands in the same split, regardless
    of partitioning, cluster size, or row order.

    split = 'val' iff md5(docid || seed)[:8] as int mod 10^6 is below
    val_frac * 10^6. Map-only (no shuffle); exact SQL oracle via the
    same hash.
    """
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))),
        1, 8), 16, 10).cast("long") % F.lit(1000000)
    return df.select(
        F.col(id_col).cast("string").alias("docid"),
        bucket.cast("long").alias("bucket"),
        F.when(bucket < F.lit(int(val_frac * 1000000)), F.lit("val"))
        .otherwise(F.lit("train")).alias("split"),
    )


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "docid") -> DataFrame:
    """Corpus-unigram language-model score — the distributed stand-in
    for the perplexity filter of LLM data pipelines (CCNet/Gopher use a
    KenLM; with no model artifact available, the corpus's own unigram
    distribution is the deterministic, self-contained equivalent).

    P(w) = count(w) / total_tokens over the WHOLE corpus;
    avg_logprob = mean over the doc's tokens of log10 P(w);
    lower (more negative) = more surprising under the corpus unigram
    model. Docs with no tokens are dropped.

    Shape: one vocabulary-sized aggregation (map-side combined) + one
    token->vocab join keyed on the token string. Hot tokens skew the
    join input but Spark's hash join over a (term, logp) table that is
    MUCH smaller than the exploded tokens handles it; at 100 TB the
    vocab side can be broadcast when it fits, else it is a standard
    large-large hash join.
    """
    norm = normalized(F.col(text_col))
    toks = df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.explode(F.split(norm, " ")).alias("tok"),
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    lp = freq.crossJoin(F.broadcast(total)).select(
        "tok", F.log10(F.col("c") / F.col("t")).alias("logp"))
    return (
        toks.join(lp, "tok")
        .groupBy("docid")
        .agg(F.round(F.avg("logp"), 6).alias("avg_logprob"),
             F.count(F.lit(1)).alias("n_tokens"))
    )


def pack_chunks(chunks: DataFrame, window_tokens: int = 128,
                n_buckets: int = 64) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget packs (the
    training step that concatenates short sequences into full context
    windows). Deterministic cumulative-sum packing within hash buckets:

      bucket  = md5(docid)[:8] as int mod n_buckets (parallelism unit)
      order   = (docid, chunk_idx) within bucket    (stable)
      pack_id = floor((cumsum(n_tokens) - n_tokens) / window_tokens)

    A pack may overflow window_tokens by at most one chunk (the
    standard greedy packing tolerance — exact bin packing is NP-hard
    and order-dependent); packs never cross buckets, so the job scales
    by adding buckets. One shuffle (the window partition), exact SQL
    oracle via SUM() OVER.
    """
    w = Window.partitionBy("bucket").orderBy("docid", "chunk_idx")
    return (
        chunks.withColumn(
            "bucket",
            (F.conv(F.substring(F.md5("docid"), 1, 8), 16, 10)
             .cast("long") % n_buckets).cast("long"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "docid", "chunk_idx", "n_tokens", "bucket",
            F.floor((F.col("cum") - F.col("n_tokens"))
                    / F.lit(window_tokens)).cast("long").alias("pack_id"),
        )
    )


def extract_code_blocks(df: DataFrame, text_col: str = "text",
                        id_col: str = "docid") -> DataFrame:
    """Fenced code-block extraction (``` lang ... ```) — the
    code/markdown separation step of transcript curation. One output
    row per block: (docid, block_idx, lang, code); documents without
    fences produce no rows. Map-only regexp scan, no shuffle; the
    pattern is RE2-compatible so the DuckDB oracle runs it verbatim.
    """
    pat = r"(?s)```([a-zA-Z0-9_+-]*)\r?\n(.*?)```"
    blocks = F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
    return (
        df.select(F.col(id_col).cast("string").alias("docid"),
                  F.posexplode(blocks).alias("block_idx", "block"))
        .select(
            "docid",
            F.col("block_idx").cast("long").alias("block_idx"),
            F.regexp_extract("block", pat, 1).alias("lang"),
            F.regexp_extract("block", pat, 2).alias("code"),
        )
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
    # Two-stage Project with exact INTEGER intermediates: the single
    # interpreted Project (HOF lambdas block codegen and its
    # subexpression elimination) recomputed normalized() ~8x, split ~4x
    # and the stopword InSet filter 2x per row. All intermediates are
    # ints, so the final arithmetic below is literally the same
    # double-expression tree as before — results bit-identical
    # (CollapseProject keeps the stages split: the shared expressions
    # are non-cheap).
    norm_df = df.select(F.col(id_col).cast("string").alias("docid"),
                        normalized(F.col(text_col)).alias("_norm"))
    norm = F.col("_norm")
    words = F.split(norm, " ")
    ints = norm_df.select(
        "docid",
        F.length(norm).alias("_len"),
        F.greatest(F.size(words), F.lit(1)).alias("_nw"),
        # count stopword OCCURRENCES (array_intersect would dedup)
        F.size(F.filter(words, lambda w: w.isin(_STOP_ARR))).alias("_stop"),
        F.length(F.regexp_replace(norm, r"[a-z0-9 ]", "")).alias("_punct"),
        F.length(F.regexp_replace(norm, r" ", "")).alias("_wchars"),
    )
    chars = F.greatest(F.col("_len"), F.lit(1))
    return ints.select(
        "docid",
        F.round(F.least(F.col("_len") / F.lit(500.0), F.lit(1.0)), 6).alias("len_score"),
        F.round(F.col("_punct") / chars, 6).alias("punct_ratio"),
        F.round(F.col("_stop") / F.col("_nw"), 6).alias("stop_ratio"),
        F.round(F.col("_wchars") / F.col("_nw"), 6).alias("mean_word_len"),
        F.round(
            F.lit(0.4) * F.least(F.col("_len") / F.lit(500.0), F.lit(1.0))
            + F.lit(0.3) * (F.lit(1.0) - F.col("_punct") / chars)
            + F.lit(0.3) * F.least(
                F.lit(2.0) * F.col("_stop") / F.col("_nw"), F.lit(1.0)),
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
    # split once through an intermediate Project (the per-language
    # marker filters each recomputed normalize+split in the single
    # interpreted Project — see quality_scores); counts and nwords are
    # ints, so the rounded ratios below are bit-identical
    base = df.select(F.col(id_col).cast("string").alias("docid"),
                     F.split(normalized(F.col(text_col)), " ")
                     .alias("_words"))
    words = F.col("_words")
    nwords = F.greatest(F.size(words), F.lit(1))
    scores = [
        F.round(
            F.size(F.filter(words, lambda w: w.isin(markers))) / nwords, 6
        ).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    out = base.select("docid", *scores)
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
    # materialize the normalized text ONCE per row before the k-gram
    # transform: an expression inside a higher-order-function lambda is
    # re-evaluated PER ELEMENT, so inlining the normalize chain into
    # the substring lambda cost O(len^2) regex work per document
    base = df.select(F.col(id_col).cast("string").alias("docid"),
                     normalized(F.col(text_col)).alias("_norm"))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 1)), "
        f"i -> substring(_norm, i, {k}))"
    )
    g = (
        base.select("docid", F.posexplode(grams).alias("pos", "gram"))
        .withColumn(
            "h",
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long"))
        .withColumn(
            "key",
            # rightmost-position tie-break packed under the hash; pos is
            # CLAMPED to the 20-bit field so a >1M-char document cannot
            # underflow the packing and decode to a corrupted hash —
            # beyond the clamp the tie-break degrades to "any of the
            # equal-hash grams" (the fingerprint value stays exact)
            F.col("h") * F.lit(1 << 20)
            + (F.lit((1 << 20) - 1)
               - F.least(F.col("pos"), F.lit((1 << 20) - 1))))
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


def _token_ngrams(toks, n: int):
    """``array<string>`` of space-joined token n-grams (empty when the
    document has fewer than ``n`` tokens). Pure SQL transform — the
    per-document work is linear in tokens."""
    nt = F.size(toks)
    return F.when(
        nt >= n,
        F.transform(
            F.sequence(F.lit(1), nt - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratios(df: DataFrame, text_col: str = "text",
                      id_col: str = "docid") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al.,
    'Scaling Language Models: ... Gopher', 2021, §A1.1 repetition
    filters) -> one row per document:

      n_tokens        whitespace tokens
      dup_2gram_frac  1 - distinct 2-grams / total 2-grams
      dup_5gram_frac  1 - distinct 5-grams / total 5-grams
      top_2gram_frac  tokens covered by the most frequent 2-gram / tokens
                      (occurrences*2/n_tokens clamped to 1.0 — overlapping
                      repeats like "a a a a" would otherwise exceed 1)

    Shape at 100 TB: one explode per n, then a two-level aggregation
    (docid,gram) -> (docid) — both partial-agg (map-side combine)
    friendly, keys are document-bounded so skew is bounded by document
    length, and there is no per-document quadratic work (the naive
    transform/filter counting of the most frequent gram is O(len^2) and
    would die on 10k-token documents).
    """
    # ONE pass: tokens materialized before the n-gram lambdas
    # (expressions inside HOF lambdas re-evaluate per element — the
    # inline split made each n-gram re-split the whole document), then
    # BOTH gram sizes ride one tagged explode and one two-level
    # conditional aggregation. The previous shape consumed `base` three
    # times (two explode→agg pipelines + the n_tokens join), paying the
    # tokenize+transform work 3x and two extra joins; explode_outer
    # keeps gram-less docs alive (their t2/t5 aggregate to NULL —
    # exactly the old left-join NULLs, so the final expressions are
    # unchanged).
    pre = df.select(
        F.col(id_col).cast("string").alias("docid"),
        normalized(F.col(text_col)).alias("_norm"),
    ).select("docid", "_norm", F.split("_norm", " ").alias("_toks"))
    toks = F.col("_toks")
    base = pre.select(
        "docid",
        F.when(F.col("_norm") == "", F.lit(0)).otherwise(F.size(toks))
        .cast("long").alias("n_tokens"),
        _token_ngrams(toks, 2).alias("g2"),
        _token_ngrams(toks, 5).alias("g5"),
    )
    tagged = base.select(
        "docid", "n_tokens",
        F.explode_outer(F.concat(
            F.transform("g2", lambda x: F.struct(
                F.lit(2).alias("n"), x.alias("gram"))),
            F.transform("g5", lambda x: F.struct(
                F.lit(5).alias("n"), x.alias("gram"))),
        )).alias("g"),
    )
    per_gram = (
        tagged.groupBy("docid", "n_tokens",
                       F.col("g.n").alias("n"),
                       F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n2 = F.col("n") == 2
    n5 = F.col("n") == 5
    out = per_gram.groupBy("docid", "n_tokens").agg(
        F.sum(F.when(n2, F.col("cnt"))).alias("t2"),
        F.count(F.when(n2, F.lit(1))).alias("d2"),
        F.max(F.when(n2, F.col("cnt"))).alias("top"),
        F.sum(F.when(n5, F.col("cnt"))).alias("t5"),
        F.count(F.when(n5, F.lit(1))).alias("d5"),
    )
    dup2 = F.when(F.col("t2") > 0,
                  F.round(F.lit(1.0) - F.col("d2") / F.col("t2"), 6)) \
        .otherwise(F.lit(0.0))
    dup5 = F.when(F.col("t5") > 0,
                  F.round(F.lit(1.0) - F.col("d5") / F.col("t5"), 6)) \
        .otherwise(F.lit(0.0))
    top2 = F.when(
        (F.col("n_tokens") > 0) & F.col("top").isNotNull(),
        F.least(F.round(F.col("top") * F.lit(2.0) / F.col("n_tokens"), 6),
                F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    return out.select(
        "docid", "n_tokens",
        dup2.alias("dup_2gram_frac"),
        dup5.alias("dup_5gram_frac"),
        top2.alias("top_2gram_frac"),
    )


def boilerplate_ngrams(df: DataFrame, n: int = 4, min_docs: int = 50,
                       text_col: str = "text",
                       id_col: str = "docid") -> DataFrame:
    """Cross-document boilerplate detection (the CCNet/RefinedWeb-style
    repeated-passage signal): a token n-gram is *boilerplate* when it
    appears in >= ``min_docs`` distinct documents; per document report

      n_grams      distinct n-grams in the document
      boiler_grams how many of them are boilerplate
      boiler_frac  boiler_grams / n_grams (0 for gram-less docs)

    Shape at 100 TB: per-doc DISTINCT n-grams (array_distinct, map-side)
    -> explode -> groupBy(gram) doc-count (partial-agg; gram keys are
    hash-uniform) -> gram-keyed join back (large-large hash join, no
    broadcast assumption) -> per-doc aggregation. No driver-side state;
    ``min_docs`` is an absolute threshold so the operator composes with
    incremental corpora without re-reading the world.
    """
    # tokens materialized once before the n-gram lambda (see
    # repetition_ratios — per-element re-evaluation inside HOF lambdas)
    pre = df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.split(normalized(F.col(text_col)), " ").alias("_toks"),
    )
    per_doc = pre.select(
        "docid",
        F.explode_outer(
            F.array_distinct(_token_ngrams(F.col("_toks"), n)))
        .alias("gram"),
    )
    doc_counts = (
        per_doc.where(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    joined = per_doc.join(doc_counts, "gram", "left")
    return (
        joined.groupBy("docid")
        .agg(
            F.count("gram").alias("n_grams"),
            F.sum(
                F.when(F.col("doc_count") >= min_docs, 1).otherwise(0)
            ).cast("long").alias("boiler_grams"),
        )
        .select(
            "docid",
            "n_grams",
            "boiler_grams",
            F.when(F.col("n_grams") > 0,
                   F.round(F.col("boiler_grams") / F.col("n_grams"), 6))
            .otherwise(F.lit(0.0)).alias("boiler_frac"),
        )
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


def _word_ngrams_arr(words, n: int):
    """Distinct word n-grams over an ALREADY-materialized words column
    (pass a bound column, not a split(...) expression — expressions
    inside the slice lambda re-evaluate per element)."""
    k = F.size(words) - F.lit(n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(words, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_ngrams(col, n: int):
    """Distinct word n-grams of a normalized text column (array<string>;
    empty when the doc has fewer than n words). Pure Column expression.
    Prefer materializing the split through a Project and calling
    ``_word_ngrams_arr`` (see contamination) on hot paths."""
    return _word_ngrams_arr(F.split(normalized(col), " "), n)


def contamination(df: DataFrame, eval_df: DataFrame, n: int = 8,
                  text_col: str = "text", eval_text_col: str = "text",
                  id_col: str = "docid",
                  threshold: float = 0.1) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-grams overlap an evaluation set (the standard 8-13-gram overlap
    check LLM pipelines run before training, e.g. GPT-3 appendix C /
    PaLM's 'data contamination' audit — public methodology).

    Per document: ``n_grams`` (distinct n-grams), ``n_hits`` (of those,
    how many appear anywhere in the eval set), ``frac`` = hits/grams,
    and ``contaminated`` = frac > threshold. Documents with fewer than
    ``n`` words carry 0 grams and are never contaminated.

    Scale shape (100 TB corpus, benchmark-sized eval set): the eval
    n-gram dictionary is DISTINCT'd then BROADCAST, so the corpus pass
    is map-only — explode distinct grams, hash-probe the broadcast set,
    one per-doc re-aggregation keyed on the already-partitioned docid.
    No corpus-sized shuffle. If the eval set outgrows broadcast
    (hundreds of millions of grams), drop the broadcast hint and the
    same plan becomes a standard large-large hash join.
    """
    ev = (eval_df.select(
            F.split(normalized(F.col(eval_text_col)), " ").alias("_w"))
          .select(F.explode(_word_ngrams_arr(F.col("_w"), n)).alias("g"))
          .distinct())
    grams = df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.split(normalized(F.col(text_col)), " ").alias("_w"),
    ).select("docid", _word_ngrams_arr(F.col("_w"), n).alias("gs"))
    exploded = grams.select(
        "docid", F.explode_outer("gs").alias("g"),
        F.size("gs").alias("n_grams"))
    hit = exploded.join(
        F.broadcast(ev.withColumn("_hit", F.lit(1))), "g", "left")
    return (
        hit.groupBy("docid")
        .agg(F.first("n_grams").alias("n_grams"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"))
        .withColumn(
            "frac",
            F.when(F.col("n_grams") > 0,
                   F.round(F.col("n_hits") / F.col("n_grams"), 6))
            .otherwise(F.lit(0.0)))
        .withColumn("contaminated", F.col("frac") > F.lit(threshold))
    )


def sample_sources(df: DataFrame, rates: dict, source_col: str = "source",
                   default_rate: float = 1.0, seed: str = "mix-v1",
                   id_col: str = "docid") -> DataFrame:
    """Deterministic per-source downsampling — the domain-mixing step of
    training-data curation (keep x% of crawl, 100% of curated sources).

    Keep iff md5(docid || seed)[:8] mod 10^6 < rate(source) * 10^6 —
    the same id-hash discipline as ``data_split``: reproducible across
    partitioning, cluster size, and row order, and SQL-expressible for
    the oracle. Map-only (the rate table rides along as a literal
    when-chain; no join, no shuffle) — at 100 TB this is a pure scan.
    """
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))),
        1, 8), 16, 10).cast("long") % F.lit(1000000)
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))) \
            .otherwise(rate)
    return df.where(bucket < (rate * F.lit(1000000)).cast("long"))


def importance_sample(df: DataFrame, weight_col: str,
                      seed: str = "imp-v1",
                      id_col: str = "docid") -> DataFrame:
    """Quality-weighted Bernoulli sampling: keep each row with
    probability ``clamp(weight, 0, 1)`` — the importance-resampling
    step that upsamples high-quality documents into a training mix
    (pair with ``quality_scores``: weight = the quality column).

    Deterministic: the coin is md5(docid || seed), NOT rand() — the
    same id-hash discipline as data_split/sample_sources, so the
    sampled corpus is reproducible across partitioning, cluster size,
    retries, and engines (the SQL oracle draws identical coins).
    Map-only: a pure scan at any scale.
    """
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))),
        1, 8), 16, 10).cast("long") % F.lit(1000000)
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    return df.where(bucket < (w * F.lit(1000000)).cast("long"))


def keep_canonical(df: DataFrame, clusters: DataFrame,
                   id_col: str = "docid") -> DataFrame:
    """Duplicate-retention policy: given ``duplicate_clusters`` output
    (docid, cluster_id), keep each cluster's canonical member (min
    docid) plus every unclustered doc — the filter step that turns
    near-dup detection into an actual deduplicated corpus.

    Two cluster-sized joins (clusters is pair-bounded, far smaller than
    the corpus): an anti-join dropping clustered non-canonicals. The
    corpus itself is never shuffled.
    """
    canon = clusters.groupBy("cluster_id").agg(
        F.min("docid").alias("docid"))
    drop = clusters.select("docid").exceptAll(canon.select("docid"))
    return df.join(
        drop.withColumnRenamed("docid", id_col), id_col, "left_anti")


def shuffle_shards(df: DataFrame, n_shards: int, seed: str = "shuffle-v1",
                   id_col: str = "docid") -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shard`` and an in-shard ``sort_key`` derived from md5(id || seed),
    decorrelating training order from ingest/source order (adjacent
    crawl pages, same-conversation turns) the way a host-side corpus
    shuffle would, but reproducibly: the permutation is a pure function
    of ids, independent of partitioning, cluster size, and row order.

    Map-only (two substrings of one md5); the caller materializes the
    order with ``.repartition(n, "shard").sortWithinPartitions
    ("sort_key")`` or a partitioned write — one range-free shuffle whose
    keys are hash-uniform by construction, so shards stay balanced at
    any scale (no skew, no sampling pass, unlike repartitionByRange).
    Same id-hash discipline as ``data_split``/``sample_sources``.
    """
    hx = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    return df.withColumn(
        "shard",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        % F.lit(int(n_shards)),
    ).withColumn(
        "sort_key", F.conv(F.substring(hx, 9, 12), 16, 10).cast("long"))
