"""Deduplication operators for large-scale training-data pipelines.

All hot paths are built-in Column expressions (JVM/whole-stage-codegen;
zero Python in the row path). Hashes use md5 (standardized across
engines) so results are verifiable against any ANSI-SQL oracle.

Scale notes:
  * exact: one groupBy on a 128-bit hash — skew-free.
  * MinHash+LSH: signatures are per-row map work (no shuffle); the only
    shuffle is the band-bucket self-join, whose keys are hash-uniform.
    Candidate verification (exact Jaccard) runs only on bucket pairs.
  * SimHash: per-row map work + optional band join, same shape.
  * duplicate_clusters: driver-side union-find when the verified edge
    list fits a row cap (a literal relation replaces O(diameter)
    shuffle rounds); else iterative min-label propagation — per round
    one join + min-aggregate over the edge list (pair-sized, not
    corpus-sized), O(component diameter) rounds, fixpoint early-stop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType
from pyspark.sql.window import Window

from ..functions.literals import array_lit, inline_rows


def normalized(col):
    """Canonical text form for hashing: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "docid") -> DataFrame:
    """Exact dedup via hash-groupBy -> (text_hash, dup_count, keep_docid).

    keep_docid is the minimum id in the group (the canonical survivor);
    only groups with >1 member are returned. NULL-text rows are
    excluded: md5(NULL) is NULL and groupBy collapses NULL keys, which
    would report every failed-extraction doc as a duplicate of one
    arbitrary survivor — unknown content is not identical content.
    """
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).cast("string").alias("docid"),
            F.md5(normalized(F.col(text_col))).alias("text_hash"),
        )
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("docid").alias("keep_docid"),
        )
        .where(F.col("dup_count") > 1)
    )


def char_shingles(col, k: int = 3):
    """Distinct character k-grams of the normalized text (pure SQL:
    transform over an index sequence — no UDF)."""
    norm = normalized(col)
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({_sql(norm)}) - {k - 1}, 1)), "
            f"i -> substr({_sql(norm)}, i, {k}))"
        )
    )


def _sql(col) -> str:
    # Column -> SQL text for use inside expr(); relies on Column.__repr__
    # being the canonical expression string in pyspark 4
    return col._jc.toString() if hasattr(col, "_jc") else str(col)


def with_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Append ``shingles``: distinct char k-grams of the normalized text.

    pandas UDF (one Python pass per Arrow batch) rather than a SQL
    transform() — higher-order-function lambdas are interpreted
    per-element and dominate runtime on long texts. Values match the
    SQL formulation in the oracle (char_shingles) exactly, except
    element order, which no consumer depends on (set semantics).
    """
    @F.pandas_udf(ArrayType(StringType()))
    def _shingles(norms: pd.Series) -> pd.Series:
        out = []
        for norm in norms:
            if norm is None:
                norm = ""
            n = max(len(norm) - (k - 1), 1)
            # dict keeps first-occurrence order == SQL transform order
            out.append(list(dict.fromkeys(norm[i:i + k] for i in range(n))))
        return pd.Series(out)

    return df.withColumn("shingles", _shingles(normalized(F.col(text_col))))


def minhash_signature(df: DataFrame, text_col: str = "text",
                      num_hashes: int = 16, k: int = 3) -> DataFrame:
    """Append ``minhash: array<string>`` — component h is the min over
    shingles of an 8-hex-char slice of md5(seed || ':' || shingle).

    min-of-md5-hex-slice is a valid minhash family (lexicographic order
    on a uniform hash) and is engine-portable (md5 is standardized,
    unlike murmur/xxhash whose seeds differ across engines). One md5
    yields four independent 8-char slices, so ``num_hashes`` components
    cost only ceil(num_hashes/4) digests per shingle — higher-order
    lambdas are interpreted (no codegen), so digest count dominates.
    """
    import hashlib

    # small single-file sources read as ONE partition — spread the
    # (md5-heavy) signature work across cores before the UDF
    # (functions/partitioning.py: catalyst-stats probe, no RDD node).
    from ..functions.partitioning import spread_small_scan

    df = spread_small_scan(df)

    n_seeds = (num_hashes + 3) // 4

    @F.pandas_udf(ArrayType(StringType()))
    def _minhash(norms: pd.Series) -> pd.Series:
        # identical values to the SQL formulation (md5 hex slices), but
        # one Python pass per Arrow batch instead of interpreted
        # higher-order-function expressions (~50x faster measured).
        # Digests are computed ONCE per distinct (seed, shingle) across
        # the whole batch — corpora repeat shingles heavily, so this
        # collapses the md5 count from sum(per-doc shingles) to the
        # batch's shingle vocabulary — and the per-doc component-wise
        # min runs as one vectorized numpy reduction over fixed-width
        # byte rows (lexicographic min on ascii hex == str min).
        import numpy as np

        doc_sets = []
        uniq: dict = {}
        for norm in norms:
            if norm is None:
                norm = ""
            n = max(len(norm) - (k - 1), 1)
            s = {norm[i:i + k] for i in range(n)}
            doc_sets.append(s)
            for sh in s:
                if sh not in uniq:
                    uniq[sh] = len(uniq)
        # one concatenated hex buffer per unique shingle: the seed
        # digests in order ARE the component slices (component h =
        # chars [8h, 8h+8) of digest(h // 4)), so a single frombuffer
        # reshape builds the whole table with no per-element assignment
        width = num_hashes * 8
        md5 = hashlib.md5
        prefixes = [b"%d:" % s for s in range(n_seeds)]
        bufs = []
        for sh in uniq:
            enc = sh.encode()
            bufs.append("".join(
                md5(p + enc).hexdigest() for p in prefixes)[:width])
        # big-endian-uint64 view: integer order == lexicographic byte
        # order for the all-ascii hex slices (numpy has no min loop for
        # byte-string dtypes); the memory layout is untouched, so the
        # view back to S8 restores the exact hex characters
        tab_u = np.frombuffer(
            "".join(bufs).encode(), dtype="S8").reshape(
            len(uniq), num_hashes).view(">u8") if uniq else \
            np.empty((0, num_hashes), dtype=">u8")
        out = []
        for s in doc_sets:
            mins = tab_u[[uniq[sh] for sh in s]].min(axis=0)
            # the reduce may return native-endian — force big-endian
            # before reinterpreting the memory as the 8 ascii hex chars
            out.append([x.decode()
                        for x in mins.astype(">u8", copy=False).view("S8")])
        return pd.Series(out)

    return df.withColumn("minhash", _minhash(normalized(F.col(text_col))))


def lsh_candidate_pairs(df: DataFrame, id_col: str = "docid",
                        text_col: str = "text", num_hashes: int = 16,
                        bands: int = 4, k: int = 3) -> DataFrame:
    """MinHash LSH: band the signature, bucket-join, emit candidate
    pairs (docid_a < docid_b) with their band count.

    shingle -> minhash -> band -> bucket-join: the only shuffle keys on
    (band_idx, band_key) — hash-uniform, skew-safe. Output is the
    candidate set; verify with ngram_jaccard_pairs / exact compare.
    """
    if bands < 1 or bands > num_hashes or num_hashes % bands:
        # bands > num_hashes would make every band_key the EMPTY string
        # (all-pairs candidate blowup); a non-divisible split would
        # silently discard trailing signature components
        raise ValueError(
            f"bands must divide num_hashes (1 <= bands <= num_hashes); "
            f"got num_hashes={num_hashes}, bands={bands}")
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(df, text_col, num_hashes, k).select(
        F.col(id_col).cast("string").alias("docid"), "minhash"
    )
    banded = sigs.select(
        "docid",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        *[
                            F.col("minhash")[i]
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    # the bucket self-join references this subtree twice; materialize so
    # the (md5-heavy) signature pass computes once. localCheckpoint (not
    # persist): its blocks are GC-cleaned by the ContextCleaner when the
    # DataFrame goes out of scope — no unpersist bookkeeping leaking
    # storage across a long-lived session
    banded = banded.localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.docid") < F.col("b.docid")),
        )
        .groupBy(
            F.col("a.docid").alias("docid_a"),
            F.col("b.docid").alias("docid_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )


def ngram_jaccard_pairs(df: DataFrame, candidates: DataFrame,
                        id_col: str = "docid", text_col: str = "text",
                        n: int = 3, threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification step).

    ``candidates``: DataFrame(docid_a, docid_b). Joins each side to its
    shingle set and computes |A∩B| / |A∪B| with built-in array ops.
    """
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).cast("string").alias("docid"), "shingles"
    )
    out = (
        candidates
        .join(sh.select(F.col("docid").alias("docid_a"),
                        F.col("shingles").alias("sh_a")), "docid_a")
        .join(sh.select(F.col("docid").alias("docid_b"),
                        F.col("shingles").alias("sh_b")), "docid_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("docid_a", "docid_b", F.round("jaccard", 6).alias("jaccard"))
    )
    if threshold > 0:
        out = out.where(F.col("jaccard") >= threshold)
    return out


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "docid",
            bits: int = 16) -> DataFrame:
    """SimHash fingerprint over whitespace tokens.

    Each token hashes to ``bits`` bits (from md5 hex); the fingerprint
    bit b is 1 iff the (count-weighted) sum of (2*bit-1) over tokens is
    positive. Pure SQL: explode -> per-(doc,bit) aggregate -> bit pack.
    """
    if not (1 <= bits <= 32):
        # the token hash carries 32 bits (8 md5 hex chars); higher
        # fingerprint bits would be silently zero for every document
        raise ValueError(f"bits must be in [1, 32], got {bits}")
    toks = df.select(
        F.col(id_col).cast("string").alias("docid"),
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    # token hash: first 8 hex chars (32 bits) -> use low `bits` bits
    hashed = toks.withColumn(
        "th", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    )
    bit = hashed.select(
        "docid",
        F.explode(
            array_lit(list(range(bits)), "int")
        ).alias("b"),
        "th",
    ).withColumn(
        "contrib",
        F.when(F.expr("shiftright(th, b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    return (
        bit.groupBy("docid", "b")
        .agg(F.sum("contrib").alias("s"))
        .withColumn("bitval",
                    F.when(F.col("s") > 0,
                           F.expr("cast(shiftleft(1, b) as long)"))
                    .otherwise(F.lit(0)))
        .groupBy("docid")
        .agg(F.sum("bitval").alias("simhash"))
    )


def duplicate_clusters(pairs: DataFrame, max_iters: int = 20,
                       driver_max_edges: int = 100_000) -> DataFrame:
    """Connected components over duplicate pairs -> (docid, cluster_id).

    The step after candidate generation + verification in a dedup
    pipeline: near-duplicate pairs form clusters and one representative
    per cluster is kept. ``cluster_id`` is the MIN docid (string order)
    of the component, so ``docid == cluster_id`` marks the keeper.

    Adaptive execution (same discipline as the WAND driver-serve cap):
    the verified edge list is usually minuscule next to the corpus —
    LSH banding plus exact verification prunes to actual near-dups — so
    when it fits under ``driver_max_edges`` rows the components are
    solved with union-find on the driver and returned as a literal
    relation (zero shuffle rounds, broadcastable downstream). The probe
    is ``limit(cap+1)``: getting <= cap rows back proves the collected
    list is complete. Past the cap, distributed min-label propagation
    runs — each iteration one shuffle join plus a min-aggregate over
    the edge list, O(component diameter) rounds with a fixpoint
    early-stop. Duplicate clusters are shallow (near-dup groups, not a
    social graph), so the iteration count stays small at any corpus
    size; each iteration's volume is bounded by the edge list, never
    the corpus.
    """
    fwd = pairs.select(F.col("docid_a").cast("string").alias("src"),
                       F.col("docid_b").cast("string").alias("dst"))
    head = fwd.limit(driver_max_edges + 1).collect()
    if len(head) <= driver_max_edges:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in head:
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        label: dict = {}
        for n in parent:
            root = find(n)
            if root not in label or n < label[root]:
                label[root] = n
        rows = sorted((n, label[find(n)]) for n in parent)
        return inline_rows(pairs.sparkSession, rows,
                           "docid string, cluster_id string")
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    # localCheckpoint, not persist: each round's plan would otherwise
    # nest the previous round's join+union+agg, and the lineage depth
    # after O(diameter) rounds overflows the driver stack when Spark
    # renders/plans the tree (seen as a generateTreeString
    # StackOverflow in long sessions). Checkpointing truncates the
    # plan to the materialized blocks; ContextCleaner reclaims them.
    labels = (edges.select(F.col("src").alias("docid")).distinct()
              .withColumn("cluster_id", F.col("docid"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges["src"] == labels["docid"])
            .select(F.col("dst").alias("docid"), F.col("cluster_id"))
        )
        new = (labels.unionByName(prop)
               .groupBy("docid")
               .agg(F.min("cluster_id").alias("cluster_id"))
               .localCheckpoint(eager=True))
        changed = (new.join(labels, ["docid", "cluster_id"], "left_anti")
                   .limit(1).count())
        labels = new
        if changed == 0:
            break
    else:
        # exhausted max_iters while labels were still moving: returning
        # here would silently SPLIT long-diameter components (chain-
        # shaped near-dup runs), and keep_canonical would then retain
        # one "canonical" per spurious sub-cluster — fail loudly instead
        edges.unpersist()
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} "
            f"iterations — a component's diameter exceeds max_iters; "
            f"raise max_iters (each iteration is one edge-bounded "
            f"shuffle round)")
    edges.unpersist()
    return labels.select("docid", "cluster_id")


def dedup_paragraphs(df: DataFrame, text_col: str = "text",
                     id_col: str = "docid") -> DataFrame:
    """Paragraph-level exact dedup (the C4/Gopher boilerplate-removal
    pass: repeated navigation footers, cookie banners, and license
    blurbs recur verbatim across documents even when whole documents
    differ). Split each document on blank lines, hash each normalized
    paragraph, and mark the corpus-wide FIRST occurrence (docid asc,
    para_idx asc) of every distinct paragraph as the keeper.

    Returns (docid, para_idx, para_hash, keep). 100 TB shape: one
    map-only posexplode, then ONE hash-keyed shuffle for the
    first-occurrence window — the paragraph text is dropped before the
    shuffle, so shuffle rows are (id, idx, 32-hex-char hash) wide, and
    the per-key group is bounded by a paragraph's corpus-wide
    repetition count (boilerplate keys are hot but their rows are
    id-width; a salted two-phase min would cap even those if needed).
    """
    paras = (
        df.select(
            F.col(id_col).cast("string").alias("docid"),
            F.posexplode(F.split(F.col(text_col), r"\n\s*\n"))
            .alias("para_idx", "para"),
        )
        .where(F.length(F.trim(F.col("para"))) > 0)
        .select("docid", "para_idx",
                F.md5(normalized(F.col("para"))).alias("para_hash"))
    )
    w = Window.partitionBy("para_hash").orderBy("docid", "para_idx")
    return (
        paras.withColumn(
            "keep", (F.row_number().over(w) == 1).cast("long"))
        .select("docid", "para_idx", "para_hash", "keep")
    )


def dedup_exact_stream(stream_df: DataFrame, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming twin of exact dedup: emit only the FIRST arrival of
    every normalized-content hash, dropping later duplicates, for
    dedup-at-ingest pipelines where the corpus arrives as a stream.

    Built on ``dropDuplicatesWithinWatermark`` keyed on the md5 of the
    normalized text: the state store holds one entry per distinct hash
    and expires entries once the event-time watermark passes
    ``watermark_delay``, so state is bounded by (distinct docs within
    the watermark window), not by stream length — the property that
    keeps this runnable forever at ingest scale. Contract differences
    from the batch ``exact_duplicates``: the survivor is the first
    ARRIVAL (batch keeps min docid), and duplicates separated by more
    than the watermark delay are NOT caught — re-dedup the landed
    corpus with the batch operator for a global guarantee.
    """
    hashed = stream_df.where(F.col(text_col).isNotNull()).withColumn(
        "text_hash", F.md5(normalized(F.col(text_col))))
    # NULL-text rows are dropped (same rationale as exact_duplicates:
    # dropDuplicates treats NULL keys as equal and would keep only the
    # first failed-extraction row of the whole stream)
    return (hashed.withWatermark(ts_col, watermark_delay)
            .dropDuplicatesWithinWatermark(["text_hash"]))
