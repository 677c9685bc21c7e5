"""Similarity search over embedding columns (array<float>).

* brute_force_topk: exact cosine top-k — the correctness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side, no UDF);
  one broadcast of the query vector; top-k via TakeOrderedAndProject.

* lsh_topk: random-hyperplane LSH scale path. Hyperplanes are derived
  deterministically from md5 (engine-portable, seedable); vectors land
  in a sign-pattern bucket; search probes the query's bucket (+ optional
  multi-probe neighbors at Hamming distance 1), then scores exactly
  within the candidate set. At 100 TB the bucket join replaces the full
  scan: cost ~ N/2^bits per query.

* ivf_topk: IVF-style coarse quantization without a trained codebook —
  centroid ids are picked deterministically (the lexicographically first
  ``n_cells`` vec ids), vectors assign to their nearest centroid
  (one broadcast join), queries probe the closest ``n_probe`` cells.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.literals import array_lit, in_expr


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b):
    # try_divide: a zero-norm vector (failed/padded embedding rows are
    # common in real corpora) yields NULL similarity instead of a
    # DIVIDE_BY_ZERO SparkArithmeticException under Spark 4's default
    # ANSI mode — NULL never passes a >= threshold and sorts last in
    # top-k (desc_nulls_last semantics are applied by the callers'
    # orderBy via NULL filtering at the comparison)
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def brute_force_topk(df: DataFrame, query_vec: List[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = array_lit([float(v) for v in query_vec], "double")
    vec = F.col(vec_col).cast("array<double>")
    return (
        df.select(
            F.col(id_col).cast("string").alias("vec_id"),
            F.round(cosine(vec, q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _hyperplane(dim: int, plane: int) -> List[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible in
    any engine with md5 (used by the SQL oracle)."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"hp:{plane}:{j}".encode()).hexdigest()[:8]
        out.append(int(h, 16) / float(1 << 31) - 1.0)  # [-1, 1)
    return out


def bucket_of(vec_col, dim: int, n_planes: int, plane_offset: int = 0):
    """Sign-pattern bucket id (integer) for a vector column, over global
    hyperplanes [plane_offset, plane_offset + n_planes)."""
    vec = vec_col.cast("array<double>")
    acc = F.lit(0)
    for p in range(n_planes):
        hp = array_lit(_hyperplane(dim, plane_offset + p), "double")
        bit = F.when(_dot(vec, hp) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        acc = acc + bit
    return acc


def lsh_topk(df: DataFrame, query_vec: List[float], k: int = 10,
             n_planes: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding",
             multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket (plus all
    Hamming-1 neighbors when multiprobe) and rank exactly within it."""
    dim = len(query_vec)
    bucketed = df.withColumn("bucket", bucket_of(F.col(vec_col), dim, n_planes))

    qbits = 0
    for p in range(n_planes):
        hp = _hyperplane(dim, p)
        if sum(a * b for a, b in zip(query_vec, hp)) >= 0:
            qbits |= 1 << p
    probes = [qbits]
    if multiprobe:
        probes += [qbits ^ (1 << p) for p in range(n_planes)]

    cand = bucketed.where(in_expr("bucket", probes))
    q = array_lit([float(v) for v in query_vec], "double")
    vec = F.col(vec_col).cast("array<double>")
    return (
        cand.select(
            F.col(id_col).cast("string").alias("vec_id"),
            F.round(cosine(vec, q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def pairwise_near_duplicates(df: DataFrame, threshold: float = 0.95,
                             n_planes: int = 8, n_bands: int = 4,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: Optional[int] = None) -> DataFrame:
    """Embedding-cosine near-dup pairs via BANDED hyperplane LSH (the
    MinHash-LSH shape): ``n_bands`` independent bands of ``n_planes``
    sign bits each; a pair is a candidate iff all bits of SOME band
    agree, then exact cosine verifies candidates only.

    Scale shape: candidates are bounded per (band, bucket) — bucket
    count is ``n_bands * 2^n_planes`` and grows with ``n_planes``, so
    the within-bucket self-join never approaches all-pairs; banding
    (OR over bands) restores the recall a single fine bucket table
    loses. Each vector emits ``n_bands`` rows of (vec_id, band, bucket)
    ONLY — the full vectors do NOT ride the candidate shuffle (at 100 TB
    of 1-4 KB vectors that would multiply shuffle bytes by ~2*n_bands);
    the embedding table joins back onto the (much smaller) deduplicated
    candidate pair set for the exact cosine verification.
    """
    if dim is None:
        row = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
        if row is None:
            # empty (or all-null-embedding) input: no pairs, not a crash
            return df.sparkSession.createDataFrame(
                [], "vec_id_a string, vec_id_b string, cos_sim double")
        dim = len(row[0])
    vecs = df.select(
        F.col(id_col).cast("string").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # band b uses global planes [b*n_planes, (b+1)*n_planes) so the SQL
    # oracle reproduces the exact same hyperplanes
    band_buckets = F.array(*[
        F.struct(
            F.lit(band).alias("band"),
            bucket_of(F.col("v"), dim, n_planes,
                      plane_offset=band * n_planes).alias("bucket"),
        )
        for band in range(n_bands)
    ])
    b = (
        vecs.withColumn("bb", F.explode(band_buckets))
        .select("vec_id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    )
    a, c = b.alias("a"), b.alias("c")
    # id-width rows through the bucket shuffle; distinct() collapses
    # pairs that collide in several bands BEFORE the vector join
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("c.vec_id").alias("vec_id_b"),
        )
        .distinct()
    )
    va = vecs.select(F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "vec_id_a").join(vb, "vec_id_b")
        .select(
            "vec_id_a", "vec_id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _scale_col(vec):
    """Per-vector int8 scale: max(|x|)/127, 1.0 for the zero vector."""
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    return F.when(max_abs == 0.0, F.lit(1.0)).otherwise(max_abs / 127.0)


def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization: DataFrame(vec_id, scale,
    qvec array<int>) with x ≈ qvec[i] * scale.

    The standard 100 TB embedding-store lever: 4× less storage and —
    the part that matters for brute-force scoring — 4× less memory
    bandwidth per scan, at <1% cosine error for unit-norm-ish vectors.
    Map-only, no shuffle. floor(x+0.5) instead of round(): identical
    IEEE semantics in every engine — SQL ROUND's half-away vs numpy's
    banker's rounding would diverge on exact .5 quotients. The scale is
    projected to its own column FIRST so the per-element lambda
    references a computed value instead of re-evaluating the array_max
    reduction d times per row."""
    vec = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col).cast("string").alias("vec_id"),
                  vec.alias("_v"))
        .withColumn("scale", _scale_col(F.col("_v")))
        .select(
            "vec_id", "scale",
            F.transform(
                "_v",
                lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"))
            .alias("qvec"),
        )
    )


def quantized_topk(df: DataFrame, query_vec: List[float], k: int = 10,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Exact top-k over the int8-QUANTIZED corpus (and quantized query):
    the fidelity check for serving brute-force ANN from a quantized
    store — rank quality vs ``brute_force_topk`` is the recall metric
    (tests pin recall@10).

    Deterministic across engines: quantization uses floor(x/s + 0.5)
    (see _dequantized) and the query is quantized driver-side with the
    same IEEE-double arithmetic."""
    # driver-side quantize-dequantize of the query (same formula)
    import math

    m = max(abs(float(x)) for x in query_vec)
    s = (m / 127.0) if m != 0.0 else 1.0
    dq_query = [math.floor(float(x) / s + 0.5) * s for x in query_vec]
    q = array_lit(dq_query, "double")
    vec = F.col(vec_col).cast("array<double>")
    deq = (
        df.select(F.col(id_col).cast("string").alias("vec_id"),
                  vec.alias("_v"))
        .withColumn("_s", _scale_col(F.col("_v")))
        .select("vec_id", F.transform(
            "_v", lambda x: F.floor(x / F.col("_s") + 0.5) * F.col("_s"))
            .alias("_dv"))
    )
    return (
        deq.select(
            "vec_id",
            F.round(cosine(F.col("_dv"), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def semantic_dedup(df: DataFrame, threshold: float = 0.99,
                   n_planes: int = 8, n_bands: int = 4,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   dim: Optional[int] = None) -> DataFrame:
    """SemDeDup-shaped embedding dedup (Abbas et al., 2023: drop all but
    one of each group of semantically near-identical documents): returns
    DataFrame(vec_id, keep) over EVERY input row, where ``keep`` is
    false iff the vector has a near-duplicate (cosine >= threshold)
    with a LEXICOGRAPHICALLY SMALLER id.

    Retention policy: greedy pairwise min-id — deterministic, one
    anti-join over the near-dup pair list, no iterative clustering.
    (The published SemDeDup keeps one doc per within-cluster group;
    the greedy rule agrees except on chains where a doc's only smaller
    near-dups are themselves dropped — at a 0.99 threshold those chains
    are vanishingly rare, and the greedy rule errs on dropping, which
    is the conservative direction for training-data dedup. For
    connected-component retention compose ``pairwise_near_duplicates``
    with ``dedup.duplicate_clusters`` instead.)

    Scale shape: inherits pairwise_near_duplicates' banded-LSH candidate
    generation (never all-pairs, id-width candidate shuffle); the keep
    flag is one left-anti-shaped join of the corpus ids against the
    distinct dropped-id set.
    """
    pairs = pairwise_near_duplicates(
        df, threshold=threshold, n_planes=n_planes, n_bands=n_bands,
        id_col=id_col, vec_col=vec_col, dim=dim)
    dropped = pairs.select(
        F.col("vec_id_b").alias("vec_id")).distinct().withColumn(
        "dropped", F.lit(True))
    ids = df.select(F.col(id_col).cast("string").alias("vec_id"))
    return (ids.join(dropped, "vec_id", "left")
            .select("vec_id",
                    F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep")))


def _assign_cells(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """argmax-cosine cell assignment via one broadcast cross join."""
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("sim", cosine(F.col("v"), F.col("cv")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "cell")
    )


def ivf_topk(df: DataFrame, query_vec: List[float], k: int = 10,
             n_cells: int = 8, n_probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", kmeans_iters: int = 0) -> DataFrame:
    """IVF-style coarse search: deterministic pseudo-random sampled
    centroids (md5-ordered vec ids — uniform over the corpus, unlike a
    first-N prefix, and reproducible in any engine with md5), optional
    Lloyd refinement iterations, assignment via broadcast argmax join,
    query probes the ``n_probe`` nearest cells.

    ``kmeans_iters``: each iteration re-assigns all vectors to their
    nearest centroid (broadcast join) and recomputes centroids as the
    per-cell elementwise mean (posexplode + groupBy(cell, dim) — a
    distributed Lloyd step whose output is only n_cells*dim values,
    collected and re-broadcast). Means are rounded to 9 decimals so the
    refined centroids are bit-identical across engines (a parallel AVG
    sums in partition order; the last-ulp difference vs a serial SQL
    engine would otherwise leak into argmax assignments near ties).
    """
    vecs = df.select(
        F.col(id_col).cast("string").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cents = (
        vecs.orderBy(F.md5(F.col("vec_id")), F.col("vec_id"))
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
    )
    for _ in range(kmeans_iters):
        means = (
            _assign_cells(vecs, cents)
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), 9).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell",
                    F.transform("pm", lambda s: s["m"]).alias("cv"))
        )
        spark = df.sparkSession
        from ..functions.literals import inline_rows

        cents = inline_rows(
            spark,
            [(r["cell"], [float(x) for x in r["cv"]]) for r in means.collect()],
            "cell string, cv array<double>",
        )
    assigned = _assign_cells(vecs, cents)

    cent_rows = cents.collect()
    import math

    def cos_py(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0.0 or nb == 0.0:
            # zero-norm centroid (all-zero embeddings clustered, or a
            # degenerate Lloyd mean) / all-zero query: rank it LAST
            # instead of raising — the JVM cosine path yields NULL for
            # the same case
            return float("-inf")
        return d / (na * nb)

    ranked = sorted(
        cent_rows, key=lambda r: (-cos_py(query_vec, r["cv"]), r["cell"])
    )
    probe_cells = [r["cell"] for r in ranked[:n_probe]]
    q = array_lit([float(v) for v in query_vec], "double")
    return (
        assigned.where(in_expr("cell", probe_cells))
        .select(
            "vec_id", F.round(cosine(F.col("v"), q), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
