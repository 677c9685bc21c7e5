"""Scale-adaptive scan spreading.

Small inputs (a single parquet file, a driver-local relation) plan as
one or two scan tasks, which serializes any expensive per-row work fed
by the scan — the analyzer ``mapInPandas`` pass, md5-heavy signature
UDFs — onto one core while the rest of the cluster idles (guide:
"input skew — one huge unsplittable file; repartition immediately
after the read"). At real corpus scale the file count dwarfs the core
count and the probe is a no-op, so the repartition only fires where it
pays for itself.

The probe reads catalyst plan STATISTICS (driver-side metadata only —
no RDD conversion, no job): estimated input bytes over
``spark.sql.files.maxPartitionBytes`` bounds the scan's split count.
Unknown stats (the Long.Max sentinel of non-file sources — local
relations, JDBC reads) default to SPREADING: those sources are
single-or-few-partition far more often than wide, a redundant
repartition costs one bounded shuffle, and a missed one costs a
single-core pass over the corpus.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def estimated_scan_partitions(df: DataFrame) -> int:
    """Estimated file-scan split count from catalyst plan statistics.

    Returns 1 for the unknown-size sentinel (>= 2^62) so callers
    default to spreading; raises nothing — stats API drift falls back
    to ``defaultParallelism`` (meaning "already wide enough")."""
    sc = df.sparkSession.sparkContext
    try:
        size = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        max_split = sc._jvm.org.apache.spark.network.util.JavaUtils \
            .byteStringAsBytes(df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", "128m"))
        return (1 if size >= (1 << 62)
                else max(1, size // max(1, max_split)))
    except Exception:  # stats API drift: report "wide" (no repartition)
        return sc.defaultParallelism


def spread_small_scan(df: DataFrame,
                      min_parts: Optional[int] = None) -> DataFrame:
    """Round-robin repartition when the scan would plan fewer splits
    than ``min_parts`` (default ``defaultParallelism``). Deterministic
    under task retry (Spark's sort-before-repartition stays on); a
    no-op whenever the input is estimated to already be wide."""
    sc = df.sparkSession.sparkContext
    want = min_parts or sc.defaultParallelism
    if estimated_scan_partitions(df) < want:
        return df.repartition(want)
    return df
