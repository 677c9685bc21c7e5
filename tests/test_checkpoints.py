"""Resumable build: crash mid-build (only some buckets done), resume,
and verify the final index is byte-identical to a direct build; lineage
and metrics recorded.
"""

import json
import os

from pyspark.sql import functions as F

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.build.checkpoints import (
    checkpointed_build,
    completed_buckets,
    read_metrics,
)
from ex_elasticlunr_spark.sources.transcripts import transcripts_df, with_docid


def test_resume_equals_direct_build(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    src = with_docid(transcripts_df(spark, n_convs=30, turns_per_conv=4))

    # simulated crash: process only 2 of 6 buckets
    partial = checkpointed_build(
        spark, src, ["text", "tool"], out, n_buckets=6, max_buckets=2
    )
    assert partial is None
    assert len(completed_buckets(out, 6)) == 2

    # lineage written for completed buckets only
    done = completed_buckets(out, 6)
    for b in done:
        lineage = json.load(open(os.path.join(out, "buckets", str(b), "lineage.json")))
        assert lineage["rows_in"] > 0
        assert lineage["terms_per_sec"] > 0

    # resume: finishes the remaining 4 buckets and merges
    merged = checkpointed_build(spark, src, ["text", "tool"], out, n_buckets=6)
    assert merged is not None
    assert len(completed_buckets(out, 6)) == 6

    direct = Index(name="direct").add_field("text").add_field("tool")
    direct.add_documents(src, docid_col="docid")

    # the loaded v5 narrow postings carry no docid — resolve through the
    # ordinals table (the designed read path for docid-level comparisons)
    a = (merged.postings.join(merged.ordinals_df(), "ord")
         .select("field", "term", "docid", "tf_raw", "doc_len"))
    b = direct.inverted.postings.select("field", "term", "docid", "tf_raw", "doc_len")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    # stats identical
    fa = {r["field"]: (r["n_docs"], r["n_unique_terms"])
          for r in merged.field_stats.collect()}
    fb = {r["field"]: (r["n_docs"], r["n_unique_terms"])
          for r in direct.inverted.field_stats.collect()}
    assert fa == fb

    # metrics table has all three stages
    m = read_metrics(spark, out)
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert stages == {"bucketize", "bucket_build", "merge"}
    assert m.where(F.col("stage") == "bucket_build").count() == 6
    merge_row = m.where(F.col("stage") == "merge").first()
    assert merge_row["merge_fan_in"] == 6.0


def test_reentrant_noop(spark, tmp_path):
    out = str(tmp_path / "ckpt2")
    src = with_docid(transcripts_df(spark, n_convs=5, turns_per_conv=3))
    first = checkpointed_build(spark, src, ["text"], out, n_buckets=2)
    assert first is not None
    # second call re-merges from checkpoints without rebuilding buckets
    before = read_metrics(spark, out).where(
        F.col("stage") == "bucket_build").count()
    again = checkpointed_build(spark, src, ["text"], out, n_buckets=2)
    after = read_metrics(spark, out).where(
        F.col("stage") == "bucket_build").count()
    assert again is not None
    assert before == after == 2


def test_resume_param_mismatch_raises(spark, tmp_path):
    """Resuming with a different n_buckets would scan only a prefix of
    the bucket range and silently drop the rest — build_params.json
    pins the first run's parameters."""
    import pytest
    from pyspark.sql import functions as F

    from ex_elasticlunr_spark.build.checkpoints import checkpointed_build

    docs = spark.range(40).select(
        F.col("id").cast("string").alias("docid"),
        F.concat(F.lit("spark doc "), F.col("id")).alias("text"))
    out = str(tmp_path / "ckpt_params")
    checkpointed_build(spark, docs, ["text"], out, n_buckets=4,
                       max_buckets=1)
    with pytest.raises(ValueError, match="parameter mismatch"):
        checkpointed_build(spark, docs, ["text"], out, n_buckets=8)
    with pytest.raises(ValueError, match="local/mounted"):
        checkpointed_build(spark, docs, ["text"], "s3://bucket/x")


def test_bucket_marker_written_after_docs(spark, tmp_path):
    """The resume marker (postings/_SUCCESS) must be the LAST artifact
    of a bucket: a bucket directory with the marker always has a
    complete docs table next to it."""
    import os

    from pyspark.sql import functions as F

    from ex_elasticlunr_spark.build.checkpoints import (
        checkpointed_build,
        completed_buckets,
    )

    docs = spark.range(30).select(
        F.col("id").cast("string").alias("docid"),
        F.concat(F.lit("merge doc "), F.col("id")).alias("text"))
    out = str(tmp_path / "ckpt_order")
    checkpointed_build(spark, docs, ["text"], out, n_buckets=3)
    for b in completed_buckets(out, 3):
        bdir = os.path.join(out, "buckets", str(b))
        assert os.path.exists(os.path.join(bdir, "docs", "_SUCCESS"))
