"""Streaming ingest == batch build (same rows, first-write-wins dups)."""

import os

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.sources.transcripts import transcripts_df, with_docid
from ex_elasticlunr_spark.streaming.ingest import (
    finalize_stream_index,
    ingest_stream,
)

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp, docid string")


def test_stream_ingest_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    out = str(tmp_path / "stream_index")
    os.makedirs(src_dir)

    full = with_docid(transcripts_df(spark, n_convs=20, turns_per_conv=4))
    part1 = full.where("conv_id < 'conv-000010'")
    part2 = full.where("conv_id >= 'conv-000010'")

    # micro-batch 1
    part1.write.mode("overwrite").parquet(os.path.join(src_dir, "f1.parquet"))
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src_dir + "/*.parquet")
    q = ingest_stream(stream, ["text", "tool"], out)
    q.awaitTermination(120)

    # micro-batch 2: new rows + duplicates of batch-1 docids with
    # DIFFERENT text (must be ignored: first write wins, field.ex:85)
    dup = part1.limit(5).withColumn("text", part1.tool)  # changed content
    part2.unionByName(dup).write.mode("overwrite").parquet(
        os.path.join(src_dir, "f2.parquet"))
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src_dir + "/*.parquet")
    q = ingest_stream(stream, ["text", "tool"], out)
    q.awaitTermination(120)

    merged = finalize_stream_index(spark, out, ["text", "tool"])

    batch = Index(name="batch").add_field("text").add_field("tool")
    batch.add_documents(full, docid_col="docid")

    a = merged.postings.select("field", "term", "docid", "tf_raw", "doc_len")
    b = batch.inverted.postings.select("field", "term", "docid", "tf_raw", "doc_len")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert merged.docs.count() == batch.inverted.docs.count()
