"""read_corpus: the parquet/iceberg/table input seam of the build job."""

import pytest

from ex_elasticlunr_spark.sources.io import read_corpus
from ex_elasticlunr_spark.sources.transcripts import transcripts_df


def test_parquet_and_table_formats_agree(spark, tmp_path):
    src = transcripts_df(spark, n_convs=5, turns_per_conv=3)
    path = str(tmp_path / "tx.parquet")
    src.write.parquet(path)
    src.createOrReplaceTempView("tx_corpus")

    via_parquet = read_corpus(spark, path, fmt="parquet")
    via_table = read_corpus(spark, "tx_corpus", fmt="table")
    assert via_parquet.count() == 15
    assert sorted(map(tuple, via_parquet.collect())) == \
        sorted(map(tuple, via_table.collect()))


def test_iceberg_without_runtime_jar_names_the_fix(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_corpus(spark, "nowhere.db.tx", fmt="iceberg")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown corpus format"):
        read_corpus(spark, "x", fmt="orc!")
