"""Event operators: gap sessionization + windowed aggregation, batch
and streaming parity (operators/events.py)."""

import os

from pyspark.sql import functions as F

from ex_elasticlunr_spark.operators import events as ev

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _events(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: two events 10 min apart (one session), then a 45-min
        # gap (new session)
        (1, 1, "2024-01-01 00:00:00", "click", 1.0),
        (2, 1, "2024-01-01 00:10:00", "view", 2.0),
        (3, 1, "2024-01-01 00:55:00", "click", 3.0),
        # user 2: single event
        (4, 2, "2024-01-01 00:05:00", "error", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, "
              "value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: (r["session_idx"], r["session_id"])
        for r in ev.sessionize(df, gap_minutes=30).collect()
    }
    assert got == {1: (0, "1-0"), 2: (0, "1-0"), 3: (1, "1-1"),
                   4: (0, "2-0")}


def test_session_stats_matches_manual(spark):
    df = _events(spark)
    stats = ev.session_stats(df, gap_minutes=30)
    # invariants vs the raw table
    assert stats.agg(F.sum("n_events")).first()[0] == df.count()
    assert stats.where("session_end < session_start").count() == 0
    assert stats.where("duration_sec < 0").count() == 0
    # per-user session_idx is dense 0..k-1
    dense = stats.groupBy("user_id").agg(
        F.max("session_idx").alias("mx"),
        F.count(F.lit(1)).alias("n"))
    assert dense.where(F.col("mx") != F.col("n") - 1).count() == 0
    # a specific user cross-checked in pure python
    uid = df.select("user_id").first()["user_id"]
    rows = sorted(
        df.where(F.col("user_id") == uid).select("ts", "event_id").collect(),
        key=lambda r: (r["ts"], r["event_id"]))
    n_sessions, prev = 0, None
    for r in rows:
        if prev is None or (r["ts"] - prev).total_seconds() > 1800:
            n_sessions += 1
        prev = r["ts"]
    assert stats.where(F.col("user_id") == uid).count() == n_sessions


def test_windowed_counts_matches_manual(spark):
    df = _events(spark)
    wc = ev.windowed_counts(df, window="1 hour")
    assert wc.agg(F.sum("n_events")).first()[0] == df.count()
    # one window/type bucket cross-checked
    row = wc.orderBy("window_start", "event_type").first()
    n = df.where(
        (F.col("ts") >= row["window_start"])
        & (F.col("ts") < row["window_end"])
        & (F.col("event_type") == row["event_type"])).count()
    assert n == row["n_events"]


def test_windowed_counts_stream_parity(spark, tmp_path):
    """Streaming watermarked windows == batch windows over the same
    rows (append mode: a far-future sentinel closes all real windows)."""
    df = _events(spark).limit(500).cache()
    src = str(tmp_path / "in")
    os.makedirs(src)
    cut = df.agg(F.expr("percentile(cast(cast(ts as timestamp_ltz) as double), 0.5)")).first()[0]
    df.where(F.col("ts").cast("timestamp_ltz").cast("double") <= cut).write.mode("overwrite") \
        .parquet(os.path.join(src, "f1.parquet"))
    late = df.where(F.col("ts").cast("timestamp_ltz").cast("double") > cut)
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.to_timestamp(F.lit("2030-01-01 00:00:00"))).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    late.select(*sentinel.columns).unionByName(sentinel) \
        .write.mode("overwrite").parquet(os.path.join(src, "f2.parquet"))

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*.parquet")
    out = ev.windowed_counts_stream(stream, window="1 hour",
                                    watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("ev_win")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.table("ev_win").where("event_type <> 'sentinel'") \
        .select("window_start", "event_type", "n_events", "sum_value")
    want = ev.windowed_counts(df, window="1 hour") \
        .select("window_start", "event_type", "n_events", "sum_value")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    df.unpersist()


def test_sessionize_stream_parity(spark, tmp_path):
    """applyInPandasWithState sessionizer: last update per session ==
    the batch session_stats row (events split time-ordered across two
    micro-batches so per-user state carries over)."""
    df = _events(spark).limit(400).cache()
    src = str(tmp_path / "in")
    os.makedirs(src)
    cut = df.agg(F.expr("percentile(cast(cast(ts as timestamp_ltz) as double), 0.5)")).first()[0]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    df.where(F.col("ts").cast("timestamp_ltz").cast("double") <= cut).select(*cols) \
        .write.mode("overwrite").parquet(os.path.join(src, "f1.parquet"))
    df.where(F.col("ts").cast("timestamp_ltz").cast("double") > cut).select(*cols) \
        .write.mode("overwrite").parquet(os.path.join(src, "f2.parquet"))

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*.parquet")
    out = ev.sessionize_stream(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("ev_sess")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    # update-mode emissions: per session the aggregates grow
    # monotonically, so the final state is the max-n_events row
    emitted = spark.table("ev_sess")
    last = emitted.withColumn(
        "rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("session_id")
            .orderBy(F.desc("n_events"), F.desc("session_end")))
    ).where("rn = 1").drop("rn")

    want = ev.session_stats(df, gap_minutes=30).select(
        "user_id", "session_idx", "session_id", "session_start",
        "session_end", "n_events",
        F.round("sum_value", 4).alias("sum_value"))
    got = last.select(
        "user_id", "session_idx", "session_id", "session_start",
        "session_end", "n_events",
        F.round("sum_value", 4).alias("sum_value"))
    missing = want.exceptAll(got)
    extra = got.exceptAll(want)
    assert missing.count() == 0, missing.limit(5).collect()
    assert extra.count() == 0, extra.limit(5).collect()
    df.unpersist()
