"""Event operators: gap sessionization + windowed aggregation, batch
and streaming parity (operators/events.py)."""

import os

import pytest
from pyspark.sql import functions as F

from tests.stream_util import await_terminated
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
    await_terminated(q, 120)

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
    # NoTimeout: a bounded availableNow replay never fires
    # processing-time timers and would loop empty batches forever
    # (sessionize_stream docstring); update-mode already emitted the
    # open tail sessions from their data batches
    out = ev.sessionize_stream(stream, gap_minutes=30,
                               idle_timeout_ms=None)
    q = (out.writeStream.format("memory").queryName("ev_sess")
         .outputMode("update").trigger(availableNow=True).start())
    await_terminated(q, 180)

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


def test_sessionize_stream_idle_timeout_flush(spark, tmp_path):
    """LIVE-trigger contract of the idle timeout: after
    ``idle_timeout_ms`` of processing-time silence the open session is
    PROGRESS-flushed via the hasTimedOut branch while the state row is
    RETAINED — a processing-time pause must never split an event-time
    session, and a returning user continues the SAME session (same
    session_id, growing n_events) exactly like batch.
    (Only exercisable under a processingTime trigger — availableNow
    never fires processing-time timers, which is why the bounded
    parity test above runs with idle_timeout_ms=None.)"""
    import time

    src = str(tmp_path / "live_in")
    os.makedirs(src)
    rows = [(1, "2024-01-01 00:00:00", 100, "click", 1.0, ""),
            (2, "2024-01-01 00:10:00", 100, "click", 2.0, "")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(os.path.join(src, "f1.parquet"))
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*.parquet")
    q = (ev.sessionize_stream(stream, gap_minutes=30,
                              idle_timeout_ms=1500)
         .writeStream.format("memory").queryName("ev_live")
         .outputMode("update")
         .trigger(processingTime="500 milliseconds").start())
    try:
        flushed = False
        for _ in range(60):
            time.sleep(1)
            if spark.table("ev_live").where("n_events = 2").count() >= 2:
                flushed = True
                break
        assert flushed, "idle timeout never flushed the open session"
        # the flush re-emits the open session row verbatim: one row
        # from the data batch, one from the hasTimedOut branch —
        # while the state row SURVIVES the flush
        final = spark.table("ev_live").where("n_events = 2").collect()
        assert {r["session_id"] for r in final} == {"100-0"}
        assert all(r["sum_value"] == 3.0 for r in final)
        ops = ((q.lastProgress or {}).get("stateOperators") or [{}])[0]
        assert ops.get("numRowsTotal") == 1, \
            "timeout flush must retain per-user state"

        # the user returns WITHIN the event-time gap: the same session
        # continues (n_events 3), no session_id collision/reset
        rows2 = [(3, "2024-01-01 00:20:00", 100, "click", 4.0, "")]
        df2 = spark.createDataFrame(
            rows2, "event_id long, ts string, user_id long, "
                   "event_type string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
        df2.coalesce(1).write.parquet(os.path.join(src, "f2.parquet"))
        resumed = False
        for _ in range(60):
            time.sleep(1)
            cont = spark.table("ev_live").where(
                "session_id = '100-0' AND n_events = 3").collect()
            if cont:
                assert cont[0]["sum_value"] == 7.0
                resumed = True
                break
        assert resumed, "returning user did not continue the session"
    finally:
        q.stop()


def test_funnel_strict_order_and_ties(spark):
    rows = [
        # u1: full ordered funnel
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:01:00", 1, "click"),
        (3, "2024-01-01 00:02:00", 1, "purchase"),
        # u2: click BEFORE first view -> stops after view
        (4, "2024-01-01 00:01:00", 2, "click"),
        (5, "2024-01-01 00:02:00", 2, "view"),
        # u3: click at the SAME instant as the first view -> ties do
        # not chain (strict >)
        (6, "2024-01-01 00:00:00", 3, "view"),
        (7, "2024-01-01 00:00:00", 3, "click"),
        # u4: purchase only -> no step at all
        (8, "2024-01-01 00:00:00", 4, "purchase"),
        # u5: view, then a LATER second click chains even though an
        # earlier click existed pre-view
        (9, "2024-01-01 00:00:00", 5, "click"),
        (10, "2024-01-01 00:01:00", 5, "view"),
        (11, "2024-01-01 00:02:00", 5, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [(r["step_idx"], r["step"], r["users"])
           for r in ev.funnel(df, ["view", "click", "purchase"]).collect()]
    # views: u1,u2,u3,u5; clicks after view: u1,u5; purchases: u1
    assert got == [(0, "view", 4), (1, "click", 2), (2, "purchase", 1)]


def test_retention_cohorts(spark):
    rows = [
        # u1: first day 01-01, active again 01-02 and 01-04
        (1, "2024-01-01 08:00:00", 1, "view"),
        (2, "2024-01-02 09:00:00", 1, "view"),
        (3, "2024-01-02 10:00:00", 1, "click"),   # same day: one row
        (4, "2024-01-04 09:00:00", 1, "view"),
        # u2: cohort 01-02 only
        (5, "2024-01-02 23:00:00", 2, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [(r["cohort_date"], r["day_offset"], r["users"])
           for r in ev.retention(df).collect()]
    assert got == [("2024-01-01", 0, 1), ("2024-01-01", 1, 1),
                   ("2024-01-01", 3, 1), ("2024-01-02", 0, 1)]


def test_windowed_counts_without_value_column(spark):
    """A value-less events frame aggregates n_events only — the select
    used to emit sum_value unconditionally and crash with
    UNRESOLVED_COLUMN."""
    df = spark.createDataFrame(
        [(100, "2024-01-01 00:05:00", "click"),
         (100, "2024-01-01 00:10:00", "click")],
        "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = ev.windowed_counts(df, window="1 hour").collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 2
    assert "sum_value" not in rows[0].asDict()


def test_sessionize_stream_all_null_values_sum_is_null(spark, tmp_path):
    """Batch SUM over an all-null group is NULL; the streaming twin
    must match (it used to fillna(0.0) and emit 0.0)."""
    src = str(tmp_path / "nullv_in")
    os.makedirs(src)
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, "click", None, ""),
         (2, "2024-01-01 00:10:00", 7, "click", None, "")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(os.path.join(src, "f1.parquet"))
    stream = spark.readStream.schema(df.schema).parquet(src + "/*.parquet")
    from tests.stream_util import await_terminated

    q = (ev.sessionize_stream(stream, gap_minutes=30,
                              idle_timeout_ms=None)
         .writeStream.format("memory").queryName("ev_nullv")
         .outputMode("update").trigger(availableNow=True).start())
    await_terminated(q, 120)
    rows = spark.table("ev_nullv").where("n_events = 2").collect()
    assert len(rows) == 1 and rows[0]["sum_value"] is None
    # batch parity
    b = ev.session_stats(df, gap_minutes=30).collect()
    assert b[0]["sum_value"] is None


def test_rrf_fusion_guards(spark):
    from ex_elasticlunr_spark.operators.hybrid import rrf_fusion

    with pytest.raises(ValueError, match="at least one"):
        rrf_fusion([])
    lst = spark.createDataFrame([("a", 1.0), ("b", 0.5)],
                                "docid string, score double")
    assert rrf_fusion([lst], top_n=0).count() == 0
