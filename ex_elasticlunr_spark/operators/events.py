"""Event-stream operators: sessionization + windowed aggregation.

The reference engine indexes static documents; a transcripts/telemetry
pipeline at 100 TB also carries an append-only event log (the testdata
``events`` table: event_id, ts, user_id, event_type, value, props).
These operators give that log the two canonical time-series shapes:

* ``sessionize`` / ``session_stats`` — gap-based sessions per user
  (a 30-min silence starts a new session), the standard clickstream /
  conversation-boundary primitive;
* ``windowed_counts`` — tumbling event-time windows per event type;
* ``funnel`` / ``retention`` — the two canonical behavioral rollups:
  strict-order conversion funnels (a min-ts join cascade that narrows
  monotonically) and first-active-date cohort retention (one distinct
  + one self-join on the user key).

Batch and streaming variants share semantics: the streaming
sessionizer (``sessionize_stream``) is an ``applyInPandasWithState``
custom stateful operator and the streaming window aggregation
(``windowed_counts_stream``) is a watermarked built-in windowed agg —
both tested for parity against the batch plans over the same rows
(tests/test_events.py).

Scale notes (100 TB event log, 1000 executors):
  * sessionize shuffles ONCE on user_id — high-cardinality,
    hash-uniform keys, so no skew mitigation needed; the per-user sort
    inside the window is bounded by one user's history (and Spark
    sorts partitions, not the globe);
  * session_stats aggregates on (user_id, session_idx) — same
    partitioning as the window, so AQE coalesces without a second
    shuffle;
  * windowed_counts is a plain groupBy with map-side partial
    aggregation: output is #windows x #event_types, tiny;
  * the streaming sessionizer keeps O(1) state per user (running
    aggregates only, never the event list) and expires idle users via
    processing-time timeout, so state size is bounded by the active
    user set, not the log.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SESSION_GAP_MIN = 30.0


def _epoch_s(col):
    """Epoch seconds for TIMESTAMP or TIMESTAMP_NTZ columns (Spark 4
    forbids a direct NTZ->double cast; NTZ->LTZ->double is legal and
    gap/duration arithmetic is timezone-invariant)."""
    return col.cast("timestamp_ltz").cast("double")


def sessionize(
    events: DataFrame,
    gap_minutes: float = SESSION_GAP_MIN,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a gap-based session to every event.

    A new session starts when the user's inter-event silence exceeds
    ``gap_minutes``. Adds ``session_idx`` (0-based per user, in time
    order) and ``session_id`` ("<user>-<idx>").

    One shuffle (hash on user_col for the window sort); everything else
    is narrow. Ties on ts break by event_id so the assignment is
    deterministic.
    """
    order = [F.col(ts_col)] + (
        [F.col("event_id")] if "event_id" in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = float(gap_minutes) * 60.0
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | (_epoch_s(F.col(ts_col)) - _epoch_s(prev) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_new_s", new_session)
        .withColumn("session_idx",
                    (F.sum("_new_s").over(w) - F.lit(1)).cast("long"))
        .drop("_new_s")
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(user_col).cast("string"),
                        F.col("session_idx").cast("string")),
        )
    )


def session_stats(
    events: DataFrame,
    gap_minutes: float = SESSION_GAP_MIN,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Per-session aggregates: start/end, event count, distinct event
    types, value sum, duration. The groupBy keys on (user, session_idx)
    — the same partitioning the sessionize window produced, so the agg
    adds no second wide shuffle under AQE."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
    ]
    if value_col is not None and value_col in events.columns:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    out = s.groupBy(F.col(user_col), F.col("session_idx"), F.col("session_id")) \
        .agg(*aggs)
    return out.withColumn(
        "duration_sec",
        F.round(_epoch_s(F.col("session_end"))
                - _epoch_s(F.col("session_start")), 6),
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    by: str = "event_type",
    ts_col: str = "ts",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Tumbling event-time windows per ``by`` key: n_events + value sum.

    Pure groupBy with map-side partial aggregation; output cardinality
    is #windows x #keys. The identical expression works under
    Structured Streaming once a watermark is attached
    (``windowed_counts_stream``)."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None and value_col in events.columns:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(by))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            by,
            # mirror the aggs guard exactly: sum_value exists only when
            # the value column does (a value-less events frame used to
            # crash here with UNRESOLVED_COLUMN)
            *[c for c in ("n_events", "sum_value")
              if c == "n_events"
              or (value_col is not None and value_col in events.columns)],
        )
    )


def windowed_counts_stream(
    stream_df: DataFrame,
    window: str = "1 hour",
    by: str = "event_type",
    ts_col: str = "ts",
    value_col: Optional[str] = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``windowed_counts``: watermarked tumbling
    windows. Late events inside the watermark update their window;
    events later than it are dropped and the window finalizes (append
    mode emits exactly-once per closed window)."""
    return windowed_counts(
        stream_df.withWatermark(ts_col, watermark),
        window=window, by=by, ts_col=ts_col, value_col=value_col,
    )


# ---------------------------------------------------------------------------
# streaming sessionizer: applyInPandasWithState custom stateful operator
# ---------------------------------------------------------------------------

_SESSION_OUT_SCHEMA = (
    "user_id bigint, session_idx bigint, session_id string, "
    "session_start timestamp, session_end timestamp, n_events bigint, "
    "sum_value double"
)
# per-user running state: next session ordinal + the OPEN session's
# aggregates (O(1) per user — never the event list). nv counts the
# session's NON-NULL values so an all-null session emits sum_value
# NULL exactly like batch SUM.
_SESSION_STATE_SCHEMA = (
    "next_idx bigint, start_us bigint, end_us bigint, n bigint, "
    "sv double, nv bigint"
)


def sessionize_stream(
    stream_df: DataFrame,
    gap_minutes: float = SESSION_GAP_MIN,
    idle_timeout_ms: Optional[int] = 60_000,
):
    """Custom stateful streaming operator: gap-based sessions per user
    via ``applyInPandasWithState``.

    Emits, in UPDATE mode, the current aggregates of every session a
    micro-batch touches or closes — the LAST emission per session_id is
    its final row, and equals the batch ``session_stats`` output for
    the same events (parity pinned in tests/test_events.py). After
    ``idle_timeout_ms`` of processing-time silence an idle user's open
    session is flushed as a PROGRESS emission — the state (including
    the open session and the session ordinal) is retained, so a user
    returning within the EVENT-time gap continues the same session
    exactly like batch (a processing-time pause never splits a
    session, and session_ids never restart at 0). State per user is a
    6-field scalar tuple — bounded by user cardinality, the same bound
    as any per-user aggregation.

    ``idle_timeout_ms=None`` disables the idle flush (NoTimeout). Use
    it for BOUNDED replays (``trigger(availableNow=True)``): with
    processing-time timeouts armed, availableNow never considers the
    query drained — measured on this Spark, the pending timers keep
    scheduling empty micro-batches forever without ever firing
    (stateRows constant, hasTimedOut never set), so the query runs
    until killed and leaks per-batch jobs into the session. In update
    mode the open tail session was already emitted by its data batch,
    so the bounded result is identical without the timer flush; a LIVE
    stream (processingTime trigger) keeps the timeout to flush idle
    users.

    Input must carry (user_id, ts, value); shuffles once on user_id —
    the same key/skew shape as the batch window.
    """
    import pandas as pd  # noqa: F401 (arrow batches arrive as pandas)
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_us = int(gap_minutes * 60.0 * 1e6)

    def fn(
        key: Tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user,) = key
        if state.hasTimedOut:
            # idle user: PROGRESS-flush the open session but keep the
            # state — removing it would restart session_idx at 0 for a
            # returning user (colliding session_ids) and split a
            # session whose pause was shorter than the EVENT-time gap.
            # No new timeout is armed (nothing changes while idle); the
            # user's next event re-arms it.
            nxt, start_us, end_us, n, sv, nv = state.get
            yield pd.DataFrame(
                {"user_id": [user], "session_idx": [nxt - 1],
                 "session_id": [f"{user}-{nxt - 1}"],
                 "session_start": [pd.Timestamp(start_us, unit="us")],
                 "session_end": [pd.Timestamp(end_us, unit="us")],
                 "n_events": [n],
                 "sum_value": [round(sv, 6) if nv else None]})
            return

        if state.exists:
            nxt, start_us, end_us, n, sv, nv = state.get
            open_idx = nxt - 1
        else:
            nxt, start_us, end_us, n, sv, nv = 0, None, None, 0, 0.0, 0
            open_idx = None

        rows = []  # emitted (closed or updated) session rows
        # ONE global sort: a >maxRecordsPerBatch group arrives as
        # multiple Arrow chunks with no cross-chunk ordering — chunk-
        # local sorts would process out of time order and derive wrong
        # session boundaries. Materializing the group's micro-batch
        # rows is bounded by per-user batch volume, not the stream.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0])
            pdf = pdf.sort_values(["ts", "event_id"]
                                  if "event_id" in pdf.columns else ["ts"])
            if pdf["ts"].dtype.kind == "M":
                # unit-safe: datetime64 may arrive as ns or us off Arrow
                ts_us = pd.Series(
                    pdf["ts"].values.astype("datetime64[us]").astype("int64"),
                    index=pdf.index)
            else:
                ts_us = pdf["ts"].astype("int64")
            vals = pdf["value"] if "value" in pdf.columns \
                else pd.Series(float("nan"), index=pdf.index)
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                has_v = v is not None and v == v  # non-null, non-NaN
                fv = float(v) if has_v else 0.0
                if open_idx is None or t - end_us > gap_us:
                    if open_idx is not None:
                        rows.append((user, open_idx, start_us, end_us,
                                     n, sv, nv))
                    open_idx, nxt = nxt, nxt + 1
                    start_us, end_us, n = t, t, 1
                    sv, nv = fv, int(has_v)
                else:
                    end_us, n = max(end_us, t), n + 1
                    sv, nv = sv + fv, nv + int(has_v)
        if open_idx is not None:
            # update-mode emission of the still-open session
            rows.append((user, open_idx, start_us, end_us, n, sv, nv))
            state.update((nxt, start_us, end_us, n, sv, nv))
            if idle_timeout_ms and chunks:
                state.setTimeoutDuration(idle_timeout_ms)
        if rows:
            yield pd.DataFrame(
                {"user_id": [r[0] for r in rows],
                 "session_idx": [r[1] for r in rows],
                 "session_id": [f"{r[0]}-{r[1]}" for r in rows],
                 "session_start": [pd.Timestamp(r[2], unit="us") for r in rows],
                 "session_end": [pd.Timestamp(r[3], unit="us") for r in rows],
                 "n_events": [r[4] for r in rows],
                 # all-null-value session -> NULL, matching batch SUM
                 "sum_value": [round(r[5], 6) if r[6] else None
                               for r in rows]})

    return stream_df.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if idle_timeout_ms else GroupStateTimeout.NoTimeout),
    )


# ---------------------------------------------------------------------------
# funnel + retention: the two canonical behavioral-analytics rollups
# ---------------------------------------------------------------------------


def funnel(
    events: DataFrame,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-step funnel: for each step i, the number of users who
    performed steps[0..i] in STRICT timestamp order (a later step's
    event must be strictly AFTER the user's earliest qualifying event
    of the previous step — equal timestamps do not chain, so the result
    is deterministic under ties). Returns
    DataFrame(step_idx int, step string, users bigint), one row per
    step, ordered by step_idx — the classic conversion funnel.

    Plan shape (100 TB rationale): step 0 is one filtered groupBy on
    the user key (hash-uniform, no skew); each later step is a filtered
    scan joined against the PREVIOUS step's per-user min-timestamp
    relation — funnels narrow monotonically, so every join's right side
    shrinks and AQE turns the tail joins into broadcasts. No windows
    over whole user histories, no per-user event-list materialization.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts = []
    prev = None  # per-user min ts of the previous step
    for i, step in enumerate(steps):
        cur = events.where(F.col(type_col) == step)
        if prev is not None:
            cur = (cur.join(prev, user_col)
                      .where(F.col(ts_col) > F.col("_prev_ts")))
        cur = (cur.groupBy(user_col)
                  .agg(F.min(ts_col).alias("_prev_ts")))
        counts.append(cur.agg(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("users")))
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("step_idx")


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users are cohorted by their FIRST active
    calendar date; for every (cohort_date, day_offset) the count of
    cohort users active day_offset days after their first day (offset
    0 is the cohort size). Returns DataFrame(cohort_date string,
    day_offset int, users bigint) — dates projected as 'yyyy-MM-dd'
    strings so the result hashes identically across engines.

    Plan shape: one distinct over (user, date) — map-side partial —
    then a per-user min and one self-join on the user key, then a
    count per (cohort, offset): two user-keyed shuffles total, output
    cardinality #cohorts x #offsets. No windows, no skew (user keys
    are hash-uniform; a celebrity user still contributes one row per
    active day, not per event)."""
    act = (events.select(F.col(user_col).alias("u"),
                         F.to_date(ts_col).alias("d"))
                 .distinct())
    first = act.groupBy("u").agg(F.min("d").alias("d0"))
    return (act.join(first, "u")
               .groupBy(F.col("d0").cast("string").alias("cohort_date"),
                        F.datediff("d", "d0").cast("int")
                         .alias("day_offset"))
               .agg(F.count(F.lit(1)).alias("users"))
               .orderBy("cohort_date", "day_offset"))
