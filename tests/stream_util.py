"""Shared helper: a bounded (availableNow) test stream must TERMINATE.

awaitTermination(timeout) returning False is not a pass — the query is
still scheduling micro-batches in the SESSION-SCOPED SparkSession and
keeps doing so for the rest of the suite (the sessionize_stream
processing-time-timer leak slowed every later test 7-15x before this
existed). Stop the query, then fail loudly.
"""

from __future__ import annotations


def await_terminated(q, secs: int) -> None:
    if not q.awaitTermination(secs):
        q.stop()
        q.awaitTermination(60)
        raise AssertionError(
            f"stream {q.name!r} still running after {secs}s — "
            "bounded availableNow replays must drain and terminate")
