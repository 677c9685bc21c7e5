"""Shared helper: a bounded (availableNow) test stream must TERMINATE.

Thin re-export — the real guard lives in the package
(ex_elasticlunr_spark.streaming.ingest.await_terminated) so the gate
battery in __spark_entry__.py uses the exact same definition.
"""

from __future__ import annotations

from ex_elasticlunr_spark.streaming.ingest import await_terminated

__all__ = ["await_terminated"]
