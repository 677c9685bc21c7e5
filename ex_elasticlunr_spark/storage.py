"""Storage providers — the reference's pluggable storage facade
(storage.ex:1-34, storage/provider.ex) re-expressed for a parquet
warehouse: ``Disk`` persists/loads the InvertedIndex.save layout;
``Blackhole`` (storage/blackhole.ex:7-18) executes the full write plan
into Spark's ``noop`` sink (format("noop") — everything is computed,
nothing lands on disk), which keeps ingest benchmarks honest about
compute cost without charging for IO.

The IndexManager (manager.py) uses ``Disk`` by default; pass
``storage=Blackhole()`` for a write-discarding manager (the reference's
default provider is Blackhole, storage.ex:32).
"""

from __future__ import annotations

import os
import shutil
from typing import List

from pyspark.sql import SparkSession

from .index import Index


class Disk:
    """Parquet-warehouse provider (reference storage/disk.ex:22-60)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def load_all(self, spark: SparkSession) -> List[str]:
        """Names of every stored index (disk.ex:52-60 ``load_all`` globs
        ``*.index``; here: subdirs with a manifest)."""
        return sorted(
            d for d in os.listdir(self.directory)
            if os.path.exists(os.path.join(self.directory, d, "manifest.json"))
        )

    def write(self, index: Index) -> "Disk":
        inv = index.inverted
        path = self._path(index.name)
        if (inv is not None and inv._path == path
                and (inv._delta_adds or inv._delta_tombs is not None)):
            # the manager round-trip (get -> add/update/remove -> save)
            # appends a GENERATION instead of rewriting the warehouse
            # (build/deltas.py); call index.compact() to fold back
            inv.save_delta()
        else:
            index.save(path)
        return self

    def read(self, spark: SparkSession, name: str) -> Index:
        path = self._path(name)
        if not os.path.exists(os.path.join(path, "manifest.json")):
            raise FileNotFoundError(f"no index named {name!r} in warehouse")
        return Index.load(spark, path, name=name)

    def delete(self, name: str) -> "Disk":
        shutil.rmtree(self._path(name), ignore_errors=True)
        return self


class Blackhole:
    """Noop provider (storage/blackhole.ex:7-18): ``write`` runs the
    full build/write plan into the Spark noop sink (compute happens,
    bytes are discarded), ``read`` errors, ``delete`` and ``load_all``
    are no-ops."""

    def load_all(self, spark: SparkSession) -> List[str]:
        return []

    def write(self, index: Index) -> "Blackhole":
        for df in (index.inverted.postings, index.inverted.doc_stats,
                   index.inverted.field_stats, index.inverted.term_stats,
                   index.inverted.docs):
            df.write.format("noop").mode("overwrite").save()
        return self

    def read(self, spark: SparkSession, name: str) -> Index:
        raise FileNotFoundError("can't read index from blackhole")

    def delete(self, name: str) -> "Blackhole":
        return self
