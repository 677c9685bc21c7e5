"""IndexManager: a named-index catalog over a warehouse directory — the
Spark equivalent of the reference's GenServer registry + storage facade
(manager/index_manager.ex:7-109, storage/disk.ex:52-60 ``load_all``).

Each index lives under ``<warehouse>/<name>/`` in the parquet layout
written by InvertedIndex.save; ``preload``/``list`` glob the warehouse
the way the reference's Disk provider globs ``*.index`` files.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import SparkSession

from .index import Index


class IndexManager:
    def __init__(self, spark: SparkSession, warehouse: str, storage=None):
        from .storage import Disk

        self.spark = spark
        self.warehouse = warehouse
        self.storage = storage or Disk(warehouse)
        self._loaded: Dict[str, Index] = {}

    def list(self) -> List[str]:
        return self.storage.load_all(self.spark)

    def save(self, index: Index) -> "IndexManager":
        self.storage.write(index)
        self._loaded[index.name] = index
        return self

    def get(self, name: str) -> Optional[Index]:
        if name in self._loaded:
            return self._loaded[name]
        try:
            idx = self.storage.read(self.spark, name)
        except FileNotFoundError:
            return None
        self._loaded[name] = idx
        return idx

    def update(self, index: Index) -> "IndexManager":
        return self.save(index)

    def remove(self, name: str) -> "IndexManager":
        self._loaded.pop(name, None)
        self.storage.delete(name)
        return self

    def preload(self) -> Dict[str, Index]:
        """Load every stored index (application.ex:23-26 boot behavior)."""
        return {name: self.get(name) for name in self.list()}
