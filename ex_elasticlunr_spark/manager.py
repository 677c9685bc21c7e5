"""IndexManager: a named-index catalog over a warehouse directory — the
Spark equivalent of the reference's GenServer registry + storage facade
(manager/index_manager.ex:7-109, storage/disk.ex:52-60 ``load_all``).

Each index lives under ``<warehouse>/<name>/`` in the parquet layout
written by InvertedIndex.save; ``preload``/``list`` glob the warehouse
the way the reference's Disk provider globs ``*.index`` files.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

from pyspark.sql import SparkSession

from .index import Index


class IndexManager:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._loaded: Dict[str, Index] = {}

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def list(self) -> List[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.exists(os.path.join(self.warehouse, d, "manifest.json"))
        )

    def save(self, index: Index) -> "IndexManager":
        index.save(self._path(index.name))
        self._loaded[index.name] = index
        return self

    def get(self, name: str) -> Optional[Index]:
        if name in self._loaded:
            return self._loaded[name]
        path = self._path(name)
        if not os.path.exists(os.path.join(path, "manifest.json")):
            return None
        idx = Index.load(self.spark, path, name=name)
        self._loaded[name] = idx
        return idx

    def update(self, index: Index) -> "IndexManager":
        return self.save(index)

    def remove(self, name: str) -> "IndexManager":
        self._loaded.pop(name, None)
        shutil.rmtree(self._path(name), ignore_errors=True)
        return self

    def preload(self) -> Dict[str, Index]:
        """Load every stored index (application.ex:23-26 boot behavior)."""
        return {name: self.get(name) for name in self.list()}
