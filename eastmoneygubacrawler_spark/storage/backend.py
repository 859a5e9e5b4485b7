"""Atomic multi-table snapshot store (Iceberg-fallback).

No Iceberg jars are available offline (SURVEY.md §7.3), so this reproduces the
snapshot/commit semantics the north rule needs on plain Parquet:

- each round writes every engine table (posts, seen, frontier, crawl_log) to a
  round-numbered directory,
- a single manifest JSON listing all table paths is then moved into place with
  ``os.replace`` — one atomic pointer flip commits the whole round,
- a killed run restarts from the last committed manifest: rounds are
  idempotent, so replaying the interrupted round yields the identical state
  (test_resume.py).

On a real cluster the same interface maps 1:1 onto Iceberg
(``df.writeTo(...).append()`` / snapshot metadata); only this module changes.

Reference analog: the ``start_code`` resume cursor (core/scheduler.py:206-217)
— strictly weaker than this (it loses in-flight round state).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_current.json")

    def manifest(self) -> dict | None:
        try:
            with open(self._pointer) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def current_round(self) -> int:
        m = self.manifest()
        return -1 if m is None else m["round"]

    def commit(self, round_id: int, tables: dict[str, DataFrame]) -> dict:
        """Write all tables for ``round_id`` then atomically flip the pointer.

        Table writes run as concurrent Spark jobs (driver threads) — the
        commit wall is max(write) not sum(write); atomicity comes solely from
        the pointer flip, so concurrency is safe."""
        from concurrent.futures import ThreadPoolExecutor

        paths = {}

        def _write(item):
            name, df = item
            path = os.path.join(self.root, "data", name, f"r{round_id:06d}")
            df.write.mode("overwrite").parquet(path)
            return name, path

        with ThreadPoolExecutor(max_workers=len(tables)) as pool:
            for name, path in pool.map(_write, tables.items()):
                paths[name] = path
        manifest = {"round": round_id, "tables": paths, "committed_at": time.time()}
        tmp = self._pointer + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer)  # atomic commit point
        return manifest

    def load(self, spark: SparkSession, table: str) -> DataFrame | None:
        m = self.manifest()
        if m is None or table not in m["tables"]:
            return None
        return spark.read.parquet(m["tables"][table])
