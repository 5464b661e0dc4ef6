"""Consume-once semantics recast as high-watermark incremental scans
(SURVEY.md §2.1 S5, §2.6 D1).

Reference analogue: Mongo ``find(filter)`` + ``delete_many(ids)`` —
read-and-delete per tenancy (/root/reference/src/adapters/
MongoPersistenceRepository.py:52-92, pinned by
src/tests/test_app.py:501-547: a second read returns nothing).

A destructive read is a queue idiom, not a data-plane need; the Spark
recast keeps tables append-only and tracks a per-(run, extraction,
collection) high-watermark over a monotonically increasing ``seq``
column. ``consume`` returns exactly the rows past the watermark and
advances it — same observable semantics (second consume → empty),
without deletes, so the table stays time-travelable (Iceberg snapshots
in production).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class WatermarkStore:
    """Tiny JSON-file watermark registry (driver-side; an Iceberg table
    or a metastore property in production)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as fh:
                return json.load(fh)
        return {}

    def get(self, key: str) -> int:
        return int(self._load().get(key, -1))

    def set(self, key: str, value: int) -> None:
        data = self._load()
        data[key] = int(value)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as fh:
            json.dump(data, fh)


def consume(
    df: DataFrame,
    store: WatermarkStore,
    run_name: str,
    extraction_name: str,
    collection: str,
    seq_col: str = "seq",
) -> DataFrame:
    """Tenancy filter (F1) + watermark predicate; advances the watermark.

    The tenancy predicate prunes partitions; the seq predicate is pushed
    to the scan (both show up in PushedFilters).
    """
    key = f"{run_name}/{extraction_name}/{collection}"
    wm = store.get(key)
    batch = df.where(
        (F.col("run_name") == run_name)
        & (F.col("extraction_name") == extraction_name)
        & (F.col(seq_col) > wm)
    )
    new_max = batch.agg(F.max(seq_col).alias("m")).collect()[0]["m"]
    if new_max is not None:
        store.set(key, new_max)
    return batch
