"""Streaming exact dedup — the continuous-ingest analogue of
``operators/dedup.exact_duplicates`` (task mandate: dedup for a
training-data pipeline; the batch operators cover the backfill, this
covers the live crawl feed).

``dedup_stream`` keeps the FIRST page per normalized-text hash using
``dropDuplicatesWithinWatermark``: the dedup state store holds one
entry per hash only within the event-time watermark horizon, so state
is BOUNDED (a plain ``dropDuplicates`` on a stream grows its state
forever — the streaming analogue of the round-1 collect_set hub OOM).
Late duplicates inside the horizon are dropped; duplicates farther
apart than the horizon deliberately pass (they are collapsed by the
batch canonicalization downstream — the standard lambda split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.operators.dedup import normalized_text


def dedup_stream(
    pages: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DataFrame in (with event-time ``ts_col``), first-seen
    rows out; adds the ``text_hash`` column the batch dedup suite keys
    on so downstream tables join both worlds on the same key."""
    hashed = pages.withColumn("text_hash", F.md5(normalized_text(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
