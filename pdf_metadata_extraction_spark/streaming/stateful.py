"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference has no streaming dataflow (SURVEY.md §2.8), but a 100 TB
ingestion pipeline does: this module provides the canonical custom
stateful operator for a WARC/crawl feed — **per-domain crawl
sessionization with dedup-aware counters**: for each domain, maintain
(pages_seen, distinct_fingerprints, last_ts); a gap of ``gap_seconds``
without pages closes the session and emits a summary row.

Batch-equivalent semantics are tested by driving the same operator with
``availableNow`` over a file source, so the state logic is pinned
without needing a long-lived stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_distinct_docs", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("fingerprints", T.ArrayType(T.StringType())),
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

GAP_SECONDS = 1800


def _sessionize(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update function: (domain,) groups of (ts, fingerprint)."""
    domain = key[0]
    if state.exists:
        session_id, n_pages, fps, first_us, last_us = state.get
        fps = set(fps)
    else:
        session_id, n_pages, fps, first_us, last_us = 0, 0, set(), None, None

    out_rows: list[dict[str, Any]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, fp in zip(pdf["ts"], pdf["fingerprint"]):
            us = int(ts.value // 1000)
            if last_us is not None and (us - last_us) > GAP_SECONDS * 1_000_000:
                out_rows.append(
                    dict(domain=domain, session_id=session_id, n_pages=n_pages,
                         n_distinct_docs=len(fps),
                         first_ts=pd.Timestamp(first_us * 1000),
                         last_ts=pd.Timestamp(last_us * 1000), closed=True)
                )
                session_id += 1
                n_pages, fps, first_us = 0, set(), None
            n_pages += 1
            fps.add(fp)
            first_us = us if first_us is None else first_us
            last_us = us

    state.update((session_id, n_pages, sorted(fps), first_us, last_us))
    if n_pages:
        out_rows.append(
            dict(domain=domain, session_id=session_id, n_pages=n_pages,
                 n_distinct_docs=len(fps),
                 first_ts=pd.Timestamp(first_us * 1000),
                 last_ts=pd.Timestamp(last_us * 1000), closed=False)
        )
    yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def crawl_sessions(stream: DataFrame) -> DataFrame:
    """stream(domain, ts, fingerprint) → per-domain session summaries.

    Streaming: ``applyInPandasWithState`` keeps (counters, fingerprint
    set) per domain across micro-batches; mega-domain state stays
    bounded because fingerprints are the *dedup* set, not the rows.
    """
    return (
        stream.groupBy("domain")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def pages_to_crawl_feed(pages: DataFrame) -> DataFrame:
    """Batch adapter: pages → (domain, ts, fingerprint) feed shape."""
    return pages.select(
        F.regexp_extract("url", r"^[a-z]+://([^/]+)/?", 1).alias("domain"),
        F.col("warc_ts").alias("ts"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fingerprint"),
    )
