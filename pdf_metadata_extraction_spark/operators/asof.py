"""As-of join: attach to each probe row the latest snapshot row with
snapshot_ts <= probe_ts (backward-inclusive), per key.

Reference anchor: the reference's "predictions join back onto the
latest trained model" is an implicit as-of (SURVEY.md §2 J5 / D3
stale-model TTL — `plans/model_store.py`); on web corpora the same
primitive answers "which page VERSION was live when this benchmark
snapshot was taken" (decontamination timelines), "which robots.txt
governed this fetch", and "what was the exchange rate / config at
event time". Spark has no ASOF JOIN; DuckDB does (the oracle uses it),
so this module is the composition-of-existing-ops implementation.

Two physical strategies, identical results (pinned by test):

- ``asof_join`` (baseline): union probes and snapshots with a marker,
  ONE window per key ordered by (ts, is_snap DESC, tiebreak) and a
  ``last(value, ignorenulls=True)`` carry-forward. Correct and simple,
  but a window partition holds ALL of a key's rows — a mega-key (one
  host probed 10^9 times) becomes one task.
- ``asof_join_bucketed`` (scale path): time is cut into fixed buckets.
  Within-bucket carry uses the same window but partitioned by
  (key, bucket) — partition size is bounded by a key's rows per
  bucket, which the caller controls via ``bucket_width``. Cross-bucket
  carry travels through a BUCKET-LEVEL spine (one row per (key,
  bucket) — #keys × #buckets rows, tiny), where a second window finds
  the latest snapshot of any EARLIER bucket. No frontier-sized
  partition anywhere; this is the same two-level discipline as
  `packing.global_rank` applied to time instead of rank.

Ties: a snapshot AT the probe's exact ts matches (inclusive); two
snapshots at the same (key, ts) resolve by the greater ``tiebreak``
(callers pass a unique id). All timestamps are integer epochs
(micros/seconds — caller's choice); see the build-gotchas memory on
float/timestamp flooring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _aligned_union(
    probes: DataFrame,
    snapshots: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
    probe_cols: list[str],
) -> DataFrame:
    p = probes.select(
        *key_cols,
        F.col(ts_col).cast("long").alias("_ts"),
        F.lit(0).alias("_is_snap"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.lit(None).cast(snapshots.schema[c].dataType).alias(c) for c in value_cols],
        *probe_cols,
    )
    s = snapshots.select(
        *key_cols,
        F.col(ts_col).cast("long").alias("_ts"),
        F.lit(1).alias("_is_snap"),
        F.col(tiebreak_col).cast("long").alias("_tb"),
        *value_cols,
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_cols],
    )
    return p.unionByName(s)


def asof_join(
    probes: DataFrame,
    snapshots: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
    probe_cols: list[str],
) -> DataFrame:
    """Baseline union-marker as-of. Output: key_cols + probe ts +
    probe_cols + value_cols (NULL when no snapshot precedes). One
    shuffle, one window per key — see module docstring for the
    mega-key caveat and the bucketed variant."""
    u = _aligned_union(
        probes, snapshots, key_cols, ts_col, tiebreak_col,
        value_cols, probe_cols,
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts"), F.col("_is_snap").desc(), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry ONE struct so multi-column values stay atomic (all columns
    # from the SAME snapshot, even when some are NULL)
    snap_struct = F.when(
        F.col("_is_snap") == 1, F.struct(*[F.col(c) for c in value_cols])
    )
    carried = u.select(
        *key_cols,
        "_ts",
        "_is_snap",
        *probe_cols,
        F.last(snap_struct, ignorenulls=True).over(w).alias("_v"),
    )
    return carried.where(F.col("_is_snap") == 0).select(
        *key_cols,
        F.col("_ts").alias(ts_col),
        *probe_cols,
        *[F.col(f"_v.{c}").alias(c) for c in value_cols],
    )


def asof_join_bucketed(
    probes: DataFrame,
    snapshots: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
    probe_cols: list[str],
    bucket_width: int,
) -> DataFrame:
    """Scale-safe as-of: window partitions are (key, time-bucket), so
    no partition outgrows a key's per-bucket row count; cross-bucket
    state rides a #keys × #buckets spine. Result-identical to
    ``asof_join`` (pinned by test)."""
    if int(bucket_width) < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    u = _aligned_union(
        probes, snapshots, key_cols, ts_col, tiebreak_col,
        value_cols, probe_cols,
    ).withColumn("_bkt", F.expr(f"_ts div {int(bucket_width)}"))

    # within-bucket carry: bounded window partitions. The bucket-top
    # snapshot (max struct over the whole partition) is computed in the
    # SAME (key, bucket) window pass — the spine below is then a rollup
    # of this one shuffled table instead of two more scans of ``u``
    # (old shape: a separate where+groupBy for the bucket tops plus a
    # distinct+join for the spine — three passes over the union; round
    # 7, guide §2.4: every branch now reads the one reused exchange,
    # and column pruning drops whichever window column a branch does
    # not use).
    w_in = (
        Window.partitionBy(*key_cols, "_bkt")
        .orderBy(F.col("_ts"), F.col("_is_snap").desc(), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*key_cols, "_bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    snap_struct = F.when(
        F.col("_is_snap") == 1, F.struct(*[F.col(c) for c in value_cols])
    )
    # latest snapshot of the bucket: max(struct) — order-independent,
    # (ts, tiebreak) leads the struct so the value payload never
    # decides the max; NULL when the bucket holds no snapshot
    top_struct = F.when(
        F.col("_is_snap") == 1,
        F.struct(
            F.col("_ts"),
            F.col("_tb"),
            F.struct(*[F.col(c) for c in value_cols]).alias("_v"),
        ),
    )
    within = u.select(
        *key_cols,
        "_bkt",
        "_ts",
        "_is_snap",
        *probe_cols,
        F.last(snap_struct, ignorenulls=True).over(w_in).alias("_vin"),
        F.max(top_struct).over(w_all).alias("_top"),
    )

    # bucket-level spine: one row per (key, bucket) with the bucket's
    # latest snapshot (NULL if none), rolled up from the window pass,
    # then carry the latest non-null snapshot of any EARLIER bucket
    # forward — the carry window table is #keys × #buckets rows.
    spine = within.groupBy(*key_cols, "_bkt").agg(
        F.max("_top").alias("_top")
    )
    w_carry = (
        Window.partitionBy(*key_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.select(
        *key_cols,
        "_bkt",
        F.last(F.col("_top"), ignorenulls=True).over(w_carry).alias("_carry"),
    )

    probes_out = within.where(F.col("_is_snap") == 0).join(
        carry, [*key_cols, "_bkt"], "left"
    )
    # prefer the within-bucket match; else the carried-in snapshot
    pick = F.coalesce(F.col("_vin"), F.col("_carry._v"))
    return probes_out.select(
        *key_cols,
        F.col("_ts").alias(ts_col),
        *probe_cols,
        *[pick.getField(c).alias(c) for c in value_cols],
    )
