"""Mergeable cardinality sketches (HyperLogLog with explicit integer
registers) — count-distinct at 100 TB without a global distinct shuffle.

Reference anchor: the reference counts distinct option/language sets
per tenant eagerly (SURVEY.md §2 A3, `plans/lineage.py` stats); at web
scale "distinct URLs per host" / "distinct hosts per TLD" over 10^12
rows cannot afford `COUNT(DISTINCT)` (a full shuffle of every distinct
value). The standard answer is a register sketch: constant state per
group (m = 2^p registers), map-side combinable (`max` per register),
and MERGEABLE — per-day / per-partition sketches union by taking the
register-wise max, so yesterday's corpus is never rescanned.

Design (all integer until the final estimate, so the driver's
value-hash oracle pins both engines bit-exactly):

- 60-bit portable hash: first 15 hex chars of md5 (identical in DuckDB
  via ``CAST(concat('0x', substr(md5(v),1,15)) AS BIGINT)``).
- bucket = h % m, w = h div m ∈ [0, 2^(60-p)).
- rho(w) = (60-p) - bit_length(w) + 1, with rho(0) = 61-p; bit_length
  is ``length(conv(w, 10, 2))`` on Spark == ``length(bin(w))`` on
  DuckDB (both render minimal binary, '0' for zero — CASE'd anyway).
- registers: groupBy(keys, bucket).agg(max(rho)) — partial-aggregate
  friendly; absent buckets are implicit zero registers.
- estimate: S = Σ 2^(rmax - M_j) as an exact BIGINT (order-independent
  integer sum; max m·2^rmax = 2^61 fits), then one double division
  against a python-computed literal alpha·m²·2^rmax (long→double cast
  and IEEE division are correctly-rounded on both engines, so the
  quotient is bit-identical). Small-range (linear-counting) correction
  uses ln rounded to 6dp — the one non-correctly-rounded primitive.

Everything is expressions + two hash aggregates; no window, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60


def _alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash60(value: Column, salt: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), value.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def hll_registers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 8,
    salt: str = "",
) -> DataFrame:
    """Build per-key HLL registers: (keys..., bucket, register).

    One map-only hash per row, then ONE hash aggregate keyed on
    (keys, bucket) — max is map-side combinable, so shuffle volume is
    bounded by m rows per key per map task regardless of input size.
    Absent buckets mean register 0 (handled by the estimator); rows
    with a NULL value are skipped (NULL is not a member).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    m = 1 << p
    h = _hash60(F.col(value_col), salt)
    base = df.where(F.col(value_col).isNotNull()).select(
        *key_cols, h.alias("_h60")
    )
    maxrho = HASH_BITS - p + 1
    base = base.select(
        *key_cols,
        (F.col("_h60") % m).cast("int").alias("bucket"),
        F.expr(f"_h60 div {m}").alias("_w"),
    ).select(
        *key_cols,
        "bucket",
        F.when(F.col("_w") == 0, F.lit(maxrho))
        .otherwise(
            F.lit(maxrho) - F.length(F.conv(F.col("_w").cast("string"), 10, 2))
        )
        .cast("int")
        .alias("_rho"),
    )
    return base.groupBy(*key_cols, "bucket").agg(
        F.max("_rho").alias("register")
    )


def merge_registers(*sketches: DataFrame) -> DataFrame:
    """Union sketches over the SAME key/p: register-wise max. This is
    the whole point of a sketch — per-day (or per-partition) register
    tables merge in one tiny aggregate; the underlying corpora are
    never rescanned. Keys/bucket come from the inputs' shared schema.
    """
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("register",)]
    return out.groupBy(*keys).agg(F.max("register").alias("register"))


def hll_estimate(
    registers: DataFrame, key_cols: list[str], p: int = 8
) -> DataFrame:
    """Estimate distinct counts from a register table.

    Returns (keys..., zero_registers, est) where ``est`` is the HLL
    estimate (3dp double) with the standard linear-counting correction
    for the small range (raw <= 2.5m and any zero register). The sum
    S = Σ 2^(rmax - M_j) is an exact BIGINT so the aggregate is
    order-independent; only the final division is floating point, and
    it is correctly rounded from identical integer inputs on both
    engines.
    """
    m = 1 << p
    rmax = HASH_BITS - p + 1
    num = _alpha(m) * m * m * float(1 << rmax)
    per_key = registers.groupBy(*key_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - register)")
        ).alias("_sp"),
        F.count(F.lit(1)).alias("_present"),
    )
    v = (F.lit(m) - F.col("_present")).cast("long")
    s_total = F.col("_sp") + v * F.lit(1 << rmax).cast("long")
    raw = F.lit(num) / s_total.cast("double")
    lc = F.lit(float(m)) * F.round(
        F.log(F.lit(float(m)) / v.cast("double")), 6
    )
    return per_key.select(
        *key_cols,
        v.alias("zero_registers"),
        F.round(
            F.when((raw <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(raw), 3
        ).alias("est"),
    )


def distinct_estimate(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 8,
    salt: str = "",
) -> DataFrame:
    """One-shot: registers + estimate (the common non-incremental
    call). Constant memory per key; two partial-aggregated shuffles of
    at most m rows per key."""
    return hll_estimate(
        hll_registers(df, key_cols, value_col, p=p, salt=salt),
        key_cols,
        p=p,
    )
