"""Deterministic corpus sampling and per-stratum caps — the curation
operators a training-data pipeline runs between dedup/quality gates and
export (hold out an eval slice, bound any one domain's share of the
corpus).

Reference anchor: the reference trains on whatever samples a tenant
uploads (SURVEY.md §2.1 S7 sample cache); at web scale the corpus is
curated BEFORE training, and the two standard primitives are a
deterministic hash sample (same row set on every run and at any
parallelism — a `rand()` sample is neither) and a per-stratum cap (the
classic per-domain document cap that stops boilerplate-heavy
mega-domains from dominating a corpus).

Everything is pure expressions + one window; the hash is md5-derived
(portable: DuckDB computes the identical digest, so the driver
value-hash gate pins both operators bit-exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 1_000_000  # ppm granularity


def _hash_ppm(key: Column) -> Column:
    """Deterministic bucket in [0, 1e6): first 15 hex chars of md5 (60
    bits, fits a BIGINT exactly) mod 1e6 — identical in DuckDB via
    CAST(concat('0x', substr(md5(k), 1, 15)) AS BIGINT)."""
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        % SAMPLE_BUCKETS
    )


def hash_sample(
    df: DataFrame, key_col: str, rate_ppm: int, salt: str = ""
) -> DataFrame:
    """Keep rows whose md5 bucket of ``salt || key`` falls below
    ``rate_ppm`` (parts-per-million) — a deterministic ~rate sample
    that is STABLE across runs, partitionings and engines (the
    eval-holdout / debug-slice primitive; disjoint slices come from
    disjoint bucket ranges or different salts). Map-only, no shuffle;
    at 10^12 rows this is a scan-side filter."""
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return df.where(_hash_ppm(key) < rate_ppm)


def stratified_cap(
    df: DataFrame, stratum_col: str, id_col: str, cap: int
) -> DataFrame:
    """At most ``cap`` rows per stratum, selected by md5(id) order
    (deterministic random-but-stable pick, so a re-run or a different
    parallelism keeps the SAME rows — head-of-table picks would bias
    toward crawl order). The per-domain cap every web corpus applies
    so mega-domains can't dominate; one shuffle on the stratum key,
    AQE-split if a stratum is skew-heavy. Adds ``pick_rank`` (1-based
    within the stratum)."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= cap)
    )


def priority_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "es:",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum
    (Efraimidis & Spirakis 2006: rank by u^(1/w), keep the k largest)
    — the curation primitive when documents carry a quality/importance
    weight and the cap must prefer heavy rows without becoming a
    deterministic top-k by weight.

    Deterministic and cross-engine: u = (md5_ppm(salt||id)+1)/1e6, and
    instead of u^(1/w) (pow is not correctly rounded) rows rank by the
    order-equivalent ln(u)/w — ln rounded to 6dp the moment it is
    produced (the repo-wide discipline), then ONE IEEE division by the
    integer weight; ties broken by id. Rows with weight <= 0 are never
    sampled. Adds ``es_rank`` (1-based within the stratum).

    Scale shape: NEVER a window partitioned by the stratum (a
    mega-domain stratum with 10^9 rows would be one task — the
    schedule_frontier lesson). Instead: the two-pass global rank over
    (stratum, -score, id) — range partition, broadcast per-range
    prefixes, intra-range row_number — then each row's within-stratum
    rank is its global rank minus the stratum's min global rank + 1,
    computed with one map-side-combinable agg and an equi-join (NO
    driver-side per-stratum table, so the stratum COUNT is unbounded
    too, unlike the frontier's fixed slot set).
    """
    from pdf_metadata_extraction_spark.operators.packing import (
        global_rank,
    )

    u = (
        _hash_ppm(F.concat(F.lit(salt), F.col(id_col).cast("string"))) + 1
    ) / 1e6
    score = F.round(F.log(u), 6) / F.col(weight_col).cast("double")
    pos = df.where(F.col(weight_col) > 0).withColumn(
        "_neg_es", -score
    )
    ranked = global_rank(pos, [stratum_col, "_neg_es", id_col])
    base = ranked.groupBy(stratum_col).agg(
        F.min("rnk").alias("_base")
    )
    return (
        ranked.join(base, stratum_col)
        .withColumn(
            "es_rank", (F.col("rnk") - F.col("_base") + 1).cast("long")
        )
        .where(F.col("es_rank") <= k)
        .drop("_neg_es", "rnk", "_base")
    )
