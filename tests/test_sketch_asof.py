"""HLL register sketches (sketch.py) and as-of joins (asof.py)."""

import re

import pyspark.sql.functions as F

from pdf_metadata_extraction_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
)
from pdf_metadata_extraction_spark.operators.sketch import (
    distinct_estimate,
    hll_estimate,
    hll_registers,
    merge_registers,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------- sketch


def _members(spark, spec):
    """spec: {key: n_distinct}; each value appears 1-3 times."""
    rows = []
    for key, n in spec.items():
        for i in range(n):
            for rep in range(1 + (i % 3)):
                rows.append((key, f"{key}/item-{i}"))
    return spark.createDataFrame(rows, "grp string, member string")


def test_hll_estimate_accuracy(spark):
    df = _members(spark, {"big": 2000, "mid": 300, "tiny": 3})
    est = {
        r["grp"]: (r["est"], r["zero_registers"])
        for r in distinct_estimate(df, ["grp"], "member", p=8).collect()
    }
    # p=8 → ~6.5% standard error; allow 3 sigma
    assert abs(est["big"][0] - 2000) / 2000 < 0.20, est
    assert abs(est["mid"][0] - 300) / 300 < 0.20, est
    # tiny cardinality lands in the linear-counting branch: near exact
    assert est["tiny"][1] > 0
    assert abs(est["tiny"][0] - 3) < 1.0, est


def test_hll_merge_equals_whole_corpus_sketch(spark):
    """Register-wise max over per-slice sketches == the sketch of the
    union — the mergeability contract that lets per-day sketches
    combine without rescanning yesterday's corpus."""
    whole = _members(spark, {"g": 500})
    a = whole.where(F.md5("member").startswith("a") | (F.length("member") % 2 == 0))
    b = whole.subtract(a)
    merged = merge_registers(
        hll_registers(a, ["grp"], "member", p=6),
        hll_registers(b, ["grp"], "member", p=6),
    )
    direct = hll_registers(whole, ["grp"], "member", p=6)
    assert merged.subtract(direct).count() == 0
    assert direct.subtract(merged).count() == 0
    e1 = hll_estimate(merged, ["grp"], p=6).collect()[0]["est"]
    e2 = hll_estimate(direct, ["grp"], p=6).collect()[0]["est"]
    assert e1 == e2


def test_hll_registers_duplicate_invariant(spark):
    df = _members(spark, {"g": 120})
    doubled = df.unionAll(df)
    r1 = hll_registers(df, ["grp"], "member", p=5)
    r2 = hll_registers(doubled, ["grp"], "member", p=5)
    assert r1.subtract(r2).count() == 0 and r2.subtract(r1).count() == 0


def test_hll_plan_is_two_hash_aggregates_no_window(spark):
    """Constant-state contract: the whole estimate is hash aggregates
    (map-side combinable max / integer sum) — no window, no UDF, no
    sort-based agg over raw rows."""
    df = _members(spark, {"g": 50})
    plan = _plan(distinct_estimate(df, ["grp"], "member", p=8))
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final × 2


# ---------------------------------------------------------------- as-of


def _asof_fixture(spark):
    snaps = spark.createDataFrame(
        [
            ("h1", 100, 1, "v100"),
            ("h1", 200, 2, "v200"),
            ("h1", 200, 3, "v200b"),  # tie on ts → tiebreak 3 wins
            ("h2", 50, 4, "w50"),
        ],
        "host string, ts long, snap_id long, body string",
    )
    probes = spark.createDataFrame(
        [
            ("h1", 99, "p0"),   # before any snapshot → NULL
            ("h1", 100, "p1"),  # exact ts → inclusive match v100
            ("h1", 150, "p2"),  # between → v100
            ("h1", 201, "p3"),  # after the tie → v200b
            ("h2", 5000, "p4"),  # far later bucket → carried w50
            ("h3", 10, "p5"),   # key with no snapshots → NULL
        ],
        "host string, ts long, probe_id string",
    )
    return probes, snaps


EXPECTED = {
    "p0": None,
    "p1": "v100",
    "p2": "v100",
    "p3": "v200b",
    "p4": "w50",
    "p5": None,
}


def test_asof_backward_inclusive_and_ties(spark):
    probes, snaps = _asof_fixture(spark)
    out = asof_join(
        probes, snaps, ["host"], "ts", "snap_id", ["body"], ["probe_id"]
    )
    got = {r["probe_id"]: r["body"] for r in out.collect()}
    assert got == EXPECTED, got


def test_asof_bucketed_identical_to_baseline(spark):
    probes, snaps = _asof_fixture(spark)
    base = asof_join(
        probes, snaps, ["host"], "ts", "snap_id", ["body"], ["probe_id"]
    )
    for width in (1, 7, 130, 10_000):
        bkt = asof_join_bucketed(
            probes, snaps, ["host"], "ts", "snap_id", ["body"],
            ["probe_id"], bucket_width=width,
        )
        assert sorted(map(tuple, bkt.collect())) == sorted(
            map(tuple, base.collect())
        ), width


def test_asof_bucketed_identical_on_dense_fixture(spark):
    """Hash-scattered 400-row fixture: the two strategies must agree
    exactly (every probe/snapshot interleaving, multiple keys)."""
    snaps = spark.range(120).select(
        (F.col("id") % 5).cast("string").alias("k"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
         .cast("long") % 1000).alias("ts"),
        F.col("id").alias("snap_id"),
        F.concat(F.lit("s"), F.col("id")).alias("val"),
    )
    probes = spark.range(280).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("p"), F.col("id"))), 1, 6),
                16, 10).cast("long") % 1000).alias("ts"),
        F.col("id").alias("pid"),
    )
    base = asof_join(probes, snaps, ["k"], "ts", "snap_id", ["val"], ["pid"])
    bkt = asof_join_bucketed(
        probes, snaps, ["k"], "ts", "snap_id", ["val"], ["pid"],
        bucket_width=50,
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, bkt.collect())
    )


def test_asof_bucketed_plan_windows_are_bucket_scoped(spark):
    """The scale contract: every window over raw rows partitions by
    (key, _bkt) — never by the key alone (a mega-key would become one
    task). The only key-partitioned window runs on the bucket-level
    spine (one row per (key, bucket))."""
    probes, snaps = _asof_fixture(spark)
    plan = _plan(
        asof_join_bucketed(
            probes, snaps, ["host"], "ts", "snap_id", ["body"],
            ["probe_id"], bucket_width=100,
        )
    )
    # a Window line prints "[funcs], [partitionSpec](, [orderSpec])" —
    # the order list is absent for unordered frames (the round-7
    # bucket-top max window), so take the second bracket group
    specs = [
        re.findall(r"\[([^\[\]]*)\]", line)[1]
        for line in plan.splitlines()
        if "windowspecdefinition" in line
    ]
    assert specs, plan
    raw_row_windows = [s for s in specs if "_bkt#" in s]
    assert raw_row_windows, plan  # the within-bucket carry
    # the spine window partitions by key only, but its input is the
    # distinct (key, bucket) table — assert it exists and is the only
    # key-only window
    key_only = [s for s in specs if "_bkt#" not in s]
    assert len(key_only) <= 1, specs
