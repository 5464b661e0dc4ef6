"""Knowledge fusion (operators/fusion.py): conflicting-triple
resolution by source-vote majority, and co-occurrence PMI edge
discovery. Hand-computed expectations throughout."""

import math

from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.operators.fusion import (
    cooccurrence_pmi,
    fuse_edges,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, provenance_url string"
    )


def test_fuse_majority_and_counts(spark):
    # acme/hq: p1+p2 say berlin, p3 says munich -> berlin, support 2 of 3
    out = fuse_edges(_edges(spark, [
        ("acme", "hq", "berlin", "p1"),
        ("acme", "hq", "berlin", "p2"),
        ("acme", "hq", "munich", "p3"),
    ])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.pred, r.obj) == ("acme", "hq", "berlin")
    assert r.support == 2 and r.n_objs == 2 and r.n_sources == 3
    assert r.confidence == round(2 / 3, 6)


def test_fuse_one_vote_per_source(spark):
    # p1 repeating "munich" five times is still ONE vote; p2+p3 win
    rows = [("acme", "hq", "munich", "p1")] * 5 + [
        ("acme", "hq", "berlin", "p2"),
        ("acme", "hq", "berlin", "p3"),
    ]
    r = fuse_edges(_edges(spark, rows)).collect()[0]
    assert r.obj == "berlin" and r.support == 2 and r.n_sources == 3


def test_fuse_tie_breaks_to_smallest_obj(spark):
    r = fuse_edges(_edges(spark, [
        ("acme", "hq", "munich", "p1"),
        ("acme", "hq", "berlin", "p2"),
    ])).collect()[0]
    assert r.obj == "berlin" and r.support == 1 and r.n_objs == 2


def test_fuse_sources_asserting_multiple_objects(spark):
    # p1 asserts BOTH objs: n_sources = 2 (not 3), winner support = 2
    r = fuse_edges(_edges(spark, [
        ("acme", "hq", "berlin", "p1"),
        ("acme", "hq", "munich", "p1"),
        ("acme", "hq", "berlin", "p2"),
    ])).collect()[0]
    assert r.obj == "berlin" and r.support == 2
    assert r.n_sources == 2 and r.confidence == 1.0


def test_fuse_groups_independent(spark):
    out = {
        (r.subj, r.pred): r.obj
        for r in fuse_edges(_edges(spark, [
            ("acme", "hq", "berlin", "p1"),
            ("acme", "ceo", "ada", "p1"),
            ("globex", "hq", "tokyo", "p2"),
        ])).collect()
    }
    assert out == {
        ("acme", "hq"): "berlin",
        ("acme", "ceo"): "ada",
        ("globex", "hq"): "tokyo",
    }


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, label string")


def test_pmi_hand_computed(spark):
    # 4 docs; a+b together in 2, a alone in 1, b alone in 1
    # n_a = 3, n_b = 3, n_ab = 2, N = 4 -> pmi = ln(2*4/(3*3))
    m = _mentions(spark, [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"),
    ])
    out = cooccurrence_pmi(m).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.ent_a, r.ent_b) == ("a", "b")
    assert (r.n_pair, r.n_a, r.n_b, r.n_docs) == (2, 3, 3, 4)
    assert r.pmi == round(math.log(2 * 4 / (3 * 3)), 6)


def test_pmi_pairs_are_ordered_and_deduped(spark):
    # duplicate mention rows collapse; pairs come out a < b once per doc
    m = _mentions(spark, [
        (1, "z"), (1, "a"), (1, "a"), (1, "m"),
    ])
    out = {(r.ent_a, r.ent_b): r.n_pair for r in cooccurrence_pmi(m).collect()}
    assert out == {("a", "m"): 1, ("a", "z"): 1, ("m", "z"): 1}


def test_pmi_min_pairs_filter(spark):
    m = _mentions(spark, [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
    ])
    out = {(r.ent_a, r.ent_b) for r in cooccurrence_pmi(m, min_pairs=2).collect()}
    assert out == {("a", "b")}


def test_pmi_negative_for_anticorrelated(spark):
    # a and b co-occur once but each appears in most docs -> pmi < 0
    rows = [(i, "a") for i in range(1, 9)] + [(i, "b") for i in range(8, 16)]
    out = cooccurrence_pmi(_mentions(spark, rows)).collect()
    assert len(out) == 1 and out[0].pmi < 0


def test_fusion_plans_have_no_per_group_sort_window(spark):
    """The fusion winner must be a hash aggregate (min over struct),
    never a row_number window; PMI pair generation must not self-join
    the mention table (its only joins are the broadcast marginals)."""
    plan = fuse_edges(_edges(spark, [
        ("a", "p", "x", "s1")
    ]))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    m = _mentions(spark, [(1, "a"), (1, "b")])
    pplan = cooccurrence_pmi(m)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in pplan
    assert "Window" not in pplan


def test_pmi_max_per_doc_cap_is_deterministic(spark):
    # cap keeps the lexicographically-first 2 of the sorted set:
    # doc 1 {a,b,z} capped to {a,b} -> only (a,b) pair survives
    m = _mentions(spark, [(1, "z"), (1, "b"), (1, "a")])
    out = cooccurrence_pmi(m, max_per_doc=2).collect()
    assert {(r.ent_a, r.ent_b) for r in out} == {("a", "b")}
    # marginals are computed on the capped set too (z not counted)
    assert out[0].n_a == 1 and out[0].n_b == 1 and out[0].n_docs == 1


# ---------------------------------------------------------------- timeline
def _tedges(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts timestamp"
    )


def test_timeline_last_write_wins_and_churn(spark):
    from datetime import datetime

    from pdf_metadata_extraction_spark.operators.fusion import fuse_timeline

    out = {
        (r["subj"], r["pred"]): r
        for r in fuse_timeline(_tedges(spark, [
            # acme/hq: berlin -> munich -> munich (re-assert) -> berlin
            ("acme", "hq", "berlin", datetime(2024, 1, 1, 0, 0, 0)),
            ("acme", "hq", "munich", datetime(2024, 2, 1, 0, 0, 0)),
            ("acme", "hq", "munich", datetime(2024, 3, 1, 0, 0, 0)),
            ("acme", "hq", "berlin", datetime(2024, 4, 1, 0, 0, 0)),
            # acme/ceo: stable value, repeated
            ("acme", "ceo", "ada", datetime(2024, 1, 1)),
            ("acme", "ceo", "ada", datetime(2024, 6, 1)),
        ])).collect()
    }
    hq = out[("acme", "hq")]
    assert hq["current_obj"] == "berlin"
    # berlin->munich, munich->berlin: 2 transitions (the re-assert is
    # a distinct second so it stays a row, but obj equal -> no change)
    assert hq["n_changes"] == 2
    assert hq["n_objs"] == 2
    assert hq["first_ts"] == int(datetime(2024, 1, 1).timestamp())
    assert hq["last_ts"] == int(datetime(2024, 4, 1).timestamp())
    ceo = out[("acme", "ceo")]
    assert ceo["current_obj"] == "ada"
    assert ceo["n_changes"] == 0
    assert ceo["n_objs"] == 1


def test_timeline_same_second_ties_and_dups(spark):
    from datetime import datetime

    from pdf_metadata_extraction_spark.operators.fusion import fuse_timeline

    t = datetime(2024, 5, 1, 12, 0, 0)
    rows = fuse_timeline(_tedges(spark, [
        # duplicate assertion (same obj, same second) collapses
        ("e", "p", "x", t),
        ("e", "p", "x", t),
        # same-second conflict: ordering is (es, obj) so 'y' sorts
        # after 'x' and wins last-write (max obj at the tied second)
        ("e", "p", "y", t),
    ])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["current_obj"] == "y"
    assert r["n_objs"] == 2
    assert r["n_changes"] == 1  # x -> y within the second
    assert r["first_ts"] == r["last_ts"] == int(t.timestamp())


def test_triple_diff_classification(spark):
    from pdf_metadata_extraction_spark.operators.fusion import triple_diff

    old = spark.createDataFrame(
        [
            ("e1", "capital", "Paris"),   # unchanged → suppressed
            ("e2", "capital", "Bonn"),    # object changes
            ("e3", "pop", "5m"),          # retracted fact
            ("e2", "capital", "Bonn"),    # dup assertion collapses
        ],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [
            ("e1", "capital", "Paris"),
            ("e2", "capital", "Berlin"),
            ("e4", "pop", "9m"),          # new fact
        ],
        "subj string, pred string, obj string",
    )
    got = sorted(map(tuple, triple_diff(old, new).collect()))
    assert got == sorted(
        [
            ("e2", "capital", "Bonn", "removed", "object_changed"),
            ("e2", "capital", "Berlin", "added", "object_changed"),
            ("e3", "pop", "5m", "removed", "retracted_fact"),
            ("e4", "pop", "9m", "added", "new_fact"),
        ]
    )
    # identical snapshots diff to nothing; diff vs empty is all-new
    assert triple_diff(old, old).count() == 0
    empty = spark.createDataFrame(
        [], "subj string, pred string, obj string"
    )
    allnew = triple_diff(empty, new).collect()
    assert {r.status for r in allnew} == {"added"}
    assert {r.fact_status for r in allnew} == {"new_fact"}
    assert triple_diff(new, empty).count() == 3


def test_match_bgp_semantics(spark):
    from pdf_metadata_extraction_spark.operators.fusion import match_bgp

    edges = spark.createDataFrame(
        [
            ("fr", "capital", "paris"),
            ("fr", "capital", "paris"),  # provenance dup: one binding
            ("de", "capital", "berlin"),
            ("paris", "population", "2m"),
            ("berlin", "population", "3m"),
            ("fr", "lang", "fr"),
            ("x", "loop", "x"),
        ],
        "subj string, pred string, obj string",
    )
    # chain: ?c -capital-> ?city -population-> ?p
    out = match_bgp(
        edges, [("?c", "capital", "?city"), ("?city", "population", "?p")]
    )
    assert sorted(map(tuple, out.select("c", "city", "p").collect())) == [
        ("de", "berlin", "3m"), ("fr", "paris", "2m"),
    ]
    # constant object
    assert [tuple(r) for r in
            match_bgp(edges, [("?c", "capital", "paris")]).collect()
            ] == [("fr",)]
    # repeated variable inside one pattern = equality (self-loops)
    assert [tuple(r) for r in
            match_bgp(edges, [("?n", "loop", "?n")]).collect()
            ] == [("x",)]
    # variable predicate
    assert sorted(
        tuple(r) for r in match_bgp(edges, [("fr", "?p", "?o")]).collect()
    ) == [("capital", "paris"), ("lang", "fr")]
    # disconnected pattern refused; empty pattern list refused
    import pytest

    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(edges, [("?a", "capital", "?b"),
                          ("?c", "population", "?d")])
    with pytest.raises(ValueError, match="empty pattern"):
        match_bgp(edges, [])
