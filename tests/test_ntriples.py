"""N-Triples serializer (operators/ntriples.py): escape corners,
single-pass unescape (the splice traps), lenient parsing, and a
hypothesis roundtrip over adversarial strings."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_metadata_extraction_spark.operators.ntriples import (
    parse_ntriples,
    to_ntriples,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def test_ntriples_escaping_pinned(spark):
    rows = [
        ("Paris City", "label", "plain"),
        ("a<b>c", "rel\\x", 'q " b \\ n \n t \t end'),
        ("pct %20 raw", "p", "trailing backslash \\"),
        ("s", "p", "\\n literal-looking"),
    ]
    lines = [r.line for r in to_ntriples(_edges(spark, rows)).collect()]
    assert lines == [
        '<kg:Paris%20City> <kg:label> "plain" .',
        '<kg:a%3Cb%3Ec> <kg:rel%5Cx> "q \\" b \\\\ n \\n t \\t end" .',
        '<kg:pct%20%2520%20raw> <kg:p> "trailing backslash \\\\" .',
        '<kg:s> <kg:p> "\\\\n literal-looking" .',
    ]
    # every serialized line is single-line, parseable ASCII framing
    assert all("\n" not in ln and ln.endswith(" .") for ln in lines)


def test_ntriples_null_terms_drop(spark):
    rows = [("s", "p", None), (None, "p", "o"), ("s", None, "o"),
            ("s", "p", "o")]
    assert to_ntriples(_edges(spark, rows)).count() == 1


def test_parse_ntriples_lenient(spark):
    lines = spark.createDataFrame(
        [
            ('<kg:a> <kg:p> "v" .',),
            ("# comment",),
            ("",),
            # typed literal: foreign syntax, dropped not mangled
            ('<kg:a> <kg:p> "3"^^<xsd:int> .',),
        ],
        "line string",
    )
    out = parse_ntriples(lines).collect()
    assert [(r.subj, r.pred, r.obj) for r in out] == [("a", "p", "v")]


def test_ntriples_plan_map_only(spark):
    plan = (
        to_ntriples(_edges(spark, [("s", "p", "o")]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


NASTY = st.lists(
    st.sampled_from(
        list("ab%\\\"\n\r\t<>{}|^` .n") + ["\\\\", "%25", "\\n"]
    ),
    min_size=0,
    max_size=12,
).map("".join)


@settings(max_examples=30, deadline=None)
@given(s=NASTY, p=NASTY, o=NASTY)
def test_ntriples_roundtrip_property(spark, s, p, o):
    # `spark` is session-scoped (conftest), so hypothesis's
    # function-scoped-fixture health check does not apply
    nt = to_ntriples(_edges(spark, [(s, p, o)]))
    back = parse_ntriples(nt).collect()
    assert [(r.subj, r.pred, r.obj) for r in back] == [(s, p, o)]
