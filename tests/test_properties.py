"""Property-based tests (hypothesis) — strengthens the reference's
example-only test strategy (SURVEY.md §5: 'no property-based/randomized
testing' there). Pure-python kernels: no Spark session needed."""

import html as htmllib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_metadata_extraction_spark.operators.extract import (
    normalize_ws,
    parse_html_blocks,
    parse_html_blocks_fast,
    parse_html_blocks_slow,
    tokens_to_text,
)
from pdf_metadata_extraction_spark.operators.linking import match_options
from pdf_metadata_extraction_spark.operators.segment import segment_doc

# text without markup characters (what lands between tags)
plain_text = st.text(
    alphabet=st.characters(blacklist_characters="<>&", blacklist_categories=("Cs",)),
    max_size=80,
)
block_tag = st.sampled_from(["p", "h1", "h2", "li", "blockquote"])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(block_tag, plain_text), max_size=8))
def test_html_wrap_extract_roundtrip(blocks):
    """extract(wrap(blocks)) == canonical text of blocks — the byte-
    identity invariant, for arbitrary block content."""
    html = "<html><body>" + "".join(
        f"<{t}>{htmllib.escape(x)}</{t}>" for t, x in blocks
    ) + "</body></html>"
    got = parse_html_blocks(html.encode())
    expected = [(t, normalize_ws(x)) for t, x in blocks if normalize_ws(x)]
    assert [txt for _, txt in got] == [txt for _, txt in expected]
    assert tokens_to_text([x for _, x in blocks]) == tokens_to_text(
        [txt for _, txt in got]
    )


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_fast_slow_paths_agree_on_arbitrary_input(raw):
    """The regex fast path either agrees with the stdlib parser or
    declines (None) — it never silently diverges on text content."""
    data = raw.encode("utf-8", errors="replace")
    fast = parse_html_blocks_fast(data.decode("utf-8", errors="replace"))
    if fast is not None and "<" not in raw:
        assert fast == parse_html_blocks_slow(data)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0, 600, allow_nan=False),  # left
            st.floats(0, 780, allow_nan=False),  # top
            st.floats(1, 200, allow_nan=False),  # width
            st.floats(5, 20, allow_nan=False),   # height
            plain_text,
        ),
        max_size=12,
    )
)
def test_segment_doc_invariants(toks):
    tokens = [
        dict(page=1, token_idx=i, text=x, left=l, top=t, width=w, height=h,
             font_id="f", font_size=10.0, bold=False)
        for i, (l, t, w, h, x) in enumerate(toks)
    ]
    segs = segment_doc(tokens)
    # every non-empty token's text lands in exactly one segment
    joined = " ".join(s["text"] for s in segs)
    for tok in tokens:
        for word in normalize_ws(tok["text"]).split():
            assert word in joined
    # segment ids are dense and ordered; boxes never empty for non-ws text
    assert [s["segment_id"] for s in segs] == list(range(len(segs)))
    assert all(s["boxes"] for s in segs)
    # determinism under input order permutation
    segs2 = segment_doc(list(reversed(tokens)))
    assert [s["text"] for s in segs] == [s["text"] for s in segs2]


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="ab 12", max_size=40),
    st.lists(st.sampled_from(["a", "b", "ab", "1", "12"]), max_size=4, unique=True),
    st.booleans(),
)
def test_match_options_invariants(text, labels, multi_value):
    opts = [(str(i), lab) for i, lab in enumerate(labels)]
    values = match_options(text, opts, multi_value)
    if not multi_value:
        assert len(values) <= 1
    for v in values:
        # the highlighted span really is the label, whole-word
        m = re.search(r'<span class="ix_match">(.*?)</span>', v["segment_text"])
        assert m and m.group(1) == v["label"]
        # stripping markup returns the original text
        stripped = re.sub(r"</?(p|span)[^>]*>", "", v["segment_text"])
        assert stripped == text


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),                    # page
            st.floats(0, 600, allow_nan=False),   # left
            st.floats(0, 780, allow_nan=False),   # top
            st.floats(1, 200, allow_nan=False),   # width
            st.floats(5, 20, allow_nan=False),    # height
            st.sampled_from([0.0, 8.0, 10.0, 14.0]),  # font_size
        ),
        max_size=40,
    )
)
def test_vectorized_proximity_clusters_equals_reference(toks):
    """The numpy kernel must produce byte-identical clusters to the
    pure-Python pair scan it replaced (same window-break semantics)."""
    from pdf_metadata_extraction_spark.operators.segment import (
        _proximity_clusters,
        _proximity_clusters_py,
    )

    tokens = [
        dict(page=p, token_idx=i, text="x", left=l, top=t, width=w, height=h,
             font_id="f", font_size=fsz, bold=False)
        for i, (p, l, t, w, h, fsz) in enumerate(toks)
    ]
    assert _proximity_clusters(tokens) == _proximity_clusters_py(tokens)


def test_proximity_cluster_chunking_path(monkeypatch):
    """Force the 4M-pair memory cap down to 7 so the anchor-chunk loop
    runs many times on one dense page — output must stay identical to
    the unchunked reference scan."""
    from pdf_metadata_extraction_spark.operators import segment as seg

    tokens = [
        dict(page=1, token_idx=i, text="w", left=(i % 10) * 30.0,
             top=(i // 10) * 11.0, width=28.0, height=10.0,
             font_id="f", font_size=10.0, bold=False)
        for i in range(120)
    ]
    expected = seg._proximity_clusters_py(tokens)
    monkeypatch.setattr(seg, "_PAIR_CHUNK", 7)
    assert seg._proximity_clusters(tokens) == expected


@settings(max_examples=160, deadline=None)
@given(
    # U+0301 COMBINING ACUTE as a standalone alphabet char: hypothesis
    # builds random DECOMPOSED sequences (e.g. "e\u0301s"), which must
    # match exactly like the oracle's strip_accents (mark deleted);
    # \x01 probes the fold-sentinel collision (must NOT be deleted)
    st.text(alphabet="aBc 1-\u00e9\u0301\x01", max_size=30),
    st.lists(
        st.sampled_from(
            ["Ab", "ab c", "C-1", "\u00e9s", "Abs", "b1", "e\u0301s"]
        ),
        max_size=3, unique=True,
    ),
)
def test_fuzzy_matcher_equals_duckdb_regex(text, labels):
    """The j3_fuzzy_match oracle contract: linking.py's fuzzy tier and
    the RE2 SQL pattern built by __spark_entry__._fuzzy_sql_pattern must
    agree on WHETHER each label matches a text (doc-count semantics)."""
    import duckdb

    from __spark_entry__ import _fuzzy_sql_pattern
    from pdf_metadata_extraction_spark.operators.linking import match_options

    got = {v["label"] for v in match_options(text, [(l, l) for l in labels], True)}
    con = duckdb.connect()
    for lab in labels:
        sql_hit = con.execute(
            "SELECT regexp_matches(lower(strip_accents(?)), ?)",
            [text, _fuzzy_sql_pattern(lab)],
        ).fetchone()[0]
        assert sql_hit == (lab in got), (text, lab)


def test_fuzzy_matches_decomposed_unicode_like_strip_accents():
    """Regression (round-2 ADVICE): decomposed input 'e\\u0301s' must link
    label '\\u00e9s' exactly as the DuckDB oracle (strip_accents deletes
    the mark), and the highlight must wrap the ORIGINAL surface form."""
    from pdf_metadata_extraction_spark.operators.linking import (
        MATCH_CLOSE,
        MATCH_OPEN,
        match_options,
    )

    text = "les e\u0301s sont la\u0300"  # decomposed e+acute, a+grave
    vals = match_options(text, [("o1", "\u00e9s"), ("o2", "l\u00e0")], True)
    assert {v["label"] for v in vals} == {"\u00e9s", "l\u00e0"}
    for v in vals:
        inner = v["segment_text"].split(MATCH_OPEN)[1].split(MATCH_CLOSE)[0]
        # original decomposed spans, combining marks intact
        assert inner in ("e\u0301s", "la\u0300")


def test_literal_u0001_is_boundary_not_deleted():
    """Regression: a literal U+0001 in the input must not collide with
    the fold sentinel. strip_accents PRESERVES it (a non-word boundary
    char), so 'x\\x01\u00e9s' must NOT link label '\u00e9s' as a mid-word match \u2014
    and '\\x01\u00e9s' standing alone MUST link, with the highlight on the
    original characters (no index shift from a spurious strip)."""
    from pdf_metadata_extraction_spark.operators.linking import (
        MATCH_CLOSE,
        MATCH_OPEN,
        fold_strip,
        match_options,
    )

    folded, idx = fold_strip("x\x01\u00e9s")
    assert folded == "x\x02es"          # \x01 remapped, not deleted
    assert idx is None                  # nothing stripped -> fast path
    # \x01 next to a decomposed accent: only the MARK is deleted
    folded2, idx2 = fold_strip("\x01e\u0301s")
    assert folded2 == "\x02es"
    assert idx2 == [0, 1, 3]            # index map skips just the mark
    # boundary semantics match the oracle: \x01 separates tokens
    vals = match_options("a \x01\u00e9s b", [("o1", "\u00e9s")], True)
    assert [v["label"] for v in vals] == ["\u00e9s"]
    inner = vals[0]["segment_text"].split(MATCH_OPEN)[1].split(MATCH_CLOSE)[0]
    assert inner == "\u00e9s"           # highlight on the original span


@settings(deadline=None)  # r6 verdict #8: a loaded box (hypervisor
# stall phases) manufactured a deadline flake on this exact test; the
# property is value-equality, not latency
@given(
    st.lists(
        st.one_of(
            st.text(alphabet="aB1 .,-\t\n", max_size=14),
            st.sampled_from([
                "", "Option 7", "Option 12 end", "2021-02-15",
                "due 15 February 2021 x", "x 3.14 y", "  a  b  ",
                "9 December 1948", "A7 code", "no digits here",
            ]),
        ),
        max_size=8,
    )
)
def test_predict_series_equals_predict(texts):
    """Every method's vectorized predict_series must equal element-wise
    predict on the same inputs (predict is the spec; predict_series is
    the C-speed path apply_method runs inside the Arrow stage)."""
    import pandas as pd

    from pdf_metadata_extraction_spark.operators.methods import METHOD_ORDER

    pairs = [("Option 1", "1"), ("Option 2", "2")]
    for cls in METHOD_ORDER:
        m = cls()
        m.fit(pairs)
        s = pd.Series(texts, dtype=object)
        expected = [m.predict(t) for t in texts]
        got = list(m.predict_series(s))
        assert got == expected, (cls.name, texts)
        # the normalized=True fast path (what apply_method calls) must
        # be indistinguishable on pre-normalized input
        normed = [normalize_ws(t or "") for t in texts]
        ns = pd.Series(normed, dtype=object)
        assert list(m.predict_series(ns, normalized=True)) == [
            m.predict(t) for t in normed
        ], (cls.name, texts)
