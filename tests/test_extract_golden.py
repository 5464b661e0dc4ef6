"""Byte-identity golden tests for the extraction stage (north-rule
per-row invariant: extracted text per url must equal pages.text exactly).

Mirrors the reference's exact-string pinning strategy
(/root/reference/src/tests/test_end_to_end.py golden asserts)."""

import pyspark.sql.functions as F

from pdf_metadata_extraction_spark.operators.extract import (
    extract_text,
    extract_text_of_bytes,
    extract_tokens,
    tokenize_bytes,
)
from pdf_metadata_extraction_spark.sources.fixtures import fixture_docs
from pdf_metadata_extraction_spark.sources.pages_synth import generate_pages, row_for_doc


def test_roundtrip_pure_python():
    for i in list(range(30)) + [1000, 54321]:
        r = row_for_doc(i)
        assert extract_text_of_bytes(r["html"]) == r["text"], r["url"]


def test_fixture_token_counts():
    # 119 tokens in the UN note (SURVEY.md §5 fixture census)
    assert len(tokenize_bytes(row_for_doc(0)["html"])) == 119
    # degenerate docs: empty page / no pages → no tokens, no error (F3)
    assert tokenize_bytes(row_for_doc(4)["html"]) == []
    assert tokenize_bytes(row_for_doc(5)["html"]) == []
    assert tokenize_bytes(None) == []
    assert tokenize_bytes(b"") == []


def test_fixture_token_text_exact():
    toks = tokenize_bytes(row_for_doc(0)["html"])
    # trailing space preserved (reference test.xml:21 'United Nations ')
    assert toks[1]["text"] == "United Nations "
    assert toks[1]["left"] == 123.0 and toks[1]["top"] == 45.0


def test_extract_text_distributed_byte_identical(spark):
    pages = generate_pages(spark, 64, partitions=8).cache()
    got = extract_text(pages).withColumnRenamed("text", "got")
    joined = pages.select("url", "text").join(got, "url")
    mismatches = joined.where(F.col("text") != F.col("got")).count()
    assert mismatches == 0
    assert joined.count() == 64
    pages.unpersist()


def test_extract_tokens_distributed(spark):
    pages = generate_pages(spark, 12, partitions=3)
    toks = extract_tokens(pages)
    per_url = {r["url"]: r["cnt"] for r in
               toks.groupBy("url").agg(F.count("*").alias("cnt")).collect()}
    assert per_url["https://fixtures.example.org/un_note"] == 119
    assert "https://fixtures.example.org/blank" not in per_url


def test_no_shuffle_in_extract_plan(spark):
    pages = generate_pages(spark, 8, partitions=2)
    plan = extract_text(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only


def test_parallelism_determinism(spark):
    """Same input at different parallelism ⇒ identical sorted output
    (SURVEY.md §7.3 — required for the two-cluster-size equivalence)."""
    a = sorted(extract_text(generate_pages(spark, 40, partitions=1)).collect())
    b = sorted(extract_text(generate_pages(spark, 40, partitions=16)).collect())
    assert a == b


def test_fixture_docs_carry_reference_content():
    docs = fixture_docs()
    un_texts = [t["text"] for p in docs["un_note"] for t in p["tokens"]]
    assert "United Nations " in un_texts
    assert "Original: English " in un_texts
    lorem = [t["text"] for p in docs["lorem_en"] for t in p["tokens"]]
    assert "● FORMULA" in lorem


def test_fast_slow_html_paths_agree():
    """Differential: the regex fast path must equal the stdlib-parser slow
    path on the whole synthetic corpus (and fall back when unsure)."""
    from pdf_metadata_extraction_spark.operators.extract import (
        parse_html_blocks, parse_html_blocks_fast, parse_html_blocks_slow,
    )

    for i in range(6, 506):
        h = row_for_doc(i)["html"]
        assert parse_html_blocks_fast(h.decode()) == parse_html_blocks_slow(h), i
    # unclosed <head> → fast path declines, slow path recovers at <body>
    bad = b"<html><head><title>x</title><body><p>hello</p></body></html>"
    assert parse_html_blocks_fast(bad.decode()) is None
    assert parse_html_blocks(bad) == [("p", "hello")]
