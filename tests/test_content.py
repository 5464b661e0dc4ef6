"""Main-content extraction (link-density block classifier)."""

import pyspark.sql.functions as F

from pdf_metadata_extraction_spark.operators.content import (
    content_blocks,
    main_content,
)

HTML = (
    "<html><head><title>t</title>"
    "<script>var x = '<p>not text</p>';</script></head><body>"
    '<div class="nav"><a href="/">Home</a> <a href="/a">Products</a> '
    '<a href="/b">About us</a></div>'
    "<p>This is the first real paragraph of the article body text.</p>"
    "<p>Second   paragraph\nwith    messy whitespace and one "
    '<a href="/x">inline link</a> inside a long enough text run.</p>'
    "<li><a href='/c'>Related article number one</a></li>"
    "<p>tiny</p>"
    "<div>Footer: <a href='/p'>Privacy</a> <a href='/i'>Imprint</a> "
    "<a href='/s'>Sitemap</a> <a href='/t'>Terms</a></div>"
    "</body></html>"
)


def _pages(spark):
    return spark.createDataFrame(
        [("u1", HTML.encode())], "url string, html binary"
    )


def test_content_blocks_classification(spark):
    rows = {
        r["block_idx"]: r for r in content_blocks(_pages(spark)).collect()
    }
    by_text = {r["text"]: r for r in rows.values()}
    nav = next(
        r for t, r in by_text.items() if t.endswith("Home Products About us")
    )
    assert nav["kept"] is False and nav["density_ppm"] > 333_333
    first = by_text[
        "This is the first real paragraph of the article body text."
    ]
    assert first["kept"] is True and first["anchor_chars"] == 0
    second = next(t for t in by_text if t.startswith("Second paragraph"))
    assert by_text[second]["kept"] is True
    assert 0 < by_text[second]["density_ppm"] < 333_333
    assert by_text["tiny"]["kept"] is False  # long enough? no
    related = by_text["Related article number one"]
    assert related["kept"] is False and related["density_ppm"] == 1_000_000
    footer = next(t for t in by_text if t.startswith("Footer:"))
    assert by_text[footer]["kept"] is False
    # script content never leaks into any block's visible text
    assert not any("not text" in t for t in by_text)


def test_main_content_concat_order_and_counts(spark):
    row = main_content(_pages(spark)).collect()[0]
    assert row["main_text"].startswith("This is the first real paragraph")
    assert "Second paragraph with messy whitespace" in row["main_text"]
    assert "Home" not in row["main_text"]
    assert "Footer" not in row["main_text"]
    assert row["n_blocks_kept"] == 2
    assert row["n_blocks_kept"] + row["n_blocks_dropped"] == len(
        content_blocks(_pages(spark)).collect()
    )


def test_content_blocks_plan_is_map_only(spark):
    plan = (
        content_blocks(_pages(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan, plan


def test_main_content_single_agg_no_window(spark):
    plan = (
        main_content(_pages(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert plan.count("Exchange") == 1, plan  # the one per-url shuffle
