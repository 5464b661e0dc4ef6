"""Sitemap extraction (operators/sitemap.py): urlset/sitemapindex
lifts, lastmod parsing (date and datetime), XML entity decode,
loc-less blocks, and robots Sitemap: declarations."""

from pdf_metadata_extraction_spark.operators.sitemap import (
    parse_sitemap,
    sitemaps_from_robots,
)

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc> https://a.example/p?x=1&amp;y=2 </loc><lastmod>2024-03-04</lastmod></url>
 <url><loc>https://a.example/q</loc><lastmod>2024-03-04T05:06:07+00:00</lastmod><priority>0.8</priority></url>
 <url><loc>https://a.example/r</loc></url>
 <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""
INDEX = (
    "<sitemapindex><sitemap><loc>https://a.example/sm1.xml</loc>"
    "<lastmod>garbage</lastmod></sitemap></sitemapindex>"
)


def test_parse_sitemap_kinds_and_lastmod(spark):
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", URLSET),
         ("https://a.example/smi.xml", INDEX)],
        "url string, body string",
    )
    out = parse_sitemap(df).orderBy("kind", "loc").collect()
    assert [(r.kind, r.loc) for r in out] == [
        ("sitemap", "https://a.example/sm1.xml"),
        # whitespace trimmed, &amp; decoded
        ("url", "https://a.example/p?x=1&y=2"),
        ("url", "https://a.example/q"),
        ("url", "https://a.example/r"),
    ]
    assert str(out[1].lastmod).startswith("2024-03-04 00:00:00")
    assert str(out[2].lastmod).startswith("2024-03-04 05:06:07")
    # absent lastmod and unparseable lastmod are NULL, never an error
    assert out[3].lastmod is None and out[0].lastmod is None


def test_parse_sitemap_plan_map_only(spark):
    df = spark.createDataFrame(
        [("u", URLSET)], "url string, body string"
    )
    plan = (
        parse_sitemap(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_sitemaps_from_robots(spark):
    rb = spark.createDataFrame(
        [
            ("a.example",
             "User-agent: *\nDisallow: /x\n"
             "Sitemap: https://a.example/s1.xml\n"
             "SITEMAP: https://a.example/s2.xml\n"),
            ("b.example", "User-agent: *\nAllow: /\n"),
        ],
        "host string, body string",
    )
    out = sorted(
        (r.host, r.sitemap_url) for r in sitemaps_from_robots(rb).collect()
    )
    assert out == [
        ("a.example", "https://a.example/s1.xml"),
        ("a.example", "https://a.example/s2.xml"),
    ]
