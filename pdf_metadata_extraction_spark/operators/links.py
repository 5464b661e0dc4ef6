"""Link-graph extraction — anchors out of page HTML into a host-level
link graph, the canonical Common-Crawl-scale KG-construction input
(PageRank/harmonic centrality, spam neighborhoods, crawl frontiers all
start here). Composes with graph.py (degrees/triangles run unchanged
on the host edges) and urlnorm.py (targets are canonicalized before
hosts are compared).

Reference anchor: the reference emits per-document structured values
out of page content (SURVEY.md §2.6 triples); the link graph is the
same shape — (src page, href) pairs lifted to (src_host, dst_host)
edges — at the corpus level.

Everything is pure expressions: regexp_extract_all over the HTML
string (RE2-safe pattern, mirrored into the DuckDB oracle), explode,
and the urlnorm host pipeline. Map-only until the final host-pair
aggregation (one shuffle on short host-pair keys).

Resolution contract (single source of truth = this docstring + the
oracle): absolute http(s) hrefs are taken verbatim; root-relative
hrefs (leading ``/``) resolve against the source page's scheme://host;
everything else (protocol-relative, fragments, mailto:, query-relative,
path-relative) is DROPPED — at corpus scale the dropped classes are a
small minority of anchors and resolution against an un-normalized base
would inject aliased hosts; the drop is a documented recall cut, and
``extract_links`` keeps the raw href so callers can audit it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.operators.urlnorm import URL_RE

HREF_RE = r'href="([^"]*)"'


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html_text"
) -> DataFrame:
    """One row per (src url, href) anchor; href is the RAW attribute
    value (audit surface). ``html_col`` must be a string column —
    decode binary html upstream (``F.col("html").cast("string")``)."""
    return df.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))
        ).alias("href"),
    )


def _host_of(url_expr):
    """Canonical host of an absolute url expression: userinfo dropped,
    lowercased, leading www. stripped (urlnorm's host rules)."""
    authority = F.regexp_extract(url_expr, URL_RE, 2)
    hostport = F.regexp_extract(authority, r"([^@]*)$", 1)
    host0 = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    return F.regexp_replace(host0, r"^www\.", "")


def host_link_edges(
    df: DataFrame, url_col: str = "url", html_col: str = "html_text"
) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level link graph.

    Self-links (host to itself — nav bars, breadcrumbs) are kept: they
    carry the intra-site link mass centrality algorithms expect;
    callers filter ``src_host != dst_host`` for the inter-host view.
    """
    links = extract_links(df, url_col, html_col)
    src_scheme = F.lower(F.regexp_extract(F.col("src_url"), URL_RE, 1))
    abs_href = F.when(
        F.col("href").startswith("http://")
        | F.col("href").startswith("https://"),
        F.col("href"),
    ).when(
        F.col("href").startswith("/") & ~F.col("href").startswith("//"),
        F.concat(
            src_scheme, F.lit("://"), _host_of(F.col("src_url")), F.col("href")
        ),
    )
    resolved = links.withColumn("abs_href", abs_href).where(
        F.col("abs_href").isNotNull()
    )
    edges = resolved.select(
        _host_of(F.col("src_url")).alias("src_host"),
        _host_of(F.col("abs_href")).alias("dst_host"),
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("long").alias("n_links")
    )
