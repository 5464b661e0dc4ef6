"""XML sitemap extraction (sitemaps.org protocol) — the crawl
frontier's publisher-declared half: robots.txt tells a crawler where
it may not go, sitemaps tell it where the host WANTS it to go.

Map-only regexp lifts over the sitemap XML (same discipline as the
JSON-LD/meta/table channels: one regexp_extract_all for the record
blocks, per-block regexp_extract for fields, zero UDFs/shuffles —
fuses into whatever scan fetched the bodies). A real sitemap is ≤50 MB
/ ≤50k urls by spec, so per-row work is bounded by the protocol.

Contract (mirrored by the ``sitemap_extract`` oracle):
- ``<urlset>`` entries: one row per ``<url>`` block with a ``<loc>``;
  optional ``<lastmod>`` (ISO 8601 date or datetime) parses to a
  timestamp, NULL when absent/unparseable. ``<priority>``/
  ``<changefreq>`` are advisory and ignored (Google ignores them too).
- ``<sitemapindex>`` entries: one row per child ``<sitemap><loc>`` —
  ``kind='sitemap'`` vs ``kind='url'`` — so a driver loop (or a
  streaming feed) can requeue index children until the frontier is
  flat; the operator itself stays single-pass (unbounded recursive
  fetch is a crawler-scheduler concern, not a table transform).
- ``<loc>`` values are whitespace-trimmed; entity-encoded ampersands
  (``&amp;`` — required by the spec since loc is XML text) decode.
- ``Sitemap:`` lines in robots.txt bodies (they live OUTSIDE agent
  groups) lift with ``sitemaps_from_robots``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?is)<url>(.*?)</url>"
_SM_BLOCK_RE = r"(?is)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?is)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"
_SITEMAP_LINE_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)[ \t]*$"


def _xml_unescape(c):
    # the five XML predefined entities; &amp; LAST (decode-once: the
    # writer direction escapes it first, same argument as ntriples)
    for ent, raw in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(raw))
    return c


def parse_sitemap(
    sitemaps: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """Lift sitemap bodies into
    ``(sitemap_url, kind 'url'|'sitemap', loc, lastmod timestamp)``.

    One posexplode per record kind over regexp-lifted blocks; the two
    kinds union (a body is one or the other; a malformed mixture
    yields whatever blocks parse — lenient, like real crawlers).
    """

    def lift(block_re: str, kind: str) -> DataFrame:
        blocks = sitemaps.select(
            F.col(url_col).alias("sitemap_url"),
            F.explode(
                F.regexp_extract_all(
                    F.col(body_col), F.lit(block_re), F.lit(1)
                )
            ).alias("_b"),
        )
        return blocks.select(
            "sitemap_url",
            F.lit(kind).alias("kind"),
            _xml_unescape(
                F.regexp_extract(F.col("_b"), _LOC_RE, 1)
            ).alias("loc"),
            F.try_to_timestamp(
                F.substring(
                    F.regexp_extract(F.col("_b"), _LASTMOD_RE, 1), 1, 19
                ),
                F.lit("yyyy-MM-dd'T'HH:mm:ss"),
            ).alias("_lm_full"),
            F.try_to_timestamp(
                F.regexp_extract(F.col("_b"), _LASTMOD_RE, 1),
                F.lit("yyyy-MM-dd"),
            ).alias("_lm_date"),
        ).select(
            "sitemap_url",
            "kind",
            "loc",
            F.coalesce("_lm_full", "_lm_date").alias("lastmod"),
        ).where(F.col("loc") != "")

    return lift(_URL_BLOCK_RE, "url").unionAll(
        lift(_SM_BLOCK_RE, "sitemap")
    )


def sitemaps_from_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``(host, sitemap_url)`` from robots.txt ``Sitemap:`` lines —
    case-insensitive directive, one row per declaration (hosts may
    declare several), group-independent per RFC 9309 §2.3."""
    return robots.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(body_col), F.lit(_SITEMAP_LINE_RE), F.lit(1)
            )
        ).alias("sitemap_url"),
    )
