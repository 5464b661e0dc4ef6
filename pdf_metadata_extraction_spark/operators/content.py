"""Main-content extraction: classify HTML blocks by link density and
length (the jusText / trafilatura signal family) and keep the article
text, dropping navigation, footers and link farms.

Reference anchor: the reference's segmenter separates paragraph-worthy
text from furniture inside PDFs (SURVEY.md §2 J1/W2 — segment boxes +
reading order); on web pages the equivalent pre-training step is
boilerplate-block removal, and the standard cheap-but-strong signal is
per-block LINK DENSITY (Kohlschütter et al., WSDM 2010; jusText,
Pomikálek 2011): navigation blocks are mostly anchor text, content
blocks are mostly plain text.

Everything is map-only string expressions fused into the page scan —
block split, tag strip, whitespace collapse, anchor-text length sums —
with an INTEGER density (ppm, `div`) so the keep verdict is bit-exact
cross-engine. The only shuffle in `main_content` is the per-url ordered
concat (bounded by page size, the same contract as the segment concat
A4 operator).

Regex parity notes (Java regex vs DuckDB RE2): whitespace collapse uses
an explicit `[ \\t\\n\\r\\f]` class (Java `\\s` includes \\x0B, RE2's
does not); lazy quantifiers and `(?is)` are supported by both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOCK_SPLIT_RE = "(?i)</(?:p|div|li|h[1-6]|tr|section|article|blockquote)>"
_SCRIPT_RE = "(?is)<(?:script|style)[^>]*>.*?</(?:script|style)>"
_TAG_RE = "<[^>]*>"
_ANCHOR_RE = "(?is)<a\\b[^>]*>(.*?)</a>"
_WS = "[ \\t\\n\\r\\f]+"


def _visible(col: Column) -> Column:
    """Collapse an HTML fragment to its visible text: strip tags to
    spaces, fold whitespace runs, trim. Script/style subtrees are
    removed page-wide BEFORE the block split (a block tag inside a
    script string literal must not cut a block)."""
    no_tags = F.regexp_replace(col, _TAG_RE, " ")
    return F.trim(F.regexp_replace(no_tags, _WS, " "))


def content_blocks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_density_ppm: int = 333_333,
    min_chars: int = 25,
) -> DataFrame:
    """(url, block_idx, text, n_chars, anchor_chars, density_ppm, kept)
    — one row per non-empty block-level element of the page.

    A block is a fragment ending at a block-level closing tag; its
    density is anchor-inner-text chars per total visible chars, in
    parts-per-million via integer `div` (no float in the verdict).
    `kept` = long enough AND link-sparse enough. Map-only: the split,
    both length sums, and the verdict all live in the scan's codegen.
    """
    cleaned = F.regexp_replace(
        F.col(html_col).cast("string"), _SCRIPT_RE, " "
    )
    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(cleaned, BLOCK_SPLIT_RE)).alias(
            "block_idx", "_frag"
        ),
    )
    anchor_chars = F.aggregate(
        F.transform(
            F.regexp_extract_all(F.col("_frag"), F.lit(_ANCHOR_RE), F.lit(1)),
            lambda a: F.length(_visible(a)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out = blocks.select(
        "url",
        F.col("block_idx").cast("long").alias("block_idx"),
        _visible(F.col("_frag")).alias("text"),
        anchor_chars.alias("anchor_chars"),
    ).select(
        "url",
        "block_idx",
        "text",
        F.length("text").cast("long").alias("n_chars"),
        "anchor_chars",
        F.expr("anchor_chars * 1000000 div greatest(length(text), 1)")
        .cast("long")
        .alias("density_ppm"),
    )
    return out.where(F.col("n_chars") > 0).withColumn(
        "kept",
        (F.col("n_chars") >= min_chars)
        & (F.col("density_ppm") <= max_density_ppm),
    )


def main_content(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_density_ppm: int = 333_333,
    min_chars: int = 25,
) -> DataFrame:
    """(url, main_text, n_blocks_kept, n_blocks_dropped): the kept
    blocks of each page joined in document order — the page's article
    text with the furniture removed. One per-url hash aggregate; the
    collected struct list is bounded by the page's own block count
    (same boundedness contract as the A4 ordered segment concat)."""
    b = content_blocks(
        pages, url_col, html_col, max_density_ppm, min_chars
    )
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(
                F.col("kept"), F.struct("block_idx", "text")
            )
        )
    )
    return b.groupBy("url").agg(
        F.array_join(
            F.transform(kept_sorted, lambda s: s["text"]), " "
        ).alias("main_text"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_blocks_kept"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1))
        .cast("long")
        .alias("n_blocks_dropped"),
    )
