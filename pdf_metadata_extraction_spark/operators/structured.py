"""Structured-data (JSON-LD) extraction from HTML — the web-native KG
source alongside free-text mention extraction.

A large fraction of real Common-Crawl pages carry schema.org JSON-LD
islands (``<script type="application/ld+json">…</script>``); Web Data
Commons builds its entire public KG from exactly this channel. The
reference extracts metadata from document text/layout; this module is
the structured sibling: publisher-asserted (subj, pred, obj) triples
that need no model, only parsing — and at corpus scale they are the
highest-precision edges the graph gets.

Scale shape: everything is MAP-ONLY expressions — one regexp over the
page bytes to lift the script islands, then ``get_json_object`` path
probes per requested property (JVM Jackson, no Python). No shuffle, no
UDF; the stage fuses into the ingest scan's codegen like the other
page-side extractors (links, urlnorm).

Scope (documented, tested): an island may be a JSON OBJECT (the
common shape), an ARRAY of nodes (``[{Article},{Breadcrumb}]`` — news
sites emit these routinely), or an object wrapping its nodes in an
``@graph`` container; all three are lifted into per-node rows by one
``from_json`` to ``array<string>`` (Jackson renders each element's
raw JSON — still map-only, r5 verdict #4). One container level only:
an array element carrying its own nested ``@graph`` is probed as-is.
Malformed JSON degrades to zero rows for that island, never an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_jsonld_blocks",
    "extract_jsonld_nodes",
    "jsonld_triples",
    "meta_triples",
    "DEFAULT_JSONLD_PROPS",
    "DEFAULT_META_PROPS",
]

# case-insensitive, DOTALL; tolerates single/double-quoted and unquoted
# attribute order around type=application/ld+json
JSONLD_BLOCK_RE = (
    r"(?is)<script[^>]*type\s*=\s*[\"']?application/ld\+json[\"']?[^>]*>"
    r"(.*?)</script>"
)

DEFAULT_JSONLD_PROPS = (
    "headline",
    "name",
    "datePublished",
    "inLanguage",
    "author.name",
    "publisher.name",
)


def extract_jsonld_blocks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, block_idx, json) — one row per JSON-LD script island, in
    document order. Map-only: binary → string cast + one
    regexp_extract_all + posexplode."""
    html_str = F.col(html_col).cast("string")
    blocks = F.regexp_extract_all(html_str, F.lit(JSONLD_BLOCK_RE), F.lit(1))
    return pages.where(F.col(html_col).isNotNull()).select(
        F.col(url_col).alias("url"),
        F.posexplode(blocks).alias("block_idx", "json"),
    )


def extract_jsonld_nodes(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, block_idx, node_idx, json) — one row per JSON-LD NODE:
    an object-rooted island is its own single node; an array-rooted
    island contributes one node per element; an ``@graph`` container
    contributes one node per ``@graph`` member (the wrapper object
    itself is container metadata — ``@context`` and friends — and is
    not probed, the Web Data Commons convention). Map-only: the node
    lift is ``from_json`` to ``array<string>`` (Jackson renders each
    element back as raw JSON text, scalars included) + posexplode;
    malformed islands parse to NULL → zero nodes, never an error."""
    b = extract_jsonld_blocks(pages, url_col=url_col, html_col=html_col)
    t = F.trim(F.col("json"))
    graph = F.get_json_object(t, "$['@graph']")
    nodes = (
        F.when(t.startswith("["), F.from_json(t, "array<string>"))
        .when(
            graph.isNotNull() & F.ltrim(graph).startswith("["),
            F.from_json(graph, "array<string>"),
        )
        .otherwise(F.array(t))
    )
    return b.select(
        "url",
        "block_idx",
        F.posexplode(
            F.coalesce(nodes, F.array().cast("array<string>"))
        ).alias("node_idx", "json"),
    )


DEFAULT_META_PROPS = (
    "og:title",
    "og:type",
    "og:url",
    "og:site_name",
    "og:locale",
    "article:published_time",
    "twitter:title",
)

# one <meta …> open tag; property/name first or content first — both
# orders occur in the wild, so two passes (group 1 = key, group 2 = val
# in pass A; reversed in pass B)
_META_PK_RE = (
    r"(?is)<meta\s[^>]*?(?:property|name)\s*=\s*[\"']([^\"']+)[\"']"
    r"[^>]*?content\s*=\s*[\"']([^\"']*)[\"'][^>]*>"
)
_META_KP_RE = (
    r"(?is)<meta\s[^>]*?content\s*=\s*[\"']([^\"']*)[\"']"
    r"[^>]*?(?:property|name)\s*=\s*[\"']([^\"']+)[\"'][^>]*>"
)


def meta_triples(
    pages: DataFrame,
    props: tuple[str, ...] = DEFAULT_META_PROPS,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """OpenGraph / named-``<meta>`` triples: (subj = page url,
    pred = ``meta:<property>``, obj = content) for the requested
    properties — the other ubiquitous structured channel next to
    JSON-LD (og:* tags outnumber JSON-LD islands on real crawls).

    Map-only like the JSON-LD path: two regexp_extract_all passes (one
    per attribute order, since ``content`` may precede ``property``),
    zipped key/value arrays, filtered to ``props``. When a property
    occurs more than once, the first occurrence wins, pass-major
    (property-first tags, document order, then content-first tags) —
    a deterministic total order, so re-runs and re-partitionings agree.
    """
    html_str = F.col(html_col).cast("string")
    keys = F.concat(
        F.regexp_extract_all(html_str, F.lit(_META_PK_RE), F.lit(1)),
        F.regexp_extract_all(html_str, F.lit(_META_KP_RE), F.lit(2)),
    )
    vals = F.concat(
        F.regexp_extract_all(html_str, F.lit(_META_PK_RE), F.lit(2)),
        F.regexp_extract_all(html_str, F.lit(_META_KP_RE), F.lit(1)),
    )
    wanted = F.array(*[F.lit(p) for p in props])
    kv = F.filter(
        F.arrays_zip(keys.alias("k"), vals.alias("v")),
        lambda s: F.array_contains(wanted, s["k"]),
    )
    exploded = pages.where(F.col(html_col).isNotNull()).select(
        F.col(url_col).alias("subj"),
        F.posexplode(kv).alias("pos", "t"),
    ).select(
        "subj",
        F.col("t.k").alias("k"),
        F.col("t.v").alias("obj"),
        "pos",
    )
    # first occurrence per (subj, property) wins — min(pos) then the
    # winner via the usual no-window min-struct aggregate
    return exploded.groupBy("subj", "k").agg(
        F.min(F.struct(F.col("pos").alias("p"), F.col("obj").alias("o"))).alias("w")
    ).select(
        "subj",
        F.concat(F.lit("meta:"), F.col("k")).alias("pred"),
        F.col("w.o").alias("obj"),
    )


def jsonld_triples(
    pages: DataFrame,
    props: tuple[str, ...] = DEFAULT_JSONLD_PROPS,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Publisher-asserted triples from every JSON-LD node:
    (subj = page url, pred, obj, block_idx, node_idx) with pred ∈
    {``rdf:type``} ∪ {``jsonld:<prop>`` for scalar-string props}.
    ``node_idx`` distinguishes the entities of an array-rooted or
    ``@graph`` island (0 for the common single-object island), so two
    same-typed nodes in one block stay distinct rows.

    Dotted props (``author.name``) follow nested objects; properties
    absent from a node (or non-scalar at the probed path —
    get_json_object returns the JSON text of objects/arrays, which we
    keep only for scalars by requiring no leading '{'/'[') emit no row.
    """
    b = extract_jsonld_nodes(pages, url_col=url_col, html_col=html_col)
    probes = [("rdf:type", "$['@type']")] + [
        (f"jsonld:{p}", "$." + p) for p in props
    ]
    tarr = F.array(*[
        F.struct(
            F.lit(pred).alias("pred"),
            F.get_json_object(F.col("json"), path).alias("obj"),
        )
        for pred, path in probes
    ])
    return (
        b.select("url", "block_idx", "node_idx", F.explode(tarr).alias("t"))
        .select(
            F.col("url").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            "block_idx",
            "node_idx",
        )
        .where(
            F.col("obj").isNotNull()
            & ~F.col("obj").startswith("{")
            & ~F.col("obj").startswith("[")
        )
    )


# HTML tables — the WebTables channel (Cafarella et al., VLDB 2008):
# relational tables embedded in pages are the third web-native KG
# source after JSON-LD and meta tags. Patterns are case-insensitive
# DOTALL; inner markup inside cells is stripped after extraction.
TABLE_RE = r"(?is)<table[^>]*>(.*?)</table>"
TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
TH_RE = r"(?is)<th[^>]*>(.*?)</th>"
TD_RE = r"(?is)<td[^>]*>(.*?)</td>"
_CELL_TAG_RE = r"<[^>]*>"


def _cell_text(c):
    return F.trim(F.regexp_replace(c, _CELL_TAG_RE, ""))


def table_triples(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Entity-attribute triples from HTML tables —
    ``(subj, pred, obj, provenance_url, table_idx, row_idx)``.

    Contract (the WebTables "entity-attribute binary relation" shape):
    a table participates iff its FIRST row is a ``<th>`` header row
    with ≥ 2 columns; each subsequent ``<tr>`` of ``<td>`` cells emits
    one triple per non-key column — subj = the row's first cell (the
    entity key), pred = the matching header cell, obj = the cell text.
    Cells are inner text with nested tags stripped and whitespace
    trimmed (no entity decoding — the documented raw-text contract,
    same as anchor texts); rows whose key cell is empty, and cells
    beyond the header width (or headers beyond the row width — ragged
    tables), drop. ``table_idx``/``row_idx`` are 0-based positions (
    row 0 = the first DATA row), making every triple traceable to its
    cell — per-partition lineage at cell granularity.

    Scale shape: MAP-ONLY nested array expressions — regexp table
    lift → per-table row lift → header/cell zips — two posexplodes
    and one final explode, zero shuffles/UDFs; fuses into the page
    scan like links/structured extraction. Quadratic only in the
    per-table cell count, which the regexp bounds to the page size.
    """
    html_str = F.col(html_col).cast("string")
    tables = F.regexp_extract_all(html_str, F.lit(TABLE_RE), F.lit(1))
    t = pages.select(
        F.col(url_col).alias("provenance_url"),
        F.posexplode(tables).alias("table_idx", "_tbl"),
    ).withColumn(
        "_rows", F.regexp_extract_all(F.col("_tbl"), F.lit(TR_RE), F.lit(1))
    ).withColumn(
        "_hdr",
        F.transform(
            F.regexp_extract_all(
                F.get(F.col("_rows"), 0), F.lit(TH_RE), F.lit(1)
            ),
            _cell_text,
        ),
    ).where(F.size("_hdr") >= 2)
    r = t.select(
        "provenance_url",
        "table_idx",
        "_hdr",
        F.posexplode(
            F.slice(
                F.col("_rows"), 2,
                F.greatest(F.size("_rows") - 1, F.lit(0)),
            )
        ).alias("row_idx", "_row"),
    ).withColumn(
        "_cells",
        F.transform(
            F.regexp_extract_all(F.col("_row"), F.lit(TD_RE), F.lit(1)),
            _cell_text,
        ),
    ).where(
        (F.size("_cells") >= 2) & (F.get(F.col("_cells"), 0) != "")
    )
    # zip pred/obj positionally over the non-key columns; arrays_zip
    # pads the shorter side with NULL — the ragged-table drop
    z = F.arrays_zip(
        F.slice(F.col("_hdr"), 2, F.greatest(F.size("_hdr") - 1, F.lit(0)))
        .alias("pred"),
        F.slice(F.col("_cells"), 2,
                F.greatest(F.size("_cells") - 1, F.lit(0))).alias("obj"),
    )
    return (
        r.select(
            F.get(F.col("_cells"), 0).alias("subj"),
            F.explode(z).alias("_z"),
            "provenance_url",
            "table_idx",
            "row_idx",
        )
        .select(
            "subj",
            F.col("_z.pred").alias("pred"),
            F.col("_z.obj").alias("obj"),
            "provenance_url",
            "table_idx",
            "row_idx",
        )
        .where(
            F.col("pred").isNotNull()
            & (F.col("pred") != "")
            & F.col("obj").isNotNull()
        )
    )
