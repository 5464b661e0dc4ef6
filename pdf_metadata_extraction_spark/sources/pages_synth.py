"""Deterministic synthetic ``pages`` table (BASELINE.json input_hint shape).

``pages(url string, warc_ts timestamp, html binary, text string, lang string)``

Properties:
- **Deterministic by construction**: every field is a pure function of the
  row id (md5 counters — no RNG state, so generation distributes over any
  number of partitions and any scale with identical content).
- **Fixture carriage**: row ids 0..5 carry the reference-derived fixture
  documents (sources/fixtures.py) as pdf2xml bytes so golden outputs
  carry over to every scale.
- **Golden text column**: ``text`` is computed with the same canonical
  ``tokens_to_text`` contract the extractor must satisfy — the
  byte-identity oracle rides with the data.
- **Mega-domain skew knob** (FIXTURES.md §1): ``skew_frac`` of rows share
  one domain — exercises salting + AQE skew handling downstream.

Scale: generation is a ``spark.range(n)`` → ``mapInPandas`` map-only job;
writing partitions by ``url_bucket`` (the parquet stand-in for Iceberg
``bucket(N, url)``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_metadata_extraction_spark.operators.extract import (
    extract_text_of_bytes,
    tokens_to_text,
)
from pdf_metadata_extraction_spark.sources import fixtures

N_BUCKETS = 64
MEGA_DOMAIN = "mega-domain.example"
_LANGS = ["en", "en", "en", "fr", "spa", "de", "en", "pt"]  # en-heavy like CC

_VOCAB = (
    "the of and to in a is that for it as was with be by on not he this are or "
    "his from at which but have an had they you were her she all would there been "
    "one their so an what up out if about who get which go me united nations "
    "assembly session resolution general debate opening paragraph rule september "
    "committee report agenda item decision document original english french spanish"
).split()

_ENTITIES = [
    "United Nations", "General Assembly", "Security Council", "World Bank",
    "European Union", "African Union", "Unesco", "Unicef", "World Health Organization",
    "International Court of Justice",
]

_EPOCH = datetime(2021, 1, 1, tzinfo=timezone.utc)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _words(doc_id: int, n: int, salt: str = "w") -> list[str]:
    return [_VOCAB[_h(f"{doc_id}:{salt}:{i}") % len(_VOCAB)] for i in range(n)]


def _sentence(doc_id: int, si: int) -> str:
    n = 6 + _h(f"{doc_id}:sl:{si}") % 12
    ws = _words(doc_id, n, salt=f"s{si}")
    s = " ".join(ws)
    # deterministic entity mention ~ every other sentence → triple fodder
    if _h(f"{doc_id}:e:{si}") % 2 == 0:
        ent = _ENTITIES[_h(f"{doc_id}:ent:{si}") % len(_ENTITIES)]
        s = s + " " + ent
    return s.capitalize() + "."


def synth_blocks(doc_id: int) -> list[tuple[str, str]]:
    """Deterministic (tag, text) content blocks for one web doc."""
    title = " ".join(_words(doc_id, 3 + _h(f"{doc_id}:tl") % 4, salt="t")).title()
    blocks: list[tuple[str, str]] = [("h1", title)]
    n_paras = 2 + _h(f"{doc_id}:np") % 5
    si = 0
    for p in range(n_paras):
        n_sents = 2 + _h(f"{doc_id}:ns:{p}") % 4
        para = " ".join(_sentence(doc_id, si + j) for j in range(n_sents))
        si += n_sents
        blocks.append(("p", para))
    if _h(f"{doc_id}:li") % 3 == 0:
        for j in range(3 + _h(f"{doc_id}:nl") % 4):
            blocks.append(("li", "• " + " ".join(_words(doc_id, 3, salt=f"l{j}"))))
    return blocks


def jsonld_island(doc_id: int, title: str) -> str | None:
    """Deterministic schema.org JSON-LD island for ~1/3 of synthetic
    docs (the web-native structured-data channel operators/structured.py
    extracts). Lives in <head> inside <script> — the extractor strips
    both, so the golden ``text`` column is untouched.

    Three wild-shape variants round-robin per doc hash (r5 verdict
    #4): a single Article object, an ARRAY root
    ``[{Article},{BreadcrumbList}]`` (the news-site shape), and an
    ``@graph`` container wrapping the Article plus a WebSite node."""
    import json as _json

    if _h(f"{doc_id}:ld") % 3 != 0:
        return None
    author = _ENTITIES[_h(f"{doc_id}:lda") % len(_ENTITIES)]
    date = (_EPOCH + timedelta(days=_h(f"{doc_id}:ldd") % 365)).strftime(
        "%Y-%m-%d"
    )
    article = (
        '{"@type":"Article",'
        f'"headline":{_json.dumps(title)},'
        f'"datePublished":"{date}",'
        f'"author":{{"@type":"Person","name":{_json.dumps(author)}}}}}'
    )
    shape = _h(f"{doc_id}:lds") % 3
    if shape == 1:
        return (
            f'[{article},'
            '{"@type":"BreadcrumbList","name":"crumbs"}]'
        )
    if shape == 2:
        return (
            '{"@context":"https://schema.org","@graph":'
            f'[{article},'
            f'{{"@type":"WebSite","name":"site {doc_id % 11}"}}]}}'
        )
    return '{"@context":"https://schema.org",' + article[1:]


def head_table(doc_id: int) -> str:
    """Deterministic entity-attribute HTML table for ~1/4 of synthetic
    docs (the WebTables channel operators/structured.table_triples
    lifts). Lives in <head> like the JSON-LD island — the extractor
    strips head content, so the golden ``text`` column is untouched
    (pinned by the byte-identity goldens)."""
    if _h(f"{doc_id}:tbl") % 4 != 0:
        return ""
    e1 = _ENTITIES[_h(f"{doc_id}:t1") % len(_ENTITIES)]
    e2 = _ENTITIES[_h(f"{doc_id}:t2") % len(_ENTITIES)]
    return (
        "<table><tr><th>Name</th><th>Category</th><th>Issue</th></tr>"
        f"<tr><td>{e1}</td><td>cat {doc_id % 7}</td>"
        f"<td>{doc_id % 100}</td></tr>"
        f"<tr><td>{e2}</td><td>cat {(doc_id + 1) % 7}</td>"
        f"<td>{(doc_id * 3) % 100}</td></tr></table>"
    )


def blocks_to_html(doc_id: int, blocks: list[tuple[str, str]]) -> bytes:
    """Messy-but-valid HTML around the content blocks (boilerplate included)."""
    nav = f'<nav><a href="/">Home</a> <a href="/{doc_id % 7}">Cat {doc_id % 7}</a></nav>'
    ld = jsonld_island(doc_id, blocks[0][1])
    # ~2% of pages declare a meta refresh (the alias-shell population
    # kg_run's follow_redirects gate drops); a void <meta> in <head>
    # contributes no text, so the golden `text` column is untouched
    refresh = (
        f'<meta http-equiv="refresh" content="0; url=/doc/{doc_id - 1}"/>'
        if doc_id > 0 and _h(f"{doc_id}:rfr") % 50 == 0
        else ""
    )
    parts = [
        "<!doctype html><html><head>",
        f"<title>doc {doc_id}</title>",
        refresh,
        "<style>body{margin:0}</style>",
        '<script>var tracker="x";</script>',
        (
            f'<script type="application/ld+json">{ld}</script>'
            if ld is not None else ""
        ),
        head_table(doc_id),
        "</head><body>",
        f"<header><span>Example Site &mdash; issue {doc_id % 100}</span></header>",
        nav,
        "<main>",
    ]
    for tag, txt in blocks:
        import html as _html

        esc = _html.escape(txt)
        # exercise inline markup + entities the extractor must normalize
        if _h(f"{doc_id}:{tag}:{len(txt)}") % 5 == 0 and " " in esc:
            a, b = esc.split(" ", 1)
            esc = f"<b>{a}</b> {b}"
        parts.append(f"<{tag}>{esc}</{tag}>")
    parts += [
        "</main>",
        f'<footer>&copy; 2021 example.org &middot; id {doc_id}</footer>',
        "<script>console.log(1)</script></body></html>",
    ]
    return "".join(parts).encode("utf-8")


def row_for_doc(doc_id: int, skew_frac: float = 0.5) -> dict:
    """Pure function id → pages row."""
    fixture_names = fixtures.FIXTURE_NAMES
    if doc_id < len(fixture_names):
        name = fixture_names[doc_id]
        data = fixtures.fixture_pdf2xml_bytes(name)
        url = f"https://fixtures.example.org/{name}"
        lang = {"lorem_fr": "fr", "spanish": "spa"}.get(name, "en")
        text = extract_text_of_bytes(data)
    else:
        if (_h(f"{doc_id}:dom") % 1000) < int(skew_frac * 1000):
            domain = MEGA_DOMAIN
        else:
            domain = f"site-{_h(f'{doc_id}:d2') % 997}.example.org"
        url = f"https://{domain}/doc/{doc_id}"
        blocks = synth_blocks(doc_id)
        data = blocks_to_html(doc_id, blocks)
        text = tokens_to_text([t for _, t in blocks])
        lang = _LANGS[_h(f"{doc_id}:lang") % len(_LANGS)]
    ts = _EPOCH + timedelta(seconds=_h(f"{doc_id}:ts") % (365 * 24 * 3600))
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),
        "html": data,
        "text": text,
        "lang": lang,
    }


def generate_pages(spark: SparkSession, n_docs: int, skew_frac: float = 0.5,
                   partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages DF (map-only over spark.range)."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [row_for_doc(int(i), skew_frac) for i in pdf["id"].values]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    df = base.mapInPandas(gen, schema=schema)
    # Iceberg stand-in: materialized bucket column = bucket(N_BUCKETS, url)
    return df.withColumn("url_bucket", F.pmod(F.crc32(F.col("url")), F.lit(N_BUCKETS)).cast("int"))


def write_pages(spark: SparkSession, path: str, n_docs: int, skew_frac: float = 0.5) -> None:
    # repartition by the bucket column first → exactly one file per bucket
    # (without it every task writes a sliver of every bucket: tasks×buckets
    # tiny files, which dominates both write and scan time)
    generate_pages(spark, n_docs, skew_frac).repartition("url_bucket").write.mode(
        "overwrite"
    ).partitionBy("url_bucket").parquet(path)
