"""WARC record source — the wire format a Common-Crawl-style corpus
actually arrives in, parsed into the BASELINE.json ``input_hint`` page
shape ``(url string, warc_ts timestamp, html binary)``.

Why a Python record parser is the right call here (§2.9 contract —
"UDFs are the slow path" — still holds): WARC is a length-prefixed
binary *record* format (ISO 28500). Record boundaries are only
discoverable by reading each record's ``Content-Length`` header, so no
declarative expression can split a blob — exactly the carve-out the
build rules allow ("binary record formats genuinely can't be expressed
with built-ins"). The parser is an Arrow-batched ``mapInPandas`` doing
bytes-level slicing only — ``bytes.find`` / length arithmetic, never
per-character Python, never a regex over the binary.

Scale shape: one input row = one WARC *file* (or one gzip member
range). Common Crawl ships records as independently-concatenated gzip
members precisely so a reader can start anywhere; on a real cluster the
listing table carries (path, offset, length) ranges and this parser
maps over the fetched ranges — embarrassingly parallel, no shuffle.
In-sandbox the blobs arrive as a binary column (no object store), and
the plumbing — schema, batch iteration, record slicing, malformed-
record policy — is the real thing.

Documented contract (mirrored by the ``warc_roundtrip`` oracle):
- Only ``WARC-Type: response`` records yield rows; request/metadata/
  warcinfo records are skipped (Common Crawl interleaves them).
- The HTTP response envelope is stripped: ``html`` is the bytes after
  the first CRLFCRLF of the payload. Identity transfer coding only
  (Common Crawl re-chunks to identity); chunked records quarantine —
  see below.
- ``warc_ts`` parses the ISO 8601 ``WARC-Date`` (second precision, Z).
- Per-record gzip (magic ``1f 8b``) is sniffed and all members
  inflated before splitting; plain concatenation parses as-is.
- Malformed records (missing Content-Length / truncated body / no
  Target-URI / bad WARC-Date) and records whose HTTP envelope declares
  ``Transfer-Encoding: chunked`` (identity-only contract — emitting
  the raw chunked body would interleave chunk-size lines into the
  html) are QUARANTINED: dropped and counted into the optional
  ``quarantine`` accumulator — never a job failure and never mangled
  output: one broken record in a 100 TB crawl must not kill the
  stage (r5 verdict #7, pinned by the chunked/truncation fixtures).
- ``read_warc_ranges`` is the (path, offset, length) member-range
  listing-table path: each listing row fetches exactly its byte range
  (pyarrow.fs — local paths and object stores alike) and feeds the
  same parser, the start-anywhere layout Common Crawl gzip members
  exist for.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame

_CRLF2 = b"\r\n\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

WARC_PAGE_SCHEMA = "url string, warc_ts timestamp, html binary"


def build_warc_bytes(records, gzip_members: bool = False) -> bytes:
    """Serialize ``(url, iso_ts, html_bytes)`` triples as a WARC/1.0
    byte stream of ``response`` records wrapping a minimal HTTP/1.1
    200 envelope — the deterministic writer the tests and the oracle
    harness share (no wall clock, no uuids: WARC-Record-ID is a hash
    counter so identical inputs serialize identically).

    ``gzip_members=True`` compresses each record as its own gzip
    member (the Common Crawl layout) via a fresh raw-deflate-with-
    header compressor per record — members concatenate legally.
    """
    import hashlib

    out = []
    for url, iso_ts, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(html)).encode() + _CRLF2 + html
        )
        rid = hashlib.md5(
            (url + "|" + iso_ts).encode("utf-8", "surrogateescape")
        ).hexdigest()
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">\r\n"
            b"WARC-Target-URI: " + url.encode("utf-8", "surrogateescape")
            + b"\r\n"
            b"WARC-Date: " + iso_ts.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + _CRLF2
            + http + _CRLF2
        )
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


def _inflate_members(blob: bytes) -> bytes:
    """Inflate a concatenation of gzip members (zlib stops at each
    member boundary; loop over unused_data)."""
    parts, rest = [], blob
    while rest:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        parts.append(d.decompress(rest))
        parts.append(d.flush())
        rest = d.unused_data
    return b"".join(parts)


def _parse_blob(blob: bytes, counts: dict | None = None):
    """Yield (url, warc_ts datetime, html bytes) per well-formed
    identity-coded response record; malformed/chunked records are
    quarantined — skipped and tallied into ``counts['quarantined']``
    when a dict is passed (request/metadata/warcinfo records are
    SKIPPED-by-design, not quarantine)."""

    def _q():
        if counts is not None:
            counts["quarantined"] = counts.get("quarantined", 0) + 1

    if blob is None or len(blob) == 0:
        return
    if blob[:2] == _GZIP_MAGIC:
        try:
            blob = _inflate_members(blob)
        except zlib.error:
            _q()  # undecodable member: one quarantined unit
            return
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = blob.find(_CRLF2, start)
        if hdr_end < 0:
            _q()  # header block never terminates: truncated record
            break
        headers = {}
        for line in blob[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            _q()
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            _q()  # truncated final record
            break
        pos = body_end  # next find() skips the inter-record CRLFs
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri")
        date = headers.get(b"warc-date")
        if not uri or not date:
            _q()
            continue
        try:
            ts = datetime.strptime(
                date.decode("ascii"), "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=timezone.utc)
        except ValueError:
            _q()
            continue
        payload = blob[body_start:body_end]
        sep = payload.find(_CRLF2)
        if sep >= 0 and b"chunked" in _http_transfer_coding(
            payload[:sep]
        ):
            _q()  # identity-only contract: never emit a chunked body
            continue
        html = payload[sep + 4:] if sep >= 0 else payload
        yield (
            uri.decode("utf-8", "surrogateescape"),
            ts,
            html,
        )


def _http_transfer_coding(envelope: bytes) -> bytes:
    """Lower-cased ``Transfer-Encoding`` value of an HTTP header block
    (empty bytes when absent) — bytes-level scan, no regex."""
    for line in envelope.split(b"\r\n"):
        k, sep, v = line.partition(b":")
        if sep and k.strip().lower() == b"transfer-encoding":
            return v.strip().lower()
    return b""


def parse_warc(
    blobs: DataFrame, blob_col: str = "content", quarantine=None
) -> DataFrame:
    """Parse a DataFrame of WARC byte blobs (one file/member-range per
    row — e.g. ``spark.read.format("binaryFile")``'s ``content``) into
    the input_hint page shape ``(url, warc_ts, html)``.

    Map-only ``mapInPandas``; each Arrow batch's blobs are split
    independently, so parallelism == input split count and a 100 TB
    crawl parses with zero shuffles. Output rows per input row are
    unbounded (one blob → many records) — exactly what mapInPandas is
    for (a pandas_udf could not change the row count).

    ``quarantine``: optional ``spark.sparkContext.accumulator(0)`` —
    incremented once per quarantined record (truncated / chunked /
    header-less; see module contract) when the stage EXECUTES. Like
    every Spark accumulator it is an at-least-once task-retry counter:
    an audit signal for the lineage metrics row, never a value results
    may depend on.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, htmls = [], [], []
            counts: dict = {}
            for blob in pdf[blob_col]:
                for url, ts, html in _parse_blob(blob, counts):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            if quarantine is not None and counts.get("quarantined"):
                quarantine.add(counts["quarantined"])
            # explicit dtypes: an empty batch must not degrade the
            # timestamp column to float64 (Arrow can't cast that)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts": pd.to_datetime(
                        pd.Series(tss, dtype="object"), utc=True
                    ),
                    "html": pd.Series(htmls, dtype="object"),
                }
            )

    return blobs.mapInPandas(gen, schema=WARC_PAGE_SCHEMA)


def read_warc_ranges(spark, listing: DataFrame) -> DataFrame:
    """The member-range listing-table path: ``listing`` rows
    ``(path string, offset long, length long)`` each name one gzip
    member (or identity-framed record run) inside a WARC file; fetch
    EXACTLY that byte range and parse it with the same record splitter
    — the start-anywhere layout Common Crawl ships gzip members for.

    Scale shape: map-only like ``parse_warc`` — one ranged read per
    listing row on the executor (pyarrow.fs resolves local paths and
    object-store URIs alike; a ranged GET on S3-compatible stores),
    zero shuffles, parallelism == listing partitioning. The driver
    never sees blob bytes; the listing table is the only thing it
    plans over."""
    import pyarrow.fs as pafs

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for path, off, length in zip(
                pdf["path"], pdf["offset"], pdf["length"]
            ):
                fs, rel = pafs.FileSystem.from_uri(str(path)) if "://" in str(
                    path
                ) else (pafs.LocalFileSystem(), str(path))
                with fs.open_input_file(rel) as f:
                    f.seek(int(off))
                    blobs.append(f.read(int(length)))
            yield pd.DataFrame({"content": pd.Series(blobs, dtype="object")})

    blobs = listing.mapInPandas(fetch, schema="content binary")
    return parse_warc(blobs)
