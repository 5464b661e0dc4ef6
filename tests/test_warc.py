"""WARC record source (sources/warc.py): deterministic writer ↔
parser roundtrip, record-type filtering, malformed-record policy, and
gzip-member handling."""

from pdf_metadata_extraction_spark.sources.warc import (
    _parse_blob,
    build_warc_bytes,
    parse_warc,
)

RECS = [
    ("https://a.example/x", "2024-01-02T03:04:05Z", b"<html>A</html>"),
    # non-ascii body bytes survive untouched (html is opaque binary)
    ("https://b.example/y", "2024-06-07T08:09:10Z",
     b"<html>B \xe2\x82\xac</html>"),
]


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        got = list(_parse_blob(build_warc_bytes(RECS, gzip_members=gz)))
        assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in RECS]
        assert got[0][1].isoformat() == "2024-01-02T03:04:05+00:00"


def test_warc_skips_non_response_and_malformed():
    extra = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 5\r\n\r\n"
        b"GET /\r\n\r\n"
        # response record with no Content-Length: skipped, parse resumes
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n\r\n"
    )
    got = list(_parse_blob(extra + build_warc_bytes(RECS)))
    assert [u for u, _, _ in got] == [u for u, _, _ in RECS]


def test_warc_truncated_final_record_drops_only_it():
    blob = build_warc_bytes(RECS)
    # cut into the final record's body: first record still parses
    got = list(_parse_blob(blob[: len(blob) - 8]))
    assert [u for u, _, _ in got] == [RECS[0][0]]
    assert list(_parse_blob(b"")) == []
    assert list(_parse_blob(None)) == []
    # corrupt gzip magic: whole blob dropped, no raise
    assert list(_parse_blob(b"\x1f\x8bnot-gzip")) == []


def test_parse_warc_dataframe(spark):
    df = spark.createDataFrame(
        [
            (build_warc_bytes(RECS, gzip_members=True),),
            (build_warc_bytes([], gzip_members=False) or b"",),
        ],
        "content binary",
    )
    out = parse_warc(df).orderBy("url").collect()
    assert [(r.url, bytes(r.html)) for r in out] == [
        (u, h) for u, h in ((u, h) for u, _, h in RECS)
    ]
    assert str(out[0].warc_ts).startswith("2024-01-02")


def test_parse_warc_streaming_ingest(spark, tmp_path):
    """The WARC source composes with Structured Streaming: parse_warc
    is a mapInPandas transform, so readStream(binaryFile) → parse_warc
    → parquet sink works unchanged — the continuous-crawl ingest
    shape. Two WARC files land as two micro-batched blobs; every
    record arrives exactly once."""
    import os

    warc_dir = tmp_path / "warc_in"
    os.makedirs(warc_dir)
    (warc_dir / "a.warc.gz").write_bytes(
        build_warc_bytes(RECS[:1], gzip_members=True)
    )
    (warc_dir / "b.warc").write_bytes(build_warc_bytes(RECS[1:]))
    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .load(str(warc_dir))
    )
    out_dir, ck_dir = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        parse_warc(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.url, bytes(r.html))
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == sorted((u, h) for u, _, h in RECS)


def build_chunked_record(url: str, iso_ts: str, chunks: list[bytes]) -> bytes:
    """A response record whose HTTP envelope declares chunked
    transfer-coding — what a crawler that did NOT re-code to identity
    would have written. The parser must quarantine it, never emit the
    chunk-size-line-interleaved body as html."""
    body = b"".join(
        b"%x\r\n%s\r\n" % (len(c), c) for c in chunks
    ) + b"0\r\n\r\n"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + body
    )
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + iso_ts.encode() + b"\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )


def test_warc_chunked_record_quarantined_not_mangled():
    chunked = build_chunked_record(
        "https://c.example/chunked", "2024-03-04T05:06:07Z",
        [b"<html>", b"C</html>"],
    )
    blob = build_warc_bytes(RECS[:1]) + chunked + build_warc_bytes(RECS[1:])
    counts: dict = {}
    got = list(_parse_blob(blob, counts))
    # neighbors parse, the chunked record is dropped and counted
    assert [u for u, _, _ in got] == [u for u, _, _ in RECS]
    assert counts == {"quarantined": 1}
    # and no emitted html carries chunk-size framing
    assert all(b"\r\n" not in h[:4] for _, _, h in got)


def test_warc_quarantine_counts_per_cause():
    counts: dict = {}
    blob = build_warc_bytes(RECS)
    list(_parse_blob(blob[: len(blob) - 8], counts))  # truncated final
    assert counts == {"quarantined": 1}
    counts = {}
    list(_parse_blob(b"\x1f\x8bnot-gzip", counts))  # undecodable gzip
    assert counts == {"quarantined": 1}
    counts = {}
    # well-formed stream: zero quarantine, and skipped-by-design
    # request records do NOT count
    extra = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 5\r\n\r\n"
        b"GET /\r\n\r\n"
    )
    got = list(_parse_blob(extra + blob, counts))
    assert len(got) == 2 and counts == {}


def test_parse_warc_quarantine_accumulator(spark):
    chunked = build_chunked_record(
        "https://c.example/chunked", "2024-03-04T05:06:07Z", [b"x"]
    )
    trunc = build_warc_bytes(RECS)[:-8]
    blobs = spark.createDataFrame(
        [(build_warc_bytes(RECS[:1]),), (chunked,), (trunc,)],
        "content binary",
    )
    acc = spark.sparkContext.accumulator(0)
    out = parse_warc(blobs, quarantine=acc).collect()
    # 1 clean + 1 from the truncated blob's intact first record
    assert sorted(r.url for r in out) == [RECS[0][0], RECS[0][0]]
    assert acc.value == 2  # the chunked record + the truncated record


def test_read_warc_ranges_member_listing(spark, tmp_path):
    """The (path, offset, length) listing-table path: each gzip member
    fetched by exact byte range parses to the same rows as the whole
    file — the start-anywhere contract."""
    from pdf_metadata_extraction_spark.sources.warc import (
        read_warc_ranges,
    )

    members = [
        build_warc_bytes(RECS[:1], gzip_members=True),
        build_warc_bytes(RECS[1:], gzip_members=True),
    ]
    path = tmp_path / "cc.warc.gz"
    path.write_bytes(b"".join(members))
    offsets, off = [], 0
    for m in members:
        offsets.append((str(path), off, len(m)))
        off += len(m)
    listing = spark.createDataFrame(
        offsets, "path string, offset long, length long"
    )
    got = sorted(
        (r.url, bytes(r.html)) for r in read_warc_ranges(spark, listing).collect()
    )
    assert got == sorted((u, h) for u, _, h in RECS)
    # a mid-member range (deliberately torn) quarantines, not errors
    torn = spark.createDataFrame(
        [(str(path), 10, 40)], "path string, offset long, length long"
    )
    assert read_warc_ranges(spark, torn).count() == 0
