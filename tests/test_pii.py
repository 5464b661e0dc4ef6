"""PII detection + scrubbing (emails, IPv4, phones)."""

from pdf_metadata_extraction_spark.operators.pii import detect_pii, scrub_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    d = detect_pii(df).collect()[0]
    s = scrub_pii(df).collect()[0]["clean_text"]
    return d, s


def test_email_and_ip_scrub(spark):
    d, s = _one(spark, "mail bob.smith+x@sub.example.org or 10.0.255.1 now")
    assert (d["n_emails"], d["n_ipv4"], d["n_phones"]) == (1, 1, 0)
    assert s == "mail <EMAIL> or <IP> now"


def test_phone_shapes(spark):
    d, s = _one(spark, "call +44 (0) 20-7946 0958 or 555-867-5309 today")
    assert d["n_phones"] == 2
    assert s == "call <PHONE> or <PHONE> today"


def test_bare_digit_runs_survive(spark):
    """Precision-first: years, counts, ids without phone shape stay."""
    d, s = _one(spark, "in 2021 2022 we saw 123456789 events")
    assert (d["n_emails"], d["n_ipv4"], d["n_phones"]) == (0, 0, 0)
    assert s == "in 2021 2022 we saw 123456789 events"


def test_scrub_order_email_before_phone(spark):
    """An email whose local part is digit-heavy must become <EMAIL>,
    not get its digits clipped by the phone pass — and the audit counts
    reconcile with the scrub (no phantom phone: it was redacted as part
    of the email)."""
    d, s = _one(spark, "x 555-867-5309@example.com y")
    assert (d["n_emails"], d["n_ipv4"], d["n_phones"]) == (1, 0, 0)
    assert s == "x <EMAIL> y"
    assert s.count("<PHONE>") == d["n_phones"]


def test_ipv6_scrub(spark):
    """Full 8-group and ::-compressed forms are scrubbed; times
    ('12:30'), short hex pairs ('aa:bb') and bare loopback ('::1')
    survive (precision-first contract)."""
    d, s = _one(
        spark,
        "a 2001:0db8:85a3:0000:0000:8a2e:0370:7334 b 2001:db8::7 "
        "at 12:30 via aa:bb or ::1 end",
    )
    assert d["n_ipv6"] == 2
    assert s == "a <IP> b <IP> at 12:30 via aa:bb or ::1 end"


def test_card_luhn_gating(spark):
    """Card candidates are scrubbed ONLY when the Luhn checksum passes:
    grouped, dashed, contiguous and 15-digit Amex forms all validate;
    a same-shaped non-Luhn number survives."""
    d, s = _one(
        spark,
        "pay 4111 1111 1111 1111 or 5500-0000-0000-0004 or "
        "4012888888881881 or 378282246310005 but not 1234 5678 9012 3456",
    )
    assert d["n_cc"] == 4
    assert s == "pay <CC> or <CC> or <CC> or <CC> but not 1234 5678 9012 3456"


def test_iban_mod97_gating(spark):
    """IBANs are scrubbed only when the country length matches the
    ISO 13616 registry AND the ISO 7064 mod-97 checksum is 1: valid
    German/British/French (letter-bearing tail) forms redact; a
    checksum-broken sibling, a wrong-length body and an unknown
    country survive."""
    d, s = _one(
        spark,
        "a DE89370400440532013000 b GB29NWBK60161331926819 c "
        "FR1420041010050500013M02606 bad DE89370400440532013001 "
        "short DE8937040044 alien ZZ89370400440532013000 end",
    )
    assert d["n_iban"] == 3
    assert s == (
        "a <IBAN> b <IBAN> c <IBAN> bad DE89370400440532013001 "
        "short DE8937040044 alien ZZ89370400440532013000 end"
    )


def test_card_count_reconciles_with_repeats(spark):
    """The same valid card twice: both occurrences counted AND both
    scrubbed (counts == inserted tokens)."""
    d, s = _one(spark, "a 4111111111111111 b 4111111111111111 c")
    assert d["n_cc"] == 2
    assert s == "a <CC> b <CC> c"


def test_scrub_is_map_only(spark):
    df = scrub_pii(spark.createDataFrame([("a",)], "text string"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_signals_values(spark):
    """Pinned fractions on known inputs (Gopher repetition family)."""
    from pdf_metadata_extraction_spark.operators.textstats import (
        repetition_signals,
    )

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),
         (2, "all words here are unique tokens"),
         (3, "ab ab cd ab ab cd"),
         (4, ""),
         (5, "one")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in repetition_signals(df).collect()}
    assert rows[1]["dup_word_frac"] == 0.75
    assert rows[1]["dup_2gram_frac"] == 0.666667
    assert rows[1]["dup_3gram_frac"] == 0.5
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[3]["n_words"] == 6 and rows[3]["dup_2gram_frac"] == 0.4
    assert rows[4]["n_words"] == 0 and rows[4]["dup_word_frac"] == 0.0
    assert rows[5]["dup_3gram_frac"] == 0.0
    # map-only: pure array expressions, no shuffle
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_scrub_works_in_streaming(spark, tmp_path):
    """The scrub/detect stages are pure map-only expressions, so they
    drop into a Structured Streaming plan unchanged (the ingest shape:
    readStream -> scrub -> sink)."""
    import json

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "b0.json").write_text("\n".join(
        json.dumps(r) for r in [
            {"doc_id": 1, "text": "mail a@b.co now"},
            {"doc_id": 2, "text": "call 555-867-5309 now"},
            {"doc_id": 3, "text": "clean 2021"},
        ]
    ))
    stream = spark.readStream.schema("doc_id long, text string").json(str(feed))
    out = scrub_pii(detect_pii(stream))
    q = (
        out.writeStream.format("memory").queryName("pii_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM pii_stream").collect()}
    assert rows[1]["clean_text"] == "mail <EMAIL> now"
    assert rows[2]["clean_text"] == "call <PHONE> now"
    assert rows[3]["clean_text"] == "clean 2021"
    assert (rows[1]["n_emails"], rows[2]["n_phones"]) == (1, 1)


def test_pii_cross_engine_fuzz(spark):
    """Differential fuzz: 300 seeded PII-ish strings (digit runs,
    partial emails/IPs/phones, nested and adjacent patterns) through
    Spark detect+scrub and the DuckDB oracle transform — every count
    and the scrubbed text must agree byte-exactly."""
    import random

    import duckdb
    import pandas as pd

    from __spark_entry__ import _pii_transform_sql

    rng = random.Random(7)
    frags = [
        "a", "bob", "x.y", "@", "mail", ".com", ".c", "10.0.0.1",
        "555", "-", "867", "5309", "+1 ", "(555) ", "123", " ", ".",
        "..", "2021", "@@", "1.2.3.4.5", "999.999.999.999", "()",
        "a@b", "@b.co", "+", "ab@cd.ef", " end",
        # IPv6-ish and card-ish material (round-4: new classes)
        "fe80::1", "2001:db8::7", "::", ":", "aa:bb", "12:30",
        "4111 1111 1111 1111", "5500-0000-0000-0004",
        "1234 5678 9012 3456", "4012888888881881", "123456789012",
        "12345678901234567890", "4111", "1111",
        "DE89370400440532013000", "DE89370400440532013001",
        "GB29NWBK60161331926819", "NO9386011117947", "DE89", "XX00",
    ]
    texts = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 14)))
        for _ in range(294)
    ] + ["", "@", "1.2.3.4", "x 555-867-5309@example.com 10.0.0.1 y",
         "v6 2001:0db8:85a3:0000:0000:8a2e:0370:7334 full",
         "cards 378282246310005 and 4111-1111-1111-1111 pay",
         "acct FR1420041010050500013M02606 or DE89370400440532013000 no"]

    sdf = scrub_pii(detect_pii(spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ))).select("doc_id", "n_emails", "n_ipv6", "n_ipv4", "n_iban", "n_cc",
               "n_phones", "clean_text")
    got = {r["doc_id"]: tuple(r)[1:] for r in sdf.collect()}

    db = duckdb.connect()
    db.register("aug", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    want = {int(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]),
                        int(r[5]), int(r[6]), r[7])
            for r in db.sql("WITH " + _pii_transform_sql()).fetchall()}
    mismatches = {i: (got[i], want[i])
                  for i in range(len(texts)) if got[i] != want[i]}
    assert not mismatches, (len(mismatches), dict(list(mismatches.items())[:5]))


def test_ipv4_octet_range_gate(spark):
    """Precision-first IPv4: octets must be 0-255 without leading
    zeros — impossible quads and octal-ambiguous forms survive."""
    d, s = _one(spark, "a 10.0.255.1 b 999.999.999.999 c 256.1.1.1 "
                       "d 010.001.001.001 e 0.0.0.0 f")
    assert d["n_ipv4"] == 2
    assert s == "a <IP> b 999.999.999.999 c 256.1.1.1 d 010.001.001.001 e <IP> f"


def test_quality_filter_equals_joined_operators(spark):
    """Drift guard: quality_filter's single-pass fused expressions must
    keep EXACTLY the rows that quality_score ⋈ repetition_signals with
    the same thresholds keep (edit them in lockstep)."""
    from pyspark.sql import functions as F

    from pdf_metadata_extraction_spark.operators.textstats import (
        quality_filter,
        quality_score,
        repetition_signals,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away today"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (3, "ok"),
        (4, "12345 67890 " * 20),
        (5, "a decent length sentence with mostly alphabetic words and few digits here"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fused = {tuple(r) for r in quality_filter(df).collect()}
    q = quality_score(df, "doc_id").select("id", "quality")
    r = repetition_signals(df).select("id", "dup_word_frac")
    joined = {
        tuple(x)
        for x in q.join(r, "id")
        .where((F.col("quality") >= 0.7) & (F.col("dup_word_frac") <= 0.3))
        .collect()
    }
    assert fused == joined
    assert any(x[0] == 1 for x in fused)       # good prose survives
    assert not any(x[0] in (2, 3) for x in fused)  # spam/short dropped
    # single pass: no join, no shuffle
    plan = quality_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_link_resolution_works_in_streaming(spark, tmp_path):
    """resolve_hrefs (classes + RFC 3986 merge-path fold) is map-only
    expressions, so it drops into a Structured Streaming plan
    unchanged — the crawl-ingest shape (readStream -> resolve ->
    sink)."""
    import json

    from pdf_metadata_extraction_spark.operators.links import (
        extract_links,
        resolve_hrefs,
    )

    feed = tmp_path / "pages_feed"
    feed.mkdir()
    (feed / "b0.json").write_text("\n".join(
        json.dumps(r) for r in [
            {"url": "https://a.com/d/p",
             "html_text": '<a href="page2.html">x</a><a href="//cdn.b.net/l">y</a>'},
            {"url": "https://c.org/",
             "html_text": '<a href="mailto:z@c.org">m</a>'},
        ]
    ))
    stream = spark.readStream.schema("url string, html_text string").json(str(feed))
    out = resolve_hrefs(extract_links(stream))
    q = (
        out.writeStream.format("memory").queryName("links_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["href"], r["href_class"], r["abs_url"])
           for r in spark.sql("SELECT * FROM links_stream").collect()}
    assert got == {
        ("page2.html", "path_relative", "https://a.com/d/page2.html"),
        ("//cdn.b.net/l", "protocol_relative", "https://cdn.b.net/l"),
        ("mailto:z@c.org", "non_http_scheme", None),
    }


def test_luhn_iban_expressions_match_python_reference(spark):
    """Semantic fuzz (cross-engine fuzz proves the MIRROR; this proves
    the MATH): the Luhn and IBAN-mod-97 expression folds agree with
    independent pure-Python implementations on 400 random candidates,
    including single-character mutations of valid ones."""
    import random

    from pyspark.sql import functions as F

    from pdf_metadata_extraction_spark.operators.pii import (
        IBAN_LENGTHS,
        _iban_ok,
        _luhn_ok,
    )

    def py_luhn(s):
        d = [int(c) for c in s if c.isdigit()][::-1]
        t = 0
        for i, x in enumerate(d):
            if i % 2 == 1:
                x *= 2
                if x > 9:
                    x -= 9
            t += x
        return t % 10 == 0

    def py_iban(s):
        if len(s) != IBAN_LENGTHS.get(s[:2], -1):
            return False
        r = s[4:] + s[:4]
        acc = 0
        for c in r:
            if c.isdigit():
                acc = (acc * 10 + int(c)) % 97
            else:
                acc = (acc * 100 + (ord(c) - 55)) % 97
        return acc == 1

    rng = random.Random(13)
    cards = []
    for _ in range(200):
        n = rng.randint(13, 19)
        cards.append("".join(rng.choice("0123456789") for _ in range(n)))
    valid = ["4111111111111111", "378282246310005", "4012888888881881"]
    for v in valid:
        for _ in range(10):
            i = rng.randrange(len(v))
            cards.append(v[:i] + rng.choice("0123456789") + v[i + 1:])
    ibans = []
    vbase = ["DE89370400440532013000", "GB29NWBK60161331926819",
             "FR1420041010050500013M02606", "NO9386011117947"]
    for v in vbase:
        ibans.append(v)
        for _ in range(20):
            i = rng.randrange(2, len(v))
            ibans.append(v[:i] + rng.choice("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ") + v[i + 1:])
    for _ in range(100):
        cc = rng.choice(list(IBAN_LENGTHS))
        n = IBAN_LENGTHS[cc] + rng.choice([-1, 0, 0, 1])
        ibans.append(cc + "".join(
            rng.choice("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ")
            for _ in range(max(n - 2, 0))
        ))

    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cards)], "i long, c string"
    ).select("i", "c", _luhn_ok(F.col("c")).alias("ok"))
    bad = [(r["c"], r["ok"], py_luhn(r["c"])) for r in cdf.collect()
           if r["ok"] != py_luhn(r["c"])]
    assert not bad, bad[:5]

    idf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(ibans)], "i long, c string"
    ).select("i", "c", F.coalesce(_iban_ok(F.col("c")), F.lit(False)).alias("ok"))
    badi = [(r["c"], r["ok"], py_iban(r["c"])) for r in idf.collect()
            if r["ok"] != py_iban(r["c"])]
    assert not badi, badi[:5]


def test_encoding_signals_values(spark):
    """Pinned encoding-damage counts: replacement chars, control bytes
    (tab/newline/CR exempt), mojibake lead chars; clean prose scores
    all-zero; map-only plan."""
    from pdf_metadata_extraction_spark.operators.textstats import (
        encoding_signals,
    )

    rows = [
        (1, "ok text\twith\ntabs and newlines"),
        (2, "bad � here � too"),
        (3, "ctrl \x01\x02\x9f end"),
        (4, "moji Ã© and Ã¼ twice"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in encoding_signals(df).collect()}
    assert (got[1]["n_replacement"], got[1]["n_control"],
            got[1]["n_mojibake_lead"]) == (0, 0, 0)
    assert got[2]["n_replacement"] == 2
    assert got[3]["n_control"] == 3
    assert got[4]["n_mojibake_lead"] == 2
    assert got[5]["bad_char_ratio"] == 0.0
    plan = encoding_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
