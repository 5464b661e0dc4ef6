"""robots.txt rules (operators/robots.py): RFC 9309 group formation,
longest-match precedence, $-anchors, exact-agent override, defaults."""

from pdf_metadata_extraction_spark.operators.robots import (
    parse_robots,
    robots_allowed,
)

BODY_A = """# comments strip
User-agent: *
Disallow: /private/
Allow: /private/ok*
Disallow: /tmp$
Crawl-delay: 10
Disallow:

User-agent: googlebot
User-Agent: fancybot
Disallow: /only-for-star/
Allow: /

Disallow: /trailing-attaches-to-last-group/
"""
BODY_B = "Disallow: /x/\nUser-agent: *\nDisallow: /y/\n"


def _rules(spark):
    robots = spark.createDataFrame(
        [("a.example", BODY_A), ("b.example", BODY_B)],
        "host string, body string",
    )
    return parse_robots(robots)


def test_parse_robots_groups(spark):
    rows = {
        (r.host, r.agent, r.rule, r.pattern)
        for r in _rules(spark).collect()
    }
    # consecutive UA lines stack; blank lines do NOT end a group
    # (RFC 9309); trailing rules attach to the last group; rules
    # before any UA line are group-less and drop; empty Disallow
    # drops; Crawl-delay is skipped
    assert ("a.example", "googlebot", "disallow", "/only-for-star/") in rows
    assert ("a.example", "fancybot", "disallow", "/only-for-star/") in rows
    assert (
        "a.example", "googlebot", "disallow",
        "/trailing-attaches-to-last-group/",
    ) in rows
    assert not any(p == "/x/" for _, _, _, p in rows)
    assert not any(p == "" for _, _, _, p in rows)
    assert not any(r not in ("allow", "disallow") for _, _, r, _ in rows)


def test_robots_allowed_star_group(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.example/private/x", False),   # prefix disallow
            ("https://a.example/private/okay", True), # longer allow wins
            ("https://a.example/tmp", False),         # $ anchor
            ("https://a.example/tmpfile", True),      # $ doesn't match
            ("https://a.example/free", True),         # no match
            ("https://a.example", True),              # no path -> "/"
            ("https://b.example/x/1", True),          # group-less rule
            ("https://b.example/y/1", False),
            ("https://c.example/any", True),          # no robots at all
        ],
        "url string, exp boolean",
    )
    out = robots_allowed(urls, _rules(spark)).collect()
    assert all(r.robots_allowed == r.exp for r in out), [
        (r.url, r.robots_allowed, r.exp) for r in out
        if r.robots_allowed != r.exp
    ]


def test_robots_exact_agent_overrides_star(spark):
    urls = spark.createDataFrame(
        [
            # * group rules must NOT apply when an exact group exists
            ("https://a.example/private/x", True),
            # the exact group's own longest-match still applies
            ("https://a.example/only-for-star/z", False),
            ("https://a.example/anything", True),     # Allow: /
        ],
        "url string, exp boolean",
    )
    out = robots_allowed(urls, _rules(spark), agent="GoogleBot").collect()
    assert all(r.robots_allowed == r.exp for r in out), [
        (r.url, r.robots_allowed, r.exp) for r in out
        if r.robots_allowed != r.exp
    ]


def test_robots_pattern_metachars_literal(spark):
    robots = spark.createDataFrame(
        [("m.example", "User-agent: *\nDisallow: /a(b).c/\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [("https://m.example/a(b).c/x", False),
         ("https://m.example/a(b)Xc/x", True)],  # '.' is literal
        "url string, exp boolean",
    )
    out = robots_allowed(urls, parse_robots(robots)).collect()
    assert all(r.robots_allowed == r.exp for r in out)


def test_crawl_delays_selection_and_ceil(spark):
    from pdf_metadata_extraction_spark.operators.robots import crawl_delays

    rb = spark.createDataFrame(
        [
            ("a.example",
             "User-agent: *\nCrawl-delay: 2.3\n"
             "User-agent: mybot\nCrawl-delay: 7\nDisallow: /x\n"),
            ("b.example", "User-agent: *\nCrawl-delay: 10\nCrawl-delay: 4\n"),
            ("c.example", "User-agent: *\nCrawl-delay: garbage\n"),
            ("d.example", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, body string",
    )
    # exact group suppresses *, max of several values, ceil(2.3)=3,
    # garbage and no-declaration hosts emit no row
    assert {r.host: r.delay_s for r in
            crawl_delays(rb, agent="MyBot").collect()} == {
        "a.example": 7, "b.example": 10,
    }
    assert {r.host: r.delay_s for r in crawl_delays(rb).collect()} == {
        "a.example": 3, "b.example": 10,
    }


def test_schedule_frontier_slots_and_order(spark):
    from pdf_metadata_extraction_spark.operators.robots import (
        schedule_frontier,
    )

    ranks = spark.createDataFrame(
        [("a.example", 100), ("b.example", 5)], "host string, rank long"
    )
    urls = spark.createDataFrame(
        [(f"https://{h}/p{i}",)
         for h in ("a.example", "b.example") for i in range(3)],
        "url string",
    )
    # one slot: global order = rank desc then url
    sch = sorted(
        schedule_frontier(urls, ranks, n_slots=1).collect(),
        key=lambda r: r.fetch_order,
    )
    assert [r.url for r in sch] == (
        [f"https://a.example/p{i}" for i in range(3)]
        + [f"https://b.example/p{i}" for i in range(3)]
    )
    # all of a host's urls land in ONE slot at any n_slots (the
    # politeness-sharding invariant); rank-less hosts still schedule
    by_host = {}
    for r in schedule_frontier(urls, None, n_slots=64).collect():
        by_host.setdefault(r.host, set()).add(r.slot)
    assert all(len(s) == 1 for s in by_host.values())


def test_schedule_frontier_invariant_to_range_count_and_layout(spark):
    """fetch_order must be a pure function of the frontier contents:
    identical across num_ranges choices and input partition layouts
    (the two-pass global-rank discipline, r5 verdict directive #2)."""
    from pdf_metadata_extraction_spark.operators.robots import (
        schedule_frontier,
    )

    ranks = spark.createDataFrame(
        [(f"h{i}.example", i * 7 % 13) for i in range(20)],
        "host string, rank long",
    )
    urls = spark.createDataFrame(
        [(f"https://h{i % 20}.example/p{i}",) for i in range(300)],
        "url string",
    )
    ref = {
        (r.url, r.slot, r.fetch_order)
        for r in schedule_frontier(urls, ranks, n_slots=8,
                                   num_ranges=4).collect()
    }
    for variant in (
        schedule_frontier(urls, ranks, n_slots=8, num_ranges=1),
        schedule_frontier(urls, ranks, n_slots=8, num_ranges=17),
        schedule_frontier(
            urls.repartition(13), ranks, n_slots=8, num_ranges=4
        ),
    ):
        got = {(r.url, r.slot, r.fetch_order) for r in variant.collect()}
        assert got == ref
