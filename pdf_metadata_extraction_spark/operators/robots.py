"""robots.txt politeness rules (RFC 9309) — parse the per-host rule
files and gate a crawl frontier on them, as declarative DataFrame ops.

A web-scale crawler cannot fetch what a host forbids; the robots layer
sits between frontier discovery (operators/links.crawl_frontier) and
the fetch queue. Everything here is column expressions + two windows —
no UDFs: parsing is line-explode + regexp directive extraction, the
stateful "which user-agent group does this rule belong to" is a
running-sum window over the directive sequence, and RFC 9309
longest-match precedence is a single ``max(struct(...))`` aggregate
(specificity = pattern OCTET LENGTH, ties → allow — the
least-restrictive rule, per the RFC).

Documented contract (the oracle mirrors outcomes per fixture class):
- Group formation per RFC 9309 §2.1: consecutive ``User-agent`` lines
  stack onto one group; a ``User-agent`` line after rules starts a new
  group; rules before any ``User-agent`` line belong to no group and
  are ignored. Directive names are case-insensitive; ``#`` comments
  strip; unknown directives (Crawl-delay, Sitemap, ...) are skipped.
- Agent-group selection: the EXACT agent's groups when any exist for
  the host, else the ``*`` groups — never both (a url that matches
  only ``*`` rules is unmatched → allowed when an exact group exists).
  Agent tokens compare case-insensitively.
- ``Disallow:`` with an empty value is allow-all — dropped at parse.
- Patterns support ``*`` (any run, incl. empty) and a FINAL ``$``
  (end anchor); all other characters are literal (regex metachars in
  patterns — dots, parens — are escaped before the regex conversion).
- Match target: path + query (``/p?q=1``), '/' when the url has none.
- No matching rule → allowed (the RFC default).

Scale shape: robots bodies are one small file per host; rules tables
are host-keyed and tiny next to the frontier. ``robots_allowed`` joins
frontier⋈rules on host (AQE picks broadcast when the rule table is
small, the common case), evaluates every candidate rule with ONE
regexp per (url, rule) pair, and picks the winner with a hash
aggregate — no window over the frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIRECTIVE_RE = r"(?i)^[ \t]*(user-agent|allow|disallow|crawl-delay)[ \t]*:[ \t]*([^#]*?)[ \t]*(?:#.*)?$"

# regex metachars escaped to literal before '*' becomes '.*'; '*' and
# the (already-stripped) final '$' are the only pattern metachars.
_REGEX_META = list("\\.^$+?()[]{}|")


def _pattern_regex(pattern: Column) -> Column:
    """RFC 9309 pattern → Java regex: final ``$`` an anchor, ``*`` any
    run, everything else literal."""
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    for ch in _REGEX_META:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), body, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Parse robots.txt bodies into the rule table
    ``(host, agent, rule 'allow'|'disallow', pattern, pattern_len)``.

    One row per (rule line × user-agent line of its group). The group
    id is a running sum of group STARTS (a user-agent line whose
    previous directive is not a user-agent line) over the per-host
    directive sequence — the only stateful part of the format, as one
    lag + one running-sum window; agents then join back to rules on
    (host, group).
    """
    d = _directive_groups(robots, host_col, body_col)
    agents = d.where("is_ua").select(
        "host", "grp", F.lower("val").alias("agent")
    )
    rules = d.where(
        F.col("dir").isin("allow", "disallow") & (F.col("val") != "")
    ).select("host", "grp", F.col("dir").alias("rule"),
             F.col("val").alias("pattern"))
    return rules.join(agents, ["host", "grp"]).select(
        "host",
        "agent",
        "rule",
        "pattern",
        F.length("pattern").cast("long").alias("pattern_len"),
    )


def _directive_groups(
    robots: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """Shared line→directive→group lift: (host, idx, dir, val, is_ua,
    grp) per directive line. See parse_robots for the group rule."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias(
            "idx", "line"
        ),
    )
    d = lines.select(
        "host",
        "idx",
        F.lower(F.regexp_extract("line", DIRECTIVE_RE, 1)).alias("dir"),
        F.regexp_extract("line", DIRECTIVE_RE, 2).alias("val"),
    ).where(F.col("dir") != "")
    w = Window.partitionBy("host").orderBy("idx")
    return (
        d.withColumn("is_ua", F.col("dir") == "user-agent")
        .withColumn(
            "new_grp",
            F.col("is_ua")
            & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
        )
        .withColumn(
            "grp",
            F.sum(F.col("new_grp").cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )


def crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Per-host ``Crawl-delay`` (the de-facto politeness directive —
    not in RFC 9309 but honored by most non-Google crawlers) →
    ``(host, delay_s long)`` for the given agent, with the SAME group
    selection as robots_allowed: exact-agent groups suppress ``*``
    groups. Several applicable values keep the MAX (the conservative
    read). Unparseable/negative values drop; fractional seconds round
    up (a politeness floor must never round down). Hosts declaring no
    applicable delay emit no row — the caller's default applies."""
    d = _directive_groups(robots, host_col, body_col)
    agents = d.where("is_ua").select(
        "host", "grp", F.lower("val").alias("agent")
    )
    vals = d.where(
        (F.col("dir") == "crawl-delay")
        & F.col("val").rlike(r"^\d+(\.\d+)?$")
    ).select("host", "grp", F.ceil(F.col("val").cast("double")).alias("_d"))
    per_agent = vals.join(agents, ["host", "grp"])
    a = agent.lower()
    exact_hosts = (
        per_agent.where(F.col("agent") == a)
        .select("host").distinct().withColumn("_has_exact", F.lit(True))
    )
    sel = per_agent.join(exact_hosts, "host", "left").where(
        (F.col("agent") == a)
        | ((F.col("agent") == "*") & F.col("_has_exact").isNull())
    )
    return sel.groupBy("host").agg(
        F.max("_d").cast("long").alias("delay_s")
    )


def schedule_frontier(
    urls: DataFrame,
    ranks: DataFrame | None = None,
    n_slots: int = 256,
    url_col: str = "url",
    num_ranges: int = 32,
) -> DataFrame:
    """Politeness-aware fetch scheduling: assign every frontier url a
    ``slot`` (deterministic md5 bucket of its HOST — all of a host's
    urls land in ONE slot, so per-host serialization/delays are a
    per-slot concern, the classic frontier-sharding design from
    Mercator/Heritrix) and a ``fetch_order`` within the slot (host
    rank desc when ``ranks (host, rank)`` is given, then url — a total
    order, so re-runs schedule identically).

    Scale shape: the md5 bucket is a map-only expression (the SAME
    cross-engine formula as sample.hash_sample, so the oracle mirrors
    it bit-exactly). Slots bound per-host POLITENESS state, not
    partition size — a slot still holds |frontier| / n_slots rows, so
    within-slot ordering must never be a single-task window. It is
    computed with the two-pass global-rank discipline from
    ``packing.global_rank``: range-partition the frontier on the total
    order ``(slot, rank desc, url)`` into ``num_ranges`` ranges,
    collect the ``num_ranges`` per-range row counts (NOT data rows),
    broadcast the running prefixes, and take an intra-range
    ``row_number`` — every window partition is a range of
    ~|frontier| / num_ranges rows, sized to the cluster by the caller.
    ``fetch_order`` = global rank − (slot's first global rank) + 1 via
    a broadcast ``n_slots``-row aggregate; the result is identical to
    a per-slot ``row_number`` and invariant to ``num_ranges`` and
    input layout (pinned by tests)."""
    from pdf_metadata_extraction_spark.operators.packing import global_rank
    from pdf_metadata_extraction_spark.operators.urlnorm import URL_RE

    u = urls.withColumn(
        "_host", F.lower(F.regexp_extract(F.col(url_col), URL_RE, 2))
    ).withColumn(
        "slot",
        (
            F.conv(F.substring(F.md5(F.col("_host")), 1, 15), 16, 10)
            .cast("long") % n_slots
        ).cast("long"),
    )
    if ranks is not None:
        u = u.join(
            ranks.select(F.col("host").alias("_host"),
                         F.col("rank").alias("_rank")),
            "_host", "left",
        )
    else:
        u = u.withColumn("_rank", F.lit(0).cast("long"))
    # ascending surrogate for "rank desc" so the range partitioner and
    # the intra-range row_number share one ascending total order
    u = u.withColumn(
        "_negrank", (-F.coalesce(F.col("_rank"), F.lit(0))).cast("long")
    )
    ranked = global_rank(
        u, ["slot", "_negrank", url_col], num_ranges=num_ranges,
        rank_col="_grnk",
    )
    slot_base = ranked.groupBy("slot").agg(
        F.min("_grnk").alias("_base")
    )  # rows == n_slots, driver/broadcast-bounded
    return (
        ranked.join(F.broadcast(slot_base), "slot")
        .select(
            url_col,
            F.col("_host").alias("host"),
            "slot",
            (F.col("_grnk") - F.col("_base") + 1)
            .cast("long")
            .alias("fetch_order"),
        )
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Gate urls on a parsed rule table: adds ``robots_allowed``
    boolean (and keeps every input column). RFC 9309 precedence —
    select the exact-agent groups when the host has any, else the
    ``*`` groups; among matching rules the longest pattern wins, ties
    go to allow; no match → allowed.

    Exact-duplicate input rows collapse to one (the verdict aggregate
    groups on the input columns) — a frontier is a url set, so this is
    a no-op in the composed pipeline."""
    from pdf_metadata_extraction_spark.operators.urlnorm import URL_RE

    a = agent.lower()
    exact_hosts = (
        rules.where(F.col("agent") == a)
        .select("host")
        .distinct()
        .withColumn("_has_exact", F.lit(True))
    )
    sel = (
        rules.join(exact_hosts, "host", "left")
        .where(
            (F.col("agent") == a)
            | ((F.col("agent") == "*") & F.col("_has_exact").isNull())
        )
        .select(
            "host",
            "rule",
            "pattern_len",
            _pattern_regex(F.col("pattern")).alias("_rx"),
        )
    )
    u = urls.withColumn(
        "_host", F.lower(F.regexp_extract(F.col(url_col), URL_RE, 2))
    ).withColumn(
        "_target",
        F.concat(
            F.when(
                F.regexp_extract(F.col(url_col), URL_RE, 3) == "",
                F.lit("/"),
            ).otherwise(F.regexp_extract(F.col(url_col), URL_RE, 3)),
            F.coalesce(F.regexp_extract(F.col(url_col), URL_RE, 4),
                       F.lit("")),
        ),
    )
    # evaluate the match: regexp built per rule row, applied to the
    # url's target (regexp_like accepts a column pattern)
    cand = u.join(
        sel, u["_host"] == sel["host"], "left"
    ).withColumn(
        "_match",
        F.when(
            F.col("_rx").isNotNull(),
            F.expr("regexp_like(_target, _rx)"),
        ).otherwise(F.lit(False)),
    )
    verdict = (
        cand.groupBy(*[urls.columns])
        .agg(
            F.max(
                F.when(
                    F.col("_match"),
                    F.struct(
                        F.col("pattern_len").alias("len"),
                        (F.col("rule") == "allow").alias("is_allow"),
                    ),
                )
            ).alias("_w")
        )
        .select(
            *urls.columns,
            F.coalesce(F.col("_w.is_allow"), F.lit(True)).alias(
                "robots_allowed"
            ),
        )
    )
    return verdict
