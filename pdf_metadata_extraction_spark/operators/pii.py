"""PII detection and scrubbing — the redaction pass every
training-data pipeline runs before text leaves the corpus (C4/refined-
web style: emails, phone numbers, IP addresses, payment card numbers
→ placeholder tokens).

Reference anchor: the reference's pipeline emits extracted text
verbatim into downstream stores (SURVEY.md §2.2 S4 sinks); at web
scale the same sink is preceded by a scrub stage — this module is
that stage, Spark-first.

Everything is pure expressions (``regexp_replace``/
``regexp_extract_all``/array folds — whole-stage codegen, map-only,
zero shuffle, no UDF). The patterns are deliberately in the Java-regex
/ RE2 common subset (no lookaround, no backrefs) and the DuckDB oracle
runs the SAME patterns — detection counts are integers and the
scrubbed text is compared byte-exactly (DuckDB needs the 'g' flag to
match Spark's replace-all semantics).

Detection quality note (documented contract, not hidden): these are
conservative lexical patterns. The email pattern requires a dotted
TLD; the phone pattern requires 7+ digits with separators and a
leading +/digit; IPv4 is purely syntactic (no octet range check);
IPv6 matches the full 8-group form and ``::``-compressed forms with
at least one hex group on EACH side (loopback ``::1`` and
``::``-prefixed v4-mapped forms are left alone — too collision-prone
with prose). Card numbers are the highest-precision class: a
candidate (13–19 contiguous digits, or four separator-grouped blocks
of 4) is scrubbed ONLY if its digits pass the Luhn checksum —
computed entirely in expressions (per-position double/subtract-9 over
a generated index sequence). Precision-first — a false redaction
loses one token, a false keep leaks PII — so anything ambiguous is
left alone and counted by the side-channel detectors for audit.

Scrub order is part of the contract: emails first (their local part
often contains digits a phone pattern could clip), then IPv6 (hex
groups a later pass could clip), then IPv4 (dotted digits a phone
pattern could clip), then Luhn-valid cards (grouped digits a phone
pattern could clip), then phones. Valid card candidates are replaced
longest-first (then lexicographically descending) so a shorter
candidate that happens to be a substring of a longer one never
corrupts it — the same deterministic order on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# full 8-group form, or ::-compressed with >= 1 hex group on each side
IPV6_RE = (
    r"\b(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"(?::[0-9A-Fa-f]{1,4}){0,5})\b"
)
# card-number CANDIDATES (validated by Luhn before scrubbing): four
# separator-grouped blocks of 4, or 13-19 contiguous digits
CC_RE = r"\b(?:[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}|[0-9]{13,19})\b"
# two shapes only (precision-first): +international with separators, or
# separator-grouped 3-3-4 — a bare digit run ('2021 2022') is NOT a
# phone and must survive scrubbing
PHONE_RE = (
    r"\+[0-9][0-9() .\-]{6,}[0-9]\b"
    r"|\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}\b"
)

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
IPV6_TOKEN = "<IP>"
CC_TOKEN = "<CC>"
PHONE_TOKEN = "<PHONE>"


def _luhn_ok(cand: Column) -> Column:
    """Luhn checksum over the candidate's digits, pure expressions:
    position i (1-based from the RIGHT) doubles on even i, minus 9
    when the doubled digit exceeds 9; valid iff the sum % 10 == 0.
    Mirrored term-for-term in the DuckDB oracle."""
    d = F.regexp_replace(cand, "[^0-9]", "")
    n = F.length(d)

    def digit(i):
        return F.ascii(d.substr(n - i + 1, F.lit(1))) - 48

    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i % 2 == 1, digit(i)).otherwise(
            digit(i) * 2 - F.when(digit(i) > 4, F.lit(9)).otherwise(F.lit(0))
        ),
    )
    return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 10 == 0


def _valid_cards_ordered(t: Column) -> Column:
    """Distinct Luhn-valid card candidates in ``t``, ordered longest
    first then lexicographically descending (the deterministic
    substring-safe replacement order; module docstring)."""
    cands = F.array_distinct(
        F.regexp_extract_all(t, F.lit(CC_RE), F.lit(0))
    )
    valid = F.filter(cands, _luhn_ok)
    return F.transform(
        F.reverse(
            F.array_sort(
                F.transform(
                    valid,
                    lambda c: F.struct(
                        F.length(c).alias("l"), c.alias("c")
                    ),
                )
            )
        ),
        lambda s: s["c"],
    )


def _scrub_cards(t: Column) -> Column:
    """Replace every occurrence of each Luhn-VALID candidate with the
    card token (literal replace fold); invalid candidates survive."""
    return F.aggregate(
        _valid_cards_ordered(t), t,
        lambda acc, c: F.replace(acc, c, F.lit(CC_TOKEN)),
    )


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds integer columns n_emails, n_ipv6, n_ipv4, n_cc, n_phones.

    Counts RECONCILE with scrub_pii exactly: each count is taken on the
    intermediate text the corresponding scrub pass sees (emails on the
    raw text, IPv6 after the email pass, IPv4 after the IPv6 pass,
    cards after the IPv4 pass, phones after the card pass), so
    n_X == the number of <X> tokens scrub_pii inserts. Counting all
    on the raw text instead would report phantom leaks — a phone
    or dotted quad nested inside an email local part is redacted by the
    email pass, not the later ones. n_cc counts Luhn-VALID candidate
    occurrences only (the ones the scrub replaces)."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV6_RE, IPV6_TOKEN)
    t3 = F.regexp_replace(t2, IPV4_RE, IP_TOKEN)
    t4 = _scrub_cards(t3)
    return (
        df.withColumn(
            "n_emails",
            F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("long"),
        )
        .withColumn(
            "n_ipv6",
            F.size(F.regexp_extract_all(t1, F.lit(IPV6_RE), F.lit(0))).cast("long"),
        )
        .withColumn(
            "n_ipv4",
            F.size(F.regexp_extract_all(t2, F.lit(IPV4_RE), F.lit(0))).cast("long"),
        )
        .withColumn(
            "n_cc",
            F.size(
                F.filter(
                    F.regexp_extract_all(t3, F.lit(CC_RE), F.lit(0)),
                    _luhn_ok,
                )
            ).cast("long"),
        )
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(t4, F.lit(PHONE_RE), F.lit(0))).cast("long"),
        )
    )


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """Replace every email/IPv6/IPv4/valid-card/phone occurrence with
    its placeholder token, in the documented order. Map-only;
    byte-exact vs the oracle."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV6_RE, IPV6_TOKEN)
    t3 = F.regexp_replace(t2, IPV4_RE, IP_TOKEN)
    t4 = _scrub_cards(t3)
    scrubbed = F.regexp_replace(t4, PHONE_RE, PHONE_TOKEN)
    return df.withColumn(out_col, scrubbed)
