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
leading +/digit; IPv4 octets are range-checked (0-255, no leading
zeros — '999.…' and octal-ambiguous '010.…' quads survive);
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

IBANs are validated before scrubbing like cards: candidate shape
(two uppercase country letters + 2 check digits + 11-30 uppercase
alphanumerics, contiguous form), length must equal the country's
ISO 13616 registry entry, and the ISO 7064 mod-97 checksum must be 1
— all in expressions.

Scrub order is part of the contract: emails first (their local part
often contains digits a phone pattern could clip), then IPv6 (hex
groups a later pass could clip), then IPv4 (dotted digits a phone
pattern could clip), then valid IBANs (their digit tails overlap card
shapes), then Luhn-valid cards (grouped digits a phone pattern could
clip), then phones. Valid card/IBAN candidates are replaced
longest-first (then lexicographically descending) so a shorter
candidate that happens to be a substring of a longer one never
corrupts it — the same deterministic order on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# octet-range-checked (0-255, no leading zeros): '999.999.999.999' and
# octal-ambiguous '010.001.001.001' are NOT addresses and must survive
_OCT = r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
IPV4_RE = rf"\b(?:{_OCT}\.){{3}}{_OCT}\b"
# full 8-group form, or ::-compressed with >= 1 hex group on each side
IPV6_RE = (
    r"\b(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"(?::[0-9A-Fa-f]{1,4}){0,5})\b"
)
# card-number CANDIDATES (validated by Luhn before scrubbing): four
# separator-grouped blocks of 4, or 13-19 contiguous digits
CC_RE = r"\b(?:[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}|[0-9]{13,19})\b"
# IBAN candidates (validated by length-per-country + ISO 7064 mod-97
# before scrubbing): contiguous uppercase form only — the grouped
# print form ('DE89 3704 ...') is a documented precision cut
IBAN_RE = r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b"
# IBAN length by country (ISO 13616 registry, public data) — the
# precision gate ahead of the checksum; unknown countries are left
# alone (precision-first)
IBAN_LENGTHS = {
    "AT": 20, "BE": 16, "CH": 21, "CZ": 24, "DE": 22, "DK": 18,
    "ES": 24, "FI": 18, "FR": 27, "GB": 22, "GR": 27, "HR": 21,
    "HU": 28, "IE": 22, "IT": 27, "LU": 20, "NL": 18, "NO": 15,
    "PL": 28, "PT": 25, "RO": 24, "SE": 24, "SK": 24, "SI": 19,
    "BG": 22, "CY": 28, "EE": 20, "LT": 20, "LV": 21, "MT": 31,
    "IS": 26, "LI": 21, "MC": 27, "SM": 27, "RS": 22, "TR": 26,
    "UA": 29, "AE": 23, "SA": 24, "QA": 29, "IL": 23, "BR": 29,
}
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
IBAN_TOKEN = "<IBAN>"
CC_TOKEN = "<CC>"
PHONE_TOKEN = "<PHONE>"


def _iban_ok(cand: Column) -> Column:
    """ISO 13616 validity: candidate length equals the country's
    registered IBAN length AND the ISO 7064 mod-97 checksum is 1.
    The checksum runs entirely in expressions: rearrange (move the
    first 4 chars to the end), then fold digit-by-digit with
    ``acc = (acc*10 + digit) % 97`` and letters A..Z as two digits
    10..35 via ``acc = (acc*100 + val) % 97`` — the standard
    piecewise-mod evaluation, identical in the DuckDB mirror."""
    country = cand.substr(F.lit(1), F.lit(2))
    expected = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for kv in IBAN_LENGTHS.items()
                for x in kv
            ]
        ),
        country,
    )
    r = F.concat(
        cand.substr(F.lit(5), F.length(cand)), cand.substr(F.lit(1), F.lit(4))
    )

    def ch(i):
        return F.ascii(r.substr(i, F.lit(1)))

    acc = F.aggregate(
        F.sequence(F.lit(1), F.length(r)),
        F.lit(0),
        lambda a, i: F.when(
            ch(i) <= 57, (a * 10 + ch(i) - 48) % 97
        ).otherwise((a * 100 + ch(i) - 55) % 97),
    )
    return (F.length(cand) == expected) & (acc == 1)


def _scrub_ibans(t: Column) -> Column:
    """Replace every occurrence of each VALID IBAN candidate with the
    token; shape-matching but invalid candidates survive. Same
    longest-first deterministic fold order as cards (a shorter valid
    IBAN could occur inside a longer candidate's alphanumeric
    tail)."""
    valid = F.filter(
        F.array_distinct(F.regexp_extract_all(t, F.lit(IBAN_RE), F.lit(0))),
        _iban_ok,
    )
    ordered = F.transform(
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
    return F.aggregate(
        ordered, t, lambda acc, c: F.replace(acc, c, F.lit(IBAN_TOKEN))
    )


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
    t4 = _scrub_ibans(t3)
    t5 = _scrub_cards(t4)
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
            "n_iban",
            F.size(
                F.filter(
                    F.regexp_extract_all(t3, F.lit(IBAN_RE), F.lit(0)),
                    _iban_ok,
                )
            ).cast("long"),
        )
        .withColumn(
            "n_cc",
            F.size(
                F.filter(
                    F.regexp_extract_all(t4, F.lit(CC_RE), F.lit(0)),
                    _luhn_ok,
                )
            ).cast("long"),
        )
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(t5, F.lit(PHONE_RE), F.lit(0))).cast("long"),
        )
    )


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """Replace every email/IPv6/IPv4/valid-IBAN/valid-card/phone
    occurrence with its placeholder token, in the documented order.
    Map-only; byte-exact vs the oracle."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV6_RE, IPV6_TOKEN)
    t3 = F.regexp_replace(t2, IPV4_RE, IP_TOKEN)
    t4 = _scrub_ibans(t3)
    t5 = _scrub_cards(t4)
    scrubbed = F.regexp_replace(t5, PHONE_RE, PHONE_TOKEN)
    return df.withColumn(out_col, scrubbed)
