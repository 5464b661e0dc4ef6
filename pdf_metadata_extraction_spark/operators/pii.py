"""PII detection and scrubbing — the redaction pass every
training-data pipeline runs before text leaves the corpus (C4/refined-
web style: emails, phone numbers, IP addresses → placeholder tokens).

Reference anchor: the reference's pipeline emits extracted text
verbatim into downstream stores (SURVEY.md §2.2 S4 sinks); at web
scale the same sink is preceded by a scrub stage — this module is
that stage, Spark-first.

Everything is pure ``regexp_replace``/``regexp_extract_all``
expressions (whole-stage codegen, map-only, zero shuffle, no UDF).
The patterns are deliberately RE2-compatible (no lookaround, no
backrefs) and the DuckDB oracle runs the SAME patterns — detection
counts are integers and the scrubbed text is compared byte-exactly
(DuckDB needs the 'g' flag to match Spark's replace-all semantics).

Detection quality note (documented contract, not hidden): these are
conservative lexical patterns. The email pattern requires a dotted
TLD; the phone pattern requires 7+ digits with separators and a
leading +/digit; IPv4 is purely syntactic (no octet range check).
Precision-first — a false redaction loses one token, a false keep
leaks PII — so anything ambiguous is left alone and counted by the
side-channel detectors for audit.

Scrub order is part of the contract: emails first (their local part
often contains digits a phone pattern could clip), then IPs (dotted
digits a phone pattern could clip), then phones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# two shapes only (precision-first): +international with separators, or
# separator-grouped 3-3-4 — a bare digit run ('2021 2022') is NOT a
# phone and must survive scrubbing
PHONE_RE = (
    r"\+[0-9][0-9() .\-]{6,}[0-9]\b"
    r"|\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}\b"
)

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds integer columns n_emails, n_ipv4, n_phones.

    Counts RECONCILE with scrub_pii exactly: each count is taken on the
    intermediate text the corresponding scrub pass sees (emails on the
    raw text, IPs after the email pass, phones after the IP pass), so
    n_X == the number of <X> tokens scrub_pii inserts. Counting all
    three on the raw text instead would report phantom leaks — a phone
    or dotted quad nested inside an email local part is redacted by the
    email pass, not the later ones."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV4_RE, IP_TOKEN)
    return (
        df.withColumn(
            "n_emails",
            F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("long"),
        )
        .withColumn(
            "n_ipv4",
            F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), F.lit(0))).cast("long"),
        )
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), F.lit(0))).cast("long"),
        )
    )


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "clean_text") -> DataFrame:
    """Replace every email/IPv4/phone occurrence with its placeholder
    token, in the documented order. Map-only; byte-exact vs the
    oracle."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN),
            IPV4_RE, IP_TOKEN,
        ),
        PHONE_RE, PHONE_TOKEN,
    )
    return df.withColumn(out_col, scrubbed)
