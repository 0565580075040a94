"""PII scrubbing over the ``documents`` table.

The anonymization stage every released web corpus runs (emails, IPs,
phone numbers → placeholder tokens).  Pure per-row ``regexp_replace``
/ ``regexp_count`` column expressions: JVM-side, whole-stage codegen,
no shuffle, no Python — the cheapest possible 100 TB shape (a map-only
pass fused into whatever scan feeds it).

Patterns are deliberately conservative RE2-compatible forms so the
DuckDB oracle replays them verbatim (Java regex and RE2 agree on this
subset: character classes, bounded repeats, ``\\b``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def scrub_col(text: Column) -> Column:
    """text with emails, then IPv4s, then phones replaced by
    placeholder tokens (order matters: the email pattern would
    otherwise leave dotted hostnames for the IP pattern to mangle)."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, scrubbed_text, n_emails, n_ips, n_phones): the
    anonymized text plus per-kind match counts (the audit trail a
    compliance pass needs — aggregate them for corpus-level PII
    rates).

    Each count runs against the text AS IT EXISTS when that pattern's
    replace runs (raw → after-email → after-ip): replacements change
    word boundaries, so counting everything on the raw text could
    disagree with what was actually scrubbed (e.g. a phone glued to an
    email only becomes \\b-matchable once the email is replaced)."""
    t = F.col("text")
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    return docs.select(
        "doc_id",
        F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
        .alias("scrubbed_text"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("bigint")
        .alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IPV4)).cast("bigint")
        .alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_PHONE)).cast("bigint")
        .alias("n_phones"),
    )
