"""PII detection + redaction for web-corpus curation.

The standard pre-release scrub a training-data pipeline runs after quality
filtering (C4 keeps a blocklist pass, Dolma/RefinedWeb mask emails / IP
addresses / phone numbers before publishing) — here as pure JVM column
expressions (``regexp_extract_all`` / ``regexp_replace``, whole-stage
codegen, no Python in the hot path), so the scrub rides the same scan as
the rest of the text stage.

Pattern dialect: the intersection of Java ``java.util.regex`` (Spark) and
RE2 (the DuckDB oracle) — ASCII classes, ``\\b`` anchors, bounded
quantifiers; no lookaround, no backrefs. Both engines evaluate the
IDENTICAL pattern strings, which is what makes the driver oracle an exact
value match rather than a statistical one.

Redaction cascades email → IPv4 → phone; each count is taken on the text
with the *earlier* stages already masked, so an address that was part of
an email's domain is never double-counted.

Reference provenance: the reference crawler stores raw museum metadata
verbatim (``base.js`` record sink) with no scrub stage — this module is
part of the training-data family the brief adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Local part / dotted domain / alpha TLD >= 2 — deliberately simple and
# dialect-portable; greedy character-class runs make Java's leftmost-greedy
# and RE2's leftmost-first agree on every match.
EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"

# Dotted quad, word-bounded so version strings like 1.2.3.4000 don't match.
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# NANP-style 3-3-4 with -/. separators (the form that appears in page
# footers); intentionally narrow — a wide phone regex shreds dates and
# product codes, the classic over-redaction failure.
PHONE_PATTERN = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def mask_emails(text: Column) -> Column:
    return F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)


def mask_ipv4(text: Column) -> Column:
    return F.regexp_replace(text, IPV4_PATTERN, IPV4_TOKEN)


def mask_phones(text: Column) -> Column:
    return F.regexp_replace(text, PHONE_PATTERN, PHONE_TOKEN)


def count_emails(text: Column) -> Column:
    return _count(text, EMAIL_PATTERN)


def count_ipv4(text: Column) -> Column:
    """IPv4 count AFTER email masking (a quad inside an email's host part
    belongs to the email, not to this counter)."""
    return _count(mask_emails(text), IPV4_PATTERN)


def count_phones(text: Column) -> Column:
    """Phone count after email + IPv4 masking (same cascade as redaction)."""
    return _count(mask_ipv4(mask_emails(text)), PHONE_PATTERN)


def redact_pii(text: Column) -> Column:
    """Email → IPv4 → phone cascade, each class to its placeholder token."""
    return mask_phones(mask_ipv4(mask_emails(text)))


def pii_hit(text: Column) -> Column:
    """True iff any PII class matched — the drop-or-keep gate for pipelines
    that discard rather than mask."""
    return (count_emails(text) + count_ipv4(text) + count_phones(text)) > 0
