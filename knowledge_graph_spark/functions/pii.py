"""PII detection / redaction for training-data pipelines.

Native Column algebra (regexp only — JVM-side, codegen) with exact
DuckDB twins in __spark_entry__.oracle_sql.  The patterns deliberately
use only the regex subset where Java regex and RE2 agree exactly
(char classes, bounded repetition, \\b word boundaries; no lookaround,
no optional groups around alternating separators), so counting and
replacement behave identically across engines.

Redaction order is part of the contract: emails → phones → IPv4, each
replace-all on the output of the previous pass.

Scale: narrow per-row projections — fused into the scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def email_count(text: Column) -> Column:
    return _count(text, EMAIL_RE)


def phone_count(text: Column) -> Column:
    return _count(text, PHONE_RE)


def ipv4_count(text: Column) -> Column:
    return _count(text, IPV4_RE)


def scrub_pii(text: Column) -> Column:
    """Replace every email, then phone, then IPv4 with typed tokens."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_RE, IP_TOKEN)
