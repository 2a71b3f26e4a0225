"""PII screening — detect and redact email / phone / IPv4 literals before
a corpus ships to training (the C4/Dolma-style scrub pass). The operator
is pure JVM regex (regexp_count / regexp_replace — whole-stage codegen,
no Python), so it runs at scan speed on 100 TB.

Patterns are deliberately written in the RE2-compatible subset (no
backrefs, no lookaround) so the Spark (Java regex) and DuckDB (RE2)
engines match the same spans; both engines scan leftmost non-overlapping,
which makes the counts and the global replace byte-identical — the gate
compares md5(redacted) to prove it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

# replace order matters and is part of the contract: emails first (an
# email never contains a phone/ip match after its '@' is gone), then
# ipv4 BEFORE phone (a dotted quad contains no 'ddd-dddd', but scrubbing
# the longer pattern first is the safe convention)
_ORDERED = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in _ORDERED:
        col = F.regexp_replace(col, pat, repl)
    return col


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4 BIGINT, has_pii BOOLEAN,
    redacted_md5 STRING) — counts per PII class plus the md5 of the
    fully-redacted text (byte-identity proof of the scrub)."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE)).cast("long")
    n_phones = F.regexp_count(t, F.lit(PHONE_RE)).cast("long")
    n_ipv4 = F.regexp_count(t, F.lit(IPV4_RE)).cast("long")
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ipv4.alias("n_ipv4"),
        ((n_emails + n_phones + n_ipv4) > 0).alias("has_pii"),
        F.md5(redact(t).cast("binary")).alias("redacted_md5"),
    )


def pii_scan_sql(docs_expr: str, text_col: str = "text") -> str:
    """DuckDB twin of pii_scan (len(regexp_extract_all) == regexp_count;
    regexp_replace needs the explicit 'g' flag to match Spark's global
    default)."""
    redacted = text_col
    for _, pat, repl in _ORDERED:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    return (
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all({text_col}, '{EMAIL_RE}')) AS BIGINT) "
        "AS n_emails, "
        f"CAST(len(regexp_extract_all({text_col}, '{PHONE_RE}')) AS BIGINT) "
        "AS n_phones, "
        f"CAST(len(regexp_extract_all({text_col}, '{IPV4_RE}')) AS BIGINT) "
        "AS n_ipv4, "
        f"(len(regexp_extract_all({text_col}, '{EMAIL_RE}')) "
        f"+ len(regexp_extract_all({text_col}, '{PHONE_RE}')) "
        f"+ len(regexp_extract_all({text_col}, '{IPV4_RE}'))) > 0 "
        "AS has_pii, "
        f"md5({redacted}) AS redacted_md5 "
        f"FROM ({docs_expr})"
    )
