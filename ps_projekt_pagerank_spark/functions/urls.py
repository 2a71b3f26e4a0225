"""URL canonicalization — the normalization pass every web-graph pipeline
runs before building the url dictionary, so that casing/port/fragment
variants of the same page collapse to one node (otherwise the link graph
fragments and PageRank mass splits across aliases).

Pure built-in column expressions (regexp_extract / lower / substring —
all JVM-side, whole-stage-codegen friendly), and every step is plain
POSIX-regex string surgery, so a DuckDB twin reproduces the output
byte-for-byte. Normalization steps, in order:

1. strip the fragment (``#...`` — client-side only, never a distinct page)
2. lowercase the scheme and authority (RFC 3986 §6.2.2.1: both are
   case-insensitive; paths are NOT touched — they are case-sensitive)
3. drop explicit default ports (``:80`` for http, ``:443`` for https)
4. give authority-only URLs the root path (``http://a.test`` →
   ``http://a.test/``)

URLs with no ``scheme://authority`` prefix (relative hrefs) pass through
with only the fragment stripped — resolution against a base URL is the
extractor's job, not the normalizer's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREFIX = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules."""
    u = F.regexp_replace(url, "#.*", "")  # 1. fragment
    pre = F.regexp_extract(u, _PREFIX, 1)  # scheme://authority (or '')
    rest = F.substring(u, F.length(pre) + 1, 1 << 20)
    pre = F.lower(pre)  # 2. scheme+authority casing
    pre = F.when(  # 3. default ports
        pre.startswith("http://"), F.regexp_replace(pre, ":80$", "")
    ).when(
        pre.startswith("https://"), F.regexp_replace(pre, ":443$", "")
    ).otherwise(pre)
    rest = F.when(  # 4. root path
        (pre != "") & (rest == ""), F.lit("/")
    ).otherwise(rest)
    return F.concat(pre, rest)


def normalize_url_sql(expr: str) -> str:
    """The DuckDB twin of ``normalize_url`` over SQL expression ``expr`` —
    identical step order, identical regexes."""
    u = f"regexp_replace({expr}, '#.*', '')"
    pre0 = f"regexp_extract({u}, '{_PREFIX}', 1)"
    rest0 = f"substr({u}, length({pre0}) + 1)"
    pre1 = f"lower({pre0})"
    pre = (
        f"(CASE WHEN {pre1} LIKE 'http://%' "
        f"THEN regexp_replace({pre1}, ':80$', '') "
        f"WHEN {pre1} LIKE 'https://%' "
        f"THEN regexp_replace({pre1}, ':443$', '') ELSE {pre1} END)"
    )
    rest = (
        f"(CASE WHEN {pre} <> '' AND {rest0} = '' THEN '/' "
        f"ELSE {rest0} END)"
    )
    return f"({pre} || {rest})"
