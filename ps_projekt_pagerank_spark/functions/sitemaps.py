"""Sitemap XML parse — the crawl-discovery sibling of robots.txt.

Crawlers learn a host's URL inventory and re-crawl hints from
sitemaps.org XML (``<urlset><url><loc>…</loc><lastmod>…</lastmod>…``).
The reference repo starts from a pre-built edge list (``Graph.cpp:32``),
so — like robots.py — this has no reference counterpart; the contract is
the sitemaps.org 0.9 schema.

Everything is JVM-side regexp column algebra (``regexp_extract_all`` →
``explode`` → per-field ``regexp_extract``), no Python: one sitemap is
one row (hosts are the parallel unit, like WARC segments), so the op
scales as a narrow explode — no shuffle until the caller aggregates.
Regex-over-XML is correct here because the sitemaps.org schema is flat
(no nesting inside ``<url>``) and this is how production crawl stacks
parse the 50k-entry files in practice. sitemaps.org REQUIRES the five
predefined XML entities to be escaped in ``<loc>`` (an ``&`` in a URL
ships as ``&amp;``), so every extracted field unescapes them —
``&lt; &gt; &quot; &apos;`` first, ``&amp;`` last, so double-escaped
text (``&amp;lt;``) round-trips to the literal ``&lt;`` and not ``<``.

``<lastmod>`` / ``<changefreq>`` / ``<priority>`` are optional per spec
— missing fields come back NULL, never a dropped row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = "(?s)<url>(.*?)</url>"

# &amp; LAST: "&amp;lt;" must yield the literal "&lt;", not "<"
_XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _field(block: Column, tag: str) -> Column:
    got = F.regexp_extract(block, f"<{tag}>([^<]*)</{tag}>", 1)
    for ent, ch in _XML_ENTITIES:
        got = F.replace(got, F.lit(ent), F.lit(ch))
    return F.when(got != "", got)


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, loc, lastmod DATE, changefreq, priority DOUBLE) — one row
    per ``<url>`` entry of every sitemap; optional fields NULL."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
    entry = F.explode(blocks).alias("entry")
    e = F.col("entry")
    return sitemaps.select(F.col(host_col).alias("host"), entry).select(
        "host",
        _field(e, "loc").alias("loc"),
        F.to_date(_field(e, "lastmod")).alias("lastmod"),
        _field(e, "changefreq").alias("changefreq"),
        _field(e, "priority").cast("double").alias("priority"),
    )


def sitemap_recrawl_stats(parsed: DataFrame, as_of: str) -> DataFrame:
    """(host, n_urls, n_stale, frac_daily) — per-host re-crawl pressure:
    how many sitemap entries are older than ``as_of`` (YYYY-MM-DD) and
    what fraction advertise daily churn. The report a crawl scheduler
    joins against host_crawl_budget."""
    stale = F.col("lastmod") < F.to_date(F.lit(as_of))
    return parsed.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.coalesce(stale, F.lit(False)).cast("long")).alias("n_stale"),
        F.round(
            # a missing <changefreq> is "not daily", not "skip the row"
            F.avg(
                F.coalesce(
                    (F.col("changefreq") == "daily").cast("int"), F.lit(0)
                )
            ),
            6,
        ).alias("frac_daily"),
    )
