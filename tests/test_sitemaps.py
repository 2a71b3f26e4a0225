"""Sitemap XML parsing (functions/sitemaps.py)."""

import datetime as dt

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.sitemaps import (
    parse_sitemaps,
    sitemap_recrawl_stats,
)

XML_A = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "  <url>\n    <loc>https://a.example/1</loc>\n"
    "    <lastmod>2024-01-02</lastmod>\n"
    "    <changefreq>daily</changefreq>\n    <priority>0.8</priority>\n"
    "  </url>\n"
    # optional fields missing entirely
    "  <url><loc>https://a.example/2</loc></url>\n"
    "</urlset>"
)
XML_EMPTY = (
    '<?xml version="1.0"?><urlset '
    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"></urlset>'
)


def test_parse_fields_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", XML_A), ("b", XML_EMPTY)], "host STRING, xml STRING"
    )
    rows = {r["loc"]: r for r in parse_sitemaps(df).collect()}
    assert set(rows) == {"https://a.example/1", "https://a.example/2"}
    full = rows["https://a.example/1"]
    assert full["lastmod"] == dt.date(2024, 1, 2)
    assert full["changefreq"] == "daily"
    assert full["priority"] == 0.8
    bare = rows["https://a.example/2"]
    assert bare["lastmod"] is None
    assert bare["changefreq"] is None
    assert bare["priority"] is None


def test_recrawl_stats(spark):
    df = spark.createDataFrame([("a", XML_A)], "host STRING, xml STRING")
    got = sitemap_recrawl_stats(
        parse_sitemaps(df), as_of="2024-01-15"
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_urls"] == 2
    assert r["n_stale"] == 1  # NULL lastmod is not stale
    assert r["frac_daily"] == 0.5
