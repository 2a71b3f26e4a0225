"""URL canonicalization, anchor-text extraction/aggregation, and
quality-based dedup survivor selection."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.urls import (
    normalize_url,
    normalize_url_sql,
)
from ps_projekt_pagerank_spark.operators.dedup import dedup_survivors
from ps_projekt_pagerank_spark.sources.extraction import (
    anchor_summary,
    anchor_texts,
)

URL_CASES = [
    ("HTTP://Ex.COM:80/Path#frag", "http://ex.com/Path"),  # path case kept
    ("https://A.b:443/x?q=1#f", "https://a.b/x?q=1"),
    ("http://host.test", "http://host.test/"),             # root path
    ("http://host.test:8080/x", "http://host.test:8080/x"),  # real port kept
    ("u17#x", "u17"),                                      # relative: frag only
    ("ftp://Host.TEST:80/f", "ftp://host.test:80/f"),      # :80 only for http
]


def test_normalize_url_cases_and_sql_twin(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], "url STRING")
    got = {
        r["url"]: r["norm"]
        for r in df.select("url", normalize_url(F.col("url")).alias("norm")).collect()
    }
    assert got == dict(URL_CASES)
    # the SQL twin produces byte-identical output on the same inputs
    con = duckdb.connect()
    vals = ", ".join(f"('{u}')" for u, _ in URL_CASES)
    twin = dict(
        con.sql(
            f"SELECT url, {normalize_url_sql('url')} FROM (VALUES {vals}) t(url)"
        ).fetchall()
    )
    assert twin == dict(URL_CASES)


def test_anchor_texts_cleanup_and_order(spark):
    html = (
        '<html><body><a href="http://a.test/1"><b>Click &amp; go</b></a>'
        ' filler <a href="u9"> spaced   out </a></body></html>'
    ).encode()
    df = spark.createDataFrame([("http://s.test/", html)], "url STRING, html BINARY")
    rows = sorted(anchor_texts(df).collect(), key=lambda r: r["href_pos"])
    assert [(r["dst_url"], r["anchor"], r["href_pos"]) for r in rows] == [
        ("http://a.test/1", "Click & go", 0),  # inner tags + entity cleaned
        ("u9", "spaced out", 1),               # whitespace collapsed/trimmed
    ]


def test_anchor_summary_top_anchor_ties(spark):
    rows = [
        ("s1", "t", "home", 0),
        ("s2", "t", "home", 0),
        ("s3", "t", "blog", 0),
        ("s4", "t", "blog", 0),  # tie 2-2 -> lexicographically smaller wins
        ("s5", "u", "x", 0),
    ]
    df = spark.createDataFrame(
        rows, "src_url STRING, dst_url STRING, anchor STRING, href_pos INT"
    )
    got = {r["dst_url"]: r for r in anchor_summary(df).collect()}
    assert got["t"]["n_anchors"] == 4
    assert got["t"]["n_unique_anchors"] == 2
    assert got["t"]["top_anchor"] == "blog"
    assert got["u"]["top_anchor"] == "x" and got["u"]["n_anchors"] == 1


def test_dedup_survivors_picks_quality_then_min_id(spark):
    # docs 1/2/3 share text (one cluster); 2 has the best quality.
    # docs 10/11 share text with equal quality -> tie broken by min id.
    rows = [
        (1, "alpha beta gamma", 5),
        (2, "alpha beta gamma", 9),
        (3, "alpha beta gamma", 7),
        (10, "delta epsilon zeta", 4),
        (11, "delta epsilon zeta", 4),
        (20, "unrelated text entirely", 8),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, q LONG")
    got = {r["doc_id"]: r for r in dedup_survivors(df, "q").collect()}
    assert got[1]["survivor_id"] == 2 and got[1]["is_duplicate"]
    assert got[2]["survivor_id"] == 2 and not got[2]["is_duplicate"]
    assert got[3]["is_duplicate"]
    assert got[10]["survivor_id"] == 10 and not got[10]["is_duplicate"]
    assert got[11]["survivor_id"] == 10 and got[11]["is_duplicate"]
    assert got[20]["survivor_id"] == 20 and not got[20]["is_duplicate"]
    # cluster ids remain the min-label component ids
    assert got[1]["cluster_id"] == got[2]["cluster_id"] == 1
