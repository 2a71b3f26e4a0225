"""Round-5 hardening: ADVICE r4 fixes — random-failure p=1.0 twin
agreement, BM25 oracle quote escaping, sitemap XML entity unescape, and
frontier dedup of repeated sitemap listings. Each fix has a fixture that
tripped the old behavior."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.search import (
    doc_bm25_search,
    doc_bm25_sql,
)
from ps_projekt_pagerank_spark.functions.sitemaps import parse_sitemaps
from ps_projekt_pagerank_spark.operators.robustness import (
    random_failure_robustness,
    random_failure_robustness_sql,
)
from ps_projekt_pagerank_spark.plans.frontier import (
    sitemap_frontier_plan,
    sitemap_frontier_plan_sql,
)


# ------------------------------------------- random failure, p = 1.0
def test_random_failure_p1_twin_agrees(spark):
    """fracs may contain 1.0 (validated [0,1]); with every node failed the
    Spark side emits the literal (p, 0, 0, 0.0) row — the twin used to
    coalesce giant_size to 1 there and diverge."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (5, 6)], "src LONG, dst LONG"
    )
    fracs = [0.0, 0.5, 1.0]
    got = {
        r["p"]: (r["n_nodes"], r["giant_size"], r["giant_frac"])
        for r in random_failure_robustness(edges, fracs=fracs).collect()
    }
    assert got[1.0] == (0, 0, 0.0)

    con = duckdb.connect()
    sql = random_failure_robustness_sql(
        "SELECT * FROM (VALUES (1,2),(2,3),(3,4),(4,1),(5,6)) "
        "AS t(src, dst)",
        fracs=fracs,
    )
    oracle = {
        row[0]: (row[1], row[2], round(row[3], 6))
        for row in con.sql(sql).fetchall()
    }
    assert oracle == got


# ------------------------------------------- BM25 oracle quote escape
def test_bm25_sql_escapes_quoted_terms(spark):
    docs = [
        (0, "it's a fine day for queries"),
        (1, "plain text without apostrophes"),
        (2, "it's it's repeated here"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    terms = ["it's", "plain"]
    got = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in doc_bm25_search(df, terms, k=3).collect()
    ]
    con = duckdb.connect()
    sql = doc_bm25_sql(
        "SELECT * FROM (VALUES (0, 'it''s a fine day for queries'), "
        "(1, 'plain text without apostrophes'), "
        "(2, 'it''s it''s repeated here')) AS t(doc_id, text)",
        terms,
        k=3,
    )
    oracle = [
        (row[0], round(row[1], 6), row[2]) for row in con.sql(sql).fetchall()
    ]
    assert got == oracle
    assert len(got) == 3  # the quoted term actually matched docs 0 and 2


# ------------------------------------------- sitemap entity unescape
def test_parse_sitemaps_unescapes_xml_entities(spark):
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <url><loc>https://h.test/p?a=1&amp;b=2</loc>"
        "<lastmod>2024-01-05</lastmod></url>\n"
        "  <url><loc>https://h.test/&quot;q&quot;/&apos;r&apos;</loc>"
        "</url>\n"
        "  <url><loc>https://h.test/amp-lt-&amp;lt;</loc></url>\n"
        "</urlset>"
    )
    df = spark.createDataFrame([("h.test", xml)], "host STRING, xml STRING")
    locs = sorted(r["loc"] for r in parse_sitemaps(df).collect())
    assert locs == [
        "https://h.test/\"q\"/'r'",
        # double-escaped &amp;lt; round-trips to the LITERAL &lt;
        "https://h.test/amp-lt-&lt;",
        "https://h.test/p?a=1&b=2",
    ]


# ------------------------------------------- frontier repeated listing
_SM = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc>https://{h}.test/dup</loc><priority>{p}</priority></url>"
    "<url><loc>https://{h}.test/solo{i}</loc></url>"
    "</urlset>"
)


def test_frontier_repeated_listing_one_slot(spark):
    """The same URL in two sitemaps of one host must claim ONE schedule
    slot (max priority across listings), not n x n join fan-out."""
    rows = [
        ("a.test", _SM.format(h="a", p="0.3", i=0)),
        ("a.test", _SM.format(h="a", p="0.9", i=1)),
    ]
    df = spark.createDataFrame(rows, "host STRING, xml STRING")
    out = sitemap_frontier_plan(df, urls_per_round=4).collect()
    urls = [r["url"] for r in out]
    assert urls.count("https://a.test/dup") == 1
    assert len(out) == 3  # dup + solo0 + solo1
    slots = {(r["round"], r["slot"]) for r in out}
    assert len(slots) == 3  # no duplicate schedule slots
    # max priority across the two listings wins the quality sort:
    # dup (0.9) sorts before the priority-less solos
    first = min(out, key=lambda r: (r["round"], r["slot"]))
    assert first["url"] == "https://a.test/dup"


def test_frontier_twin_agrees_on_repeated_listing(spark):
    rows = [
        ("a.test", _SM.format(h="a", p="0.3", i=0)),
        ("a.test", _SM.format(h="a", p="0.9", i=1)),
    ]
    df = spark.createDataFrame(rows, "host STRING, xml STRING")
    got = sorted(
        (r["host"], r["url"], r["spam_score"], r["round"], r["slot"])
        for r in sitemap_frontier_plan(df, urls_per_round=4).collect()
    )
    parsed_sql = (
        "SELECT * FROM (VALUES "
        "('a.test', 'https://a.test/dup', NULL, NULL, 0.3), "
        "('a.test', 'https://a.test/solo0', NULL, NULL, NULL), "
        "('a.test', 'https://a.test/dup', NULL, NULL, 0.9), "
        "('a.test', 'https://a.test/solo1', NULL, NULL, NULL)) "
        "AS t(host, loc, lastmod, changefreq, priority)"
    )
    con = duckdb.connect()
    oracle = sorted(
        (row[0], row[1], row[2], row[3], row[4])
        for row in con.sql(
            sitemap_frontier_plan_sql(parsed_sql, urls_per_round=4)
        ).fetchall()
    )
    assert got == oracle
