"""Sitemap → frontier plan composition (plans/frontier.py)."""

import pytest

from ps_projekt_pagerank_spark.plans.frontier import sitemap_frontier_plan

XML = (
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://a.test/clean-low</loc><priority>0.3</priority></url>"
    "<url><loc>http://a.test/clean-high</loc><priority>0.9</priority></url>"
    # spam: session id + 3 params + deep subdomain -> score 3, cut at 2
    "<url><loc>http://s1.m.x.a.test/p?phpsessid=z&amp;a=1&amp;b=2</loc>"
    "<priority>1.0</priority></url>"
    "<url><loc>http://a.test/no-priority</loc></url>"
    "</urlset>"
)


def test_quality_order_rounds_and_cut(spark):
    df = spark.createDataFrame([("a", XML)], "host STRING, xml STRING")
    rows = sitemap_frontier_plan(df, urls_per_round=2, max_spam_score=2).collect()
    by_url = {r["url"]: r for r in rows}
    assert len(rows) == 3  # the session-id url is cut, not demoted
    assert "http://s1.m.x.a.test/p?phpsessid=z&a=1&b=2" not in by_url
    # order: all score 0 -> priority desc nulls last, then url
    order = sorted(rows, key=lambda r: (r["round"], r["slot"]))
    assert [r["url"].rsplit("/", 1)[1] for r in order] == [
        "clean-high", "clean-low", "no-priority",
    ]
    assert [(r["round"], r["slot"]) for r in order] == [(0, 0), (0, 1), (1, 0)]


def test_bad_round_size_raises(spark):
    df = spark.createDataFrame([("a", XML)], "host STRING, xml STRING")
    with pytest.raises(ValueError):
        sitemap_frontier_plan(df, urls_per_round=0)
