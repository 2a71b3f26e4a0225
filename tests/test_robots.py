"""robots.txt parsing + crawl-permission verdicts: RFC 9309 subset —
group shadowing (exact agent hides '*'), longest-prefix match, Allow
beating Disallow on ties, default-allow absent rules."""

from ps_projekt_pagerank_spark.functions.robots import (
    crawl_allowed,
    robots_rules,
)

ROBOTS = [
    (
        "a.com",
        "# comment\nUser-agent: *\nDisallow: /private\nAllow: /private/ok"
        "\n\nUser-agent: badbot\nDisallow: /",
    ),
    ("b.com", "User-agent: goodbot\nDisallow: /x\nUser-agent: *\nDisallow: /y"),
]
URLS = [
    ("http://a.com/index.html",),
    ("http://a.com/private/page",),
    ("http://a.com/private/ok/page",),
    ("http://b.com/x/1",),
    ("http://b.com/y/1",),
    ("http://c.com/anything",),
    ("garbage",),
]


def _fixtures(spark):
    r = spark.createDataFrame(ROBOTS, "host STRING, robots_txt STRING")
    u = spark.createDataFrame(URLS, "url STRING")
    return u, robots_rules(r)


def test_robots_rules_parse(spark):
    _, rules = _fixtures(spark)
    got = {
        (r["host"], r["agent"], r["rule"], r["path"])
        for r in rules.collect()
    }
    assert got == {
        ("a.com", "*", "disallow", "/private"),
        ("a.com", "*", "allow", "/private/ok"),
        ("a.com", "badbot", "disallow", "/"),
        ("b.com", "goodbot", "disallow", "/x"),
        ("b.com", "*", "disallow", "/y"),
    }


def test_crawl_allowed_star_agent(spark):
    u, rules = _fixtures(spark)
    got = {r["url"]: r["allowed"] for r in crawl_allowed(u, rules, "*").collect()}
    assert got == {
        "http://a.com/index.html": True,
        "http://a.com/private/page": False,
        "http://a.com/private/ok/page": True,  # longest prefix: Allow wins
        "http://b.com/x/1": True,  # goodbot group invisible to '*'
        "http://b.com/y/1": False,
        "http://c.com/anything": True,  # no rules -> allowed
        "garbage": True,  # no parseable host -> allowed
    }


def test_crawl_allowed_group_shadowing(spark):
    u, rules = _fixtures(spark)
    bad = {r["url"]: r["allowed"] for r in crawl_allowed(u, rules, "badbot").collect()}
    # badbot's exact group on a.com (Disallow /) shadows the '*' group
    # entirely — even the '*' Allow /private/ok is invisible
    assert bad["http://a.com/private/ok/page"] is False
    assert bad["http://a.com/index.html"] is False
    # on b.com badbot has no exact group -> '*' applies
    assert bad["http://b.com/x/1"] is True and bad["http://b.com/y/1"] is False

    good = {r["url"]: r["allowed"] for r in crawl_allowed(u, rules, "goodbot").collect()}
    # goodbot's exact group on b.com shadows '*': /x blocked, /y allowed
    assert good["http://b.com/x/1"] is False
    assert good["http://b.com/y/1"] is True
