"""URL-only spam-prior features (functions/urls.py::url_spam_features)."""

from ps_projekt_pagerank_spark.functions.urls import url_spam_features

U_CLEAN = "http://a.test/page"
U_SPAM = "http://s1.m.a.test/p?phpsessid=abc&x=1&y=2"
U_DIGITS = "http://a.test/1234567890123/x"


def _rows(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    return {r["url"]: r for r in url_spam_features(df).collect()}


def test_clean_url_scores_zero(spark):
    r = _rows(spark, [U_CLEAN])[U_CLEAN]
    assert r["path_depth"] == 1
    assert r["n_digits"] == 0
    assert r["n_params"] == 0
    assert r["subdomain_depth"] == 1
    assert not r["has_session"]
    assert r["spam_score"] == 0


def test_session_params_subdomain_flags(spark):
    r = _rows(spark, [U_SPAM])[U_SPAM]
    assert r["has_session"]
    assert r["n_params"] == 3
    assert r["subdomain_depth"] == 3
    assert r["spam_score"] == 3  # session + params + subdomain


def test_digit_ratio_flag(spark):
    r = _rows(spark, [U_DIGITS])[U_DIGITS]
    assert r["n_digits"] == 13
    assert r["digit_ratio"] > 0.2
    assert r["spam_score"] == 1
