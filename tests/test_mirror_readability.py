"""Host-mirror detection and Flesch readability: closed-form fixtures."""

import pytest

from ps_projekt_pagerank_spark.functions.readability import readability
from ps_projekt_pagerank_spark.operators.hostgraph import mirror_hosts


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_mirror_full_and_partial(spark):
    rows = (
        [("a", f"page {i} body") for i in range(4)]
        + [("b", f"page {i} body") for i in range(4)]  # full mirror of a
        + [("c", "page 0 body"), ("c", "page 1 body"), ("c", "own body")]
        + [("d", "unrelated body")]
    )
    out = {
        (r["host_a"], r["host_b"]): (r["shared"], r["overlap"])
        for r in mirror_hosts(_pages(spark, rows), threshold=0.5).collect()
    }
    assert out[("a", "b")] == (4, 1.0)
    # c shares 2 of its 3 pages with a and with b → 2/3
    assert out[("a", "c")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert out[("b", "c")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert not any("d" in k for k in out)


def test_mirror_hot_fingerprint_cap(spark):
    # the same stub body on 5 hosts with cap 4 → excluded from pairing
    rows = [(f"h{i}", "404 not found") for i in range(5)]
    out = mirror_hosts(
        _pages(spark, rows), threshold=0.1, max_hosts_per_fp=4
    ).collect()
    assert out == []
    # under the cap it pairs
    rows = [(f"h{i}", "404 not found") for i in range(3)]
    out = mirror_hosts(
        _pages(spark, rows), threshold=0.1, max_hosts_per_fp=4
    ).collect()
    assert len(out) == 3  # C(3,2)


def test_mirror_dedupes_within_host(spark):
    # duplicate body within one host counts once in the fingerprint set
    rows = [("a", "same body"), ("a", "same body"), ("b", "same body")]
    out = mirror_hosts(_pages(spark, rows), threshold=0.5).collect()
    assert len(out) == 1 and out[0]["shared"] == 1 and out[0]["overlap"] == 1.0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_readability_closed_form(spark):
    # "the cat sat. it ran!" → words 5, sentences 2, vowel groups:
    # e, a, a, i, a → 5
    out = readability(_docs(spark, [(1, "the cat sat. it ran!")])).collect()[0]
    assert (out["n_words"], out["n_sentences"], out["n_syllables"]) == (5, 2, 5)
    wps, spw = 5 / 2, 5 / 5
    assert out["flesch"] == pytest.approx(
        round(206.835 - 1.015 * wps - 84.6 * spw, 6), abs=1e-9
    )
    assert out["fk_grade"] == pytest.approx(
        round(0.39 * wps + 11.8 * spw - 15.59, 6), abs=1e-9
    )


def test_readability_clamps_and_nulls(spark):
    rows = [(1, "no terminal punctuation here"), (2, "")]
    out = {r["doc_id"]: r for r in readability(_docs(spark, rows)).collect()}
    assert out[1]["n_sentences"] == 1  # clamp, no divide-by-zero
    assert out[2]["n_words"] == 0
    assert out[2]["flesch"] is None and out[2]["fk_grade"] is None


def test_crawler_trap_hosts(spark):
    from ps_projekt_pagerank_spark.operators.hostgraph import (
        crawler_trap_hosts,
    )

    rows = (
        # honest: 10 urls, 10 bodies
        [("good", f"u{i}", f"body {i}") for i in range(10)]
        # trap: 12 urls over 2 bodies → ratio 6
        + [("bad", f"u?s={i}", f"t{i % 2}") for i in range(12)]
        # small: high ratio but under min_urls
        + [("tiny", f"p{i}", "same") for i in range(4)]
    )
    pages = spark.createDataFrame(rows, "host string, url string, text string")
    out = crawler_trap_hosts(pages, min_urls=8, ratio_threshold=4.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["host"] == "bad" and r["n_urls"] == 12 and r["n_contents"] == 2
    assert r["url_content_ratio"] == 6.0
