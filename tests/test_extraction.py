"""pages→text/edges extraction vs the sequential reference extractor
(byte-identical text per url — the north-rule invariant)."""

import pytest

from ps_projekt_pagerank_spark.fixtures import FIXTURE_GRAPHS, pages_rows
from ps_projekt_pagerank_spark.oracle.extract import extract_hrefs, extract_text
from ps_projekt_pagerank_spark.sources import extraction
from ps_projekt_pagerank_spark.sources.pages import fixture_pages


@pytest.mark.parametrize("topology", ["mini", "small"])
def test_text_byte_identical(spark, topology):
    pages = fixture_pages(spark, topology)
    got = {
        r["url"]: r["text"] for r in extraction.extract_text(pages).collect()
    }
    for row in pages_rows(topology):
        seq = extract_text(row["html"].decode("utf-8"))
        assert got[row["url"]].encode("utf-8") == seq.encode("utf-8")
        assert got[row["url"]] == row["text"]  # generator wrote the same


def test_extractor_edge_cases():
    # unit fixtures with hand-written expected bytes (oracle contract)
    cases = [
        ("<p>a  b</p>", "a b"),
        ("<p>x&amp;y &lt;z&gt; &quot;q&quot; &#39;s&#39;&nbsp;t</p>",
         'x&y <z> "q" \'s\' t'),
        ("<script>var x = '<p>no</p>';</script>visible", "visible"),
        ("<style type='text/css'>p { color: red }</style>shown", "shown"),
        ("<SCRIPT>a</SCRIPT><Style>b</Style>c", "c"),
        ("plain text", "plain text"),
        ("<a href=\"u\">link</a> tail", "link tail"),
        ("", ""),
    ]
    for html, want in cases:
        assert extract_text(html) == want, html


def test_hrefs_document_order_and_duplicates():
    html = (
        '<a href="u1">1</a><A HREF="u2">2</A><a class="x" href="u1">3</a>'
        '<link href="not-an-anchor"><a href="">empty</a>'
    )
    assert extract_hrefs(html) == ["u1", "u2", "u1", ""]


@pytest.mark.parametrize("topology", ["sink-test", "mini", "small"])
def test_extracted_graph_matches_topology(spark, topology):
    pages = fixture_pages(spark, topology)
    hrefs = extraction.extract_href_edges(pages)
    got = sorted(
        (r["src_url"], r["dst_url"])
        for r in hrefs.collect()
    )
    expected = sorted(
        (f"https://node{s}.example.test/", f"https://node{d}.example.test/")
        for s, d in FIXTURE_GRAPHS[topology]
    )
    assert got == expected


def test_encoded_edges_roundtrip(spark):
    pages = fixture_pages(spark, "mini")
    edges, url_dict = extraction.pages_to_graph(pages)
    id2url = {r["id"]: r["url"] for r in url_dict.collect()}
    got = sorted(
        (id2url[r["src"]], id2url[r["dst"]]) for r in edges.collect()
    )
    expected = sorted(
        (f"https://node{s}.example.test/", f"https://node{d}.example.test/")
        for s, d in FIXTURE_GRAPHS["mini"]
    )
    assert got == expected
    # dictionary ids are dense 0..N-1
    assert sorted(id2url) == list(range(len(id2url)))


def test_pages_to_pagerank_end_to_end(spark):
    """The full north-rule slice: pages table -> Arrow href extraction ->
    url->id dictionary encode -> frozen-node PageRank, ranks matching the
    NumPy oracle run on the known fixture topology."""
    import math

    from ps_projekt_pagerank_spark import NORTH_EPSILON
    from ps_projekt_pagerank_spark.fixtures import node_url
    from ps_projekt_pagerank_spark.operators.pagerank import pagerank
    from ps_projekt_pagerank_spark.oracle import pagerank as oracle_pagerank

    pages = fixture_pages(spark, "mini")
    edges, url_dict = extraction.pages_to_graph(pages)
    res = pagerank(edges, epsilon=NORTH_EPSILON, max_iterations=200)

    # dense id -> original fixture node id via the url dictionary
    url_to_dense = {r["url"]: r["id"] for r in url_dict.collect()}
    got_by_node = {}
    dense_ranks = {r["id"]: r["rank"] for r in res.ranks.collect()}
    for nid in {v for e in FIXTURE_GRAPHS["mini"] for v in e}:
        got_by_node[nid] = dense_ranks[url_to_dense[node_url(nid)]]

    expected, expected_iters = oracle_pagerank(
        FIXTURE_GRAPHS["mini"], delta=NORTH_EPSILON
    )
    assert res.iterations == expected_iters
    assert set(got_by_node) == set(expected)
    for nid, r in expected.items():
        assert math.isclose(got_by_node[nid], r, abs_tol=1e-6)


def test_text_byte_identical_generated_html(spark):
    """Adversarial generated html (nested tags, entities, script/style with
    angle brackets, whitespace runs, unicode) — the Arrow UDF must be
    byte-identical to the sequential oracle on every page."""
    import random

    rng = random.Random(42)
    frags = [
        "plain words", "x&amp;y", "&lt;tag&gt;", "a  b\tc\nd", "&nbsp;",
        "<b>bold</b>", "<i>it</i>", "<div class='x'>block</div>",
        "<script>if (a < b) { alert('<p>'); }</script>",
        "<style>p > a { color: #fff }</style>",
        "&quot;q&quot;", "&#39;s&#39;", "café üß",
        "<a href=\"u1\">l</a>", "", "   ", "<br/>", "<p>",
    ]
    pages = []
    for i in range(60):
        body = " ".join(rng.choice(frags) for _ in range(rng.randrange(1, 12)))
        html = f"<html><body>{body}</body></html>"
        pages.append((f"u{i}", html.encode("utf-8")))

    df = spark.createDataFrame(pages, "url STRING, html BINARY")
    got = {r["url"]: r["text"] for r in extraction.extract_text(df).collect()}
    for url, html in pages:
        expected = extract_text(html.decode("utf-8"))
        assert got[url].encode() == expected.encode(), (url, got[url], expected)


def test_url_dictionary_dense_sorted_parallel(spark):
    """ids must be dense 0..n-1 in url sort order regardless of partition
    count — the range-partition + per-partition-offset path must agree with
    the single-threaded definition (and duplicates collapse first)."""
    urls = [f"u{i:04d}" for i in range(197)]
    rows = [(u, b"<p>x</p>") for u in urls] + [(urls[3], b"<p>dup</p>")]
    pages = spark.createDataFrame(rows, "url STRING, html BINARY").repartition(7)
    for p in (1, 5, 32):
        got = {
            r["url"]: r["id"]
            for r in extraction.url_dictionary(pages, partitions=p).collect()
        }
        assert got == {u: i for i, u in enumerate(sorted(set(urls)))}
