"""Edge-table validation report and top-k-per-group vs pure-Python
replications and the DuckDB twins."""

import duckdb

from ps_projekt_pagerank_spark.operators.graph import (
    edge_table_report,
    edge_table_report_sql,
)
from ps_projekt_pagerank_spark.operators.sampling import top_k_per_group

EDGES = [(0, 1), (0, 1), (1, 1), (2, 3), (3, 0), (9, 2)]


def test_edge_report_values(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    r = edge_table_report(df).collect()[0]
    assert r["n_edges"] == 6
    assert r["n_null_endpoints"] == 0
    assert r["n_self_loops"] == 1
    assert r["n_distinct_edges"] == 5
    assert r["dup_fraction"] == 1.0 - 5.0 / 6.0
    assert r["n_nodes"] == 5  # {0,1,2,3,9}
    assert r["n_sinks"] == 0  # every node appears as a src... except none
    assert (r["min_id"], r["max_id"]) == (0, 9)


def test_edge_report_sinks_and_twin(spark):
    edges = [(0, 1), (1, 2), (3, 2)]  # sinks: 2
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = tuple(edge_table_report(df).collect()[0])
    values = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = edge_table_report_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)"
    )
    oracle = duckdb.connect().execute(sql).fetchone()
    assert got == oracle
    assert got[6] == 1 and got[7] == 0.25  # n_sinks, sink_fraction


def test_top_k_per_group(spark):
    rows = [
        (0, "en", 100), (1, "en", 300), (2, "en", 300), (3, "en", 50),
        (4, "fr", 10),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, n_chars LONG")
    got = {
        (r["lang"], r["rank_in_group"]): r["doc_id"]
        for r in top_k_per_group(
            df, "lang", "n_chars", 2, "doc_id"
        ).collect()
    }
    # ties (1,2 at 300) break by doc_id ascending
    assert got == {("en", 1): 1, ("en", 2): 2, ("fr", 1): 4}


def test_anchor_postings_and_search(spark):
    from ps_projekt_pagerank_spark.sources.extraction import (
        anchor_postings,
        anchor_search,
    )

    anchors = spark.createDataFrame(
        [
            ("a", "t1", "great search engine", 0),
            ("b", "t1", "search engine", 0),
            ("c", "t2", "search", 0),
            ("d", "t2", "engine parts", 0),
            ("e", "t3", "unrelated", 0),
        ],
        "src_url STRING, dst_url STRING, anchor STRING, href_pos INT",
    )
    posts = {
        (r["term"], r["dst_url"]): (r["tf"], r["df_term"])
        for r in anchor_postings(anchors).collect()
    }
    assert posts[("search", "t1")] == (2, 2)  # t1 hit twice, df {t1,t2}
    assert posts[("engine", "t2")] == (1, 2)
    ranked = anchor_search(anchors, ["search", "engine"], k=3).collect()
    # t1: search x2 + engine x2 = 4; t2: search 1 + engine 1 = 2
    assert [(r["dst_url"], r["score"], r["n_terms_hit"]) for r in ranked] == [
        ("t1", 4, 2), ("t2", 2, 2),
    ]


def test_resolve_redirects(spark):
    import duckdb as _duck
    import pytest as _pytest

    from ps_projekt_pagerank_spark.functions.urls import (
        resolve_redirects,
        resolve_redirects_sql,
    )

    # chain 5->4->3->2->1->0, a short hop 10->11, terminal 0/11
    red = [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0), (10, 11)]
    df = spark.createDataFrame(red, "src LONG, dst LONG")
    got = {
        r["src"]: r["final"] for r in resolve_redirects(df).collect()
    }
    assert got == {5: 0, 4: 0, 3: 0, 2: 0, 1: 0, 10: 11}
    values = ", ".join(f"({s}, {d})" for s, d in red)
    sql = resolve_redirects_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)"
    )
    oracle = {
        r[0]: r[1] for r in _duck.connect().execute(sql).fetchall()
    }
    assert got == oracle
    # conflicting mapping raises
    bad = spark.createDataFrame([(1, 2), (1, 3)], "src LONG, dst LONG")
    with _pytest.raises(ValueError):
        resolve_redirects(bad)


def test_crawl_schedule(spark):
    from ps_projekt_pagerank_spark.operators.hostgraph import crawl_schedule

    urls = spark.createDataFrame(
        [
            ("http://a.test/1", 10), ("http://a.test/2", 5),
            ("http://a.test/3", 5), ("http://b.test/1", 99),
            ("not a url", 1),
        ],
        "url STRING, prio LONG",
    )
    got = {
        r["url"]: (r["host"], r["rank_in_host"], r["fetch_round"])
        for r in crawl_schedule(urls, "prio", per_host_per_round=2).collect()
    }
    assert "not a url" not in got  # unparseable host dropped
    assert got["http://a.test/1"] == ("a.test", 1, 1)
    assert got["http://a.test/2"] == ("a.test", 2, 1)  # tie -> url asc
    assert got["http://a.test/3"] == ("a.test", 3, 2)  # politeness spill
    assert got["http://b.test/1"] == ("b.test", 1, 1)


def test_host_crawl_budget(spark):
    import duckdb as _duck

    from ps_projekt_pagerank_spark.operators.hostgraph import (
        host_crawl_budget,
        host_crawl_budget_sql,
    )

    ranks = [("a", 0.5), ("b", 0.3), ("c", 0.125), ("d", 0.075)]
    df = spark.createDataFrame(ranks, "host STRING, rank DOUBLE")
    got = {
        r["host"]: (r["base_budget"], r["extra"], r["budget"])
        for r in host_crawl_budget(df, 10).collect()
    }
    # base: 5, 3, 1, 0 (sum 9); leftover 1 -> largest remainder d (0.75)
    assert got == {
        "a": (5, 0, 5), "b": (3, 0, 3), "c": (1, 0, 1), "d": (0, 1, 1),
    }
    assert sum(b for _, _, b in got.values()) == 10
    values = ", ".join(f"('{h}', {r})" for h, r in ranks)
    sql = host_crawl_budget_sql(
        f"SELECT * FROM (VALUES {values}) AS t(host, rank)", 10
    )
    oracle = {
        r[0]: (r[2], r[3], r[4])
        for r in _duck.connect().execute(sql).fetchall()
    }
    assert got == oracle
