"""k-core peeling vs a pure-Python replication; weighted build_graph vs
the expanded multiset; host-level PageRank end-to-end."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.graph import build_graph
from ps_projekt_pagerank_spark.operators.hostgraph import host_pagerank
from ps_projekt_pagerank_spark.operators.kcore import k_core
from ps_projekt_pagerank_spark.operators.pagerank import pagerank_fixed


def _py_k_core(pairs, k):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for n in adj.pop(v):
                adj[n].discard(v)
            changed = True
    return set(adj)


# K5 clique + a pendant chain off node 0 + a separate triangle
KCORE_EDGES = (
    list(combinations(range(5), 2))
    + [(0, 10), (10, 11), (11, 12)]
    + [(20, 21), (21, 22), (22, 20)]
)


def test_k_core_matches_python_peel(spark):
    df = spark.createDataFrame(KCORE_EDGES, "src LONG, dst LONG")
    for k in (2, 3, 4, 5):
        got = {r["id"] for r in k_core(df, k).collect()}
        assert got == _py_k_core(KCORE_EDGES, k), k
    # k=4: only the K5 clique survives (chain and triangle peel away)
    assert {r["id"] for r in k_core(df, 4).collect()} == set(range(5))
    # beyond the max coreness: empty, and k<1 rejected
    assert k_core(df, 5).count() == 0
    with pytest.raises(ValueError, match="k_core"):
        k_core(df, 0)


def _py_coreness(pairs):
    """literal Seidman peel — the definitional oracle for coreness."""
    adj = {}
    ids = set()
    for a, b in pairs:
        ids.add(a)
        ids.add(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {v: 0 for v in ids}
    nodes = set(adj)
    cur = {v: set(ns) for v, ns in adj.items()}
    k = 1
    while nodes:
        while True:
            rem = [v for v in nodes if len(cur[v]) < k]
            if not rem:
                break
            for v in rem:
                for u in cur[v]:
                    cur[u].discard(v)
                cur[v] = set()
                nodes.discard(v)
                core[v] = k - 1
        k += 1
    return core


def test_coreness_matches_peel_and_fixpoint(spark):
    from ps_projekt_pagerank_spark.operators.kcore import coreness

    # add a self-loop-only node (30) and a duplicate edge: both must be
    # absorbed by the simple-view canonicalization; 30 gets coreness 0
    edges = KCORE_EDGES + [(30, 30), (0, 1)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    fixp = {r["id"]: r["coreness"] for r in coreness(df).collect()}
    fixed = {r["id"]: r["coreness"] for r in coreness(df, rounds=12).collect()}
    assert fixp == fixed == _py_coreness(edges)
    # K5 clique members have core number 4; the pendant chain 1; the
    # triangle 2; the self-loop-only node 0
    assert fixp[0] == 4 and fixp[10] == 1 and fixp[20] == 2 and fixp[30] == 0


def test_coreness_sql_twin_matches(spark):
    from ps_projekt_pagerank_spark.operators.kcore import coreness, coreness_sql

    import duckdb

    edges = KCORE_EDGES + [(30, 30)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r["id"]: r["coreness"] for r in coreness(df, rounds=12).collect()}
    con = duckdb.connect()
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = coreness_sql(f"SELECT * FROM (VALUES {values}) AS t(src, dst)", 12)
    assert dict(con.execute(sql).fetchall()) == got


def test_weighted_build_graph_equals_expanded_multiset(spark):
    # multigraph with duplicates vs its pre-collapsed weighted form
    raw = [(0, 1), (0, 1), (0, 1), (1, 2), (2, 0), (2, 0), (3, 1)]
    expanded = spark.createDataFrame(raw, "src LONG, dst LONG")
    weighted = spark.createDataFrame(
        [(s, d, w) for (s, d), w in Counter(raw).items()],
        "src LONG, dst LONG, weight LONG",
    )
    g = build_graph(weighted, weight_col="weight")
    assert g.num_edges == len(raw)  # weights count as multiset edges
    a = {
        r["id"]: r["rank"]
        for r in pagerank_fixed(expanded, 4).collect()
    }
    b = {
        r["id"]: r["rank"]
        for r in pagerank_fixed(weighted, 4, graph=g).collect()
    }
    assert set(a) == set(b)
    for i in a:
        assert a[i] == pytest.approx(b[i], abs=1e-12), i


def test_host_pagerank_matches_host_id_pagerank(spark):
    # page edges across 3 hosts (+ intra-host noise that must not count)
    urls = [
        ("http://a.test/1", "http://b.test/1"),
        ("http://a.test/2", "http://b.test/9"),
        ("http://b.test/1", "http://c.test/1"),
        ("http://c.test/1", "http://a.test/1"),
        ("http://a.test/1", "http://a.test/2"),  # intra-host: ignored
    ]
    df = spark.createDataFrame(urls, "src_url STRING, dst_url STRING")
    got = {r["host"]: r["rank"] for r in host_pagerank(df, 4).collect()}

    name_to_id = {"a.test": 0, "b.test": 1, "c.test": 2}
    pairs = [
        (name_to_id[s.split("/")[2]], name_to_id[d.split("/")[2]])
        for s, d in urls
        if s.split("/")[2] != d.split("/")[2]
    ]
    exp = {
        r["id"]: r["rank"]
        for r in pagerank_fixed(
            spark.createDataFrame(pairs, "src LONG, dst LONG"), 4
        ).collect()
    }
    assert set(got) == set(name_to_id)
    for name, i in name_to_id.items():
        assert got[name] == pytest.approx(exp[i], abs=1e-12), name


def test_crawl_plan_composes_and_cuts(spark):
    # 3 hosts: a (heavily linked), b (medium), c (isolated intra-host
    # only). budget 6 splits by rank; within hosts urls are ordered by
    # inlinks; every kept url satisfies rank_in_host <= its host budget,
    # and host c (no cross-host authority) is absent.
    from ps_projekt_pagerank_spark.operators.hostgraph import crawl_plan

    edges = []
    for p in range(6):  # b -> a (6 distinct a-pages)
        edges.append((f"http://b.test/p{p}", f"http://a.test/p{p % 4}"))
    for p in range(3):  # a -> b
        edges.append((f"http://a.test/p{p}", f"http://b.test/p{p}"))
    edges.append(("http://c.test/x", "http://c.test/y"))  # intra-host only
    df = spark.createDataFrame(edges, "src_url STRING, dst_url STRING")
    out = crawl_plan(df, total_budget=6, num_iterations=4,
                     per_host_per_round=2).collect()
    assert out, "plan must keep pages"
    hosts = {r["host"] for r in out}
    assert "c.test" not in hosts
    budgets = {}
    for r in out:
        assert r["rank_in_host"] <= r["budget"]
        assert r["fetch_round"] == (r["rank_in_host"] - 1) // 2 + 1
        budgets[r["host"]] = r["budget"]
    assert sum(budgets.values()) == 6
    # per-host kept set = its top-budget urls by inlinks: host a has 4
    # distinct pages, so at most min(4, budget_a) rows
    from collections import Counter

    per_host = Counter(r["host"] for r in out)
    for h, n in per_host.items():
        assert n <= budgets[h]


def test_crawl_plan_polite_drops_disallowed_and_renumbers(spark):
    # same 2-host shape, but a.test's robots.txt disallows /p0: the p0
    # URL must vanish from the schedule and rank_in_host must renumber
    # the remaining a-pages densely from 1 (politeness runs BEFORE the
    # per-host window, not as a post-filter).
    from ps_projekt_pagerank_spark.functions.robots import robots_rules
    from ps_projekt_pagerank_spark.operators.hostgraph import crawl_plan

    edges = []
    for p in range(6):  # b -> a
        edges.append((f"http://b.test/p{p}", f"http://a.test/p{p % 4}"))
    for p in range(3):  # a -> b
        edges.append((f"http://a.test/p{p}", f"http://b.test/p{p}"))
    df = spark.createDataFrame(edges, "src_url STRING, dst_url STRING")
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /p0")],
        "host STRING, robots_txt STRING",
    )
    base = crawl_plan(df, total_budget=6, num_iterations=4,
                      per_host_per_round=2).collect()
    out = crawl_plan(df, total_budget=6, num_iterations=4,
                     per_host_per_round=2,
                     robots=robots_rules(robots)).collect()
    urls = {r["url"] for r in out}
    assert "http://a.test/p0" not in urls
    assert any(u.startswith("http://b.test/") for u in urls)
    # budgets come from the FULL graph — unchanged by politeness
    assert ({(r["host"], r["budget"]) for r in out}
            == {(r["host"], r["budget"]) for r in base})
    a_ranks = sorted(r["rank_in_host"] for r in out
                     if r["host"] == "a.test")
    assert a_ranks == list(range(1, len(a_ranks) + 1))
