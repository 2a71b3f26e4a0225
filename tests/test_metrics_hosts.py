"""Clustering coefficient, reciprocity, host-graph collapse, and
deterministic stratified sampling — each verified against a pure-Python
replication on small fixtures."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.graph import reciprocity
from ps_projekt_pagerank_spark.operators.hostgraph import host_edges, host_ids
from ps_projekt_pagerank_spark.operators.sampling import stratified_sample
from ps_projekt_pagerank_spark.operators.triangles import clustering_coefficient


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def test_clustering_coefficient_matches_bruteforce(spark):
    # K4 on {0,1,2,3} plus a pendant 4 and an isolated-by-self-loop 5
    und = list(combinations(range(4), 2)) + [(3, 4)]
    edges = _edges_df(spark, und + [(5, 5)])
    got = {r["id"]: r for r in clustering_coefficient(edges).collect()}

    adj = {v: set() for v in range(6)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    for v in range(6):
        d = len(adj[v])
        tri = sum(
            1 for x, y in combinations(sorted(adj[v]), 2) if y in adj[x]
        )
        coef = 0.0 if d < 2 else round(2 * tri / (d * (d - 1)), 9)
        assert got[v]["degree"] == d
        assert got[v]["triangles"] == tri
        assert got[v]["coefficient"] == pytest.approx(coef, abs=1e-12), v
    # K4 interior nodes are fully clustered, the pendant is 0
    assert got[0]["coefficient"] == 1.0
    assert got[4]["coefficient"] == 0.0


def test_reciprocity_counts(spark):
    # 2 reciprocal pairs (4 directed edges), 3 one-way edges, loops ignored
    edges = _edges_df(
        spark,
        [(1, 2), (2, 1), (3, 4), (4, 3), (5, 6), (6, 7), (7, 5), (8, 8),
         (1, 2)],  # duplicate collapses
    )
    row = reciprocity(edges).collect()[0]
    assert row["reciprocal_edges"] == 4
    assert row["total_edges"] == 7
    assert row["reciprocity"] == pytest.approx(round(4 / 7, 9), abs=1e-12)


def test_host_edges_collapse_and_filters(spark):
    rows = [
        ("http://a.test/1", "http://b.test/2"),   # a->b
        ("http://a.test/3", "http://b.test/9"),   # a->b again (weight 2)
        ("http://a.test/1", "http://a.test/2"),   # intra-host: dropped
        ("http://b.test/1", "https://c.test/x"),  # scheme-insensitive host
        ("u17", "http://a.test/1"),               # relative src: dropped
        ("http://a.test/1", "u17"),               # relative dst: dropped
    ]
    df = spark.createDataFrame(rows, "src_url STRING, dst_url STRING")
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges(df).collect()
    }
    assert got == {("a.test", "b.test"): 2, ("b.test", "c.test"): 1}
    kept = host_edges(df, keep_intra_host=True).collect()
    assert sum(r["weight"] for r in kept) == 4  # intra-host edge kept

    ids = {r["host"]: r["id"] for r in host_ids(host_edges(df)).collect()}
    assert sorted(ids) == ["a.test", "b.test", "c.test"]
    assert sorted(ids.values()) == [0, 1, 2]
    assert ids["a.test"] < ids["b.test"] < ids["c.test"]  # ordered dense ids


def _uniform(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32


def test_stratified_sample_matches_md5_replication(spark):
    rows = [(i, ["en", "sl", "de"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    fr = {"en": 0.5, "sl": 0.2}  # de absent -> dropped entirely
    got = {
        r["doc_id"]
        for r in stratified_sample(
            df, "lang", fr, key_cols=["doc_id"], salt="s1"
        ).collect()
    }
    exp = {
        i
        for i, lang in rows
        if lang in fr and _uniform(f"{i}#s1") < fr[lang]
    }
    assert got == exp
    assert got  # fixture sanity: selects something
    assert not any(i % 3 == 2 for i in got)  # no 'de' rows


def test_stratified_sample_salt_gives_independent_draw(spark):
    rows = [(i, "en") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    a = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.5}, ["doc_id"], "a").collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.5}, ["doc_id"], "b").collect()
    }
    assert a != b               # different salt, different subset
    assert 100 < len(a) < 300   # ~50% of 400 either way
    assert 100 < len(b) < 300
