"""Random-walk corpus generation and ego-network extraction, with a pure-
Python md5 replication of the walk trajectories (the walks are
deterministic by design — same trick as the minhash family)."""

from __future__ import annotations

import hashlib


EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (4, 5)]  # 5 is a sink


def _py_walks(edges, walk_length, walks_per_node=1):
    adj = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    out = {}
    for v in sorted(nodes):
        for w in range(walks_per_node):
            wid = v * walks_per_node + w
            walk, cur = [v], v
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs,
                    key=lambda d: hashlib.md5(
                        f"{wid}#{step}#{d}".encode()
                    ).hexdigest(),
                )
                walk.append(cur)
            out[wid] = walk
    return out


def test_random_walks_match_python(spark):
    from ps_projekt_pagerank_spark.operators.sampling import random_walks

    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["walk_id"]: list(r["walk"])
        for r in random_walks(e, walk_length=4, walks_per_node=2).collect()
    }
    want = _py_walks(EDGES, 4, 2)
    assert got == want
    # walks from the sink are length-1
    assert got[5 * 2] == [5]


def test_random_walks_start_column_consistent(spark):
    from ps_projekt_pagerank_spark.operators.sampling import random_walks

    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    for r in random_walks(e, walk_length=3).collect():
        assert r["start"] == r["walk"][0]
        assert r["walk_id"] == r["start"]  # walks_per_node=1


def test_skipgram_pairs_match_python(spark):
    from ps_projekt_pagerank_spark.operators.sampling import (
        random_walks,
        skipgram_pairs,
    )

    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    walks = _py_walks(EDGES, 4, 1)
    want = {}
    for walk in walks.values():
        for i, c in enumerate(walk):
            for j, x in enumerate(walk):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] = want.get((c, x), 0) + 1
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(
            random_walks(e, walk_length=4), window=2
        ).collect()
    }
    assert got == want
    # symmetric window: pair counts are symmetric
    assert all(got[(a, b)] == got[(b, a)] for a, b in got)


def test_skipgram_pairs_window_validates(spark):
    from ps_projekt_pagerank_spark.operators.sampling import (
        random_walks,
        skipgram_pairs,
    )

    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    try:
        skipgram_pairs(random_walks(e, walk_length=2), window=0)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_ego_network_hops(spark):
    from ps_projekt_pagerank_spark.operators.sampling import ego_network

    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    # 1 hop out of node 4: nodes {4,5}, induced edge (4,5)
    got = {(r["src"], r["dst"]) for r in ego_network(e, [4], 1).collect()}
    assert got == {(4, 5)}
    # 2 hops out of node 1: nodes {1,2,3,4}; induced edges exclude (4,5)
    got2 = {(r["src"], r["dst"]) for r in ego_network(e, [1], 2).collect()}
    assert got2 == {(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)}
    # undirected 1 hop from 5 reaches 4
    got3 = {
        (r["src"], r["dst"])
        for r in ego_network(e, [5], 1, undirected=True).collect()
    }
    assert got3 == {(4, 5)}
