"""Co-citation/coupling, dedup clustering, and ANF neighborhood sketches.

The ANF oracle is exact: the sketch trajectory is md5-deterministic, so a
pure-Python BFS + hashlib.md5 replication must match Spark's integer
sum-of-bit-positions bit for bit at every h.
"""

from __future__ import annotations

import hashlib

import pytest


def test_cocitation_counts(spark):
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)], "src LONG, dst LONG"
    )
    from ps_projekt_pagerank_spark.operators.cocitation import (
        cocitation_pairs,
        coupling_pairs,
    )

    cc = {(r["a"], r["b"]): r["cocitations"]
          for r in cocitation_pairs(e).collect()}
    assert cc == {(10, 11): 2}
    cp = {(r["a"], r["b"]): r["couplings"]
          for r in coupling_pairs(e).collect()}
    assert cp == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    cp2 = {(r["a"], r["b"]): r["couplings"]
           for r in coupling_pairs(e, min_count=2).collect()}
    assert cp2 == {(1, 2): 2}


def test_cocitation_max_fanout_drops_hubs(spark):
    # src 9 links 3 pages (> cap 2) -> contributes no pairs
    e = spark.createDataFrame(
        [(9, 1), (9, 2), (9, 3), (4, 1), (4, 2)], "src LONG, dst LONG"
    )
    from ps_projekt_pagerank_spark.operators.cocitation import cocitation_pairs

    capped = {(r["a"], r["b"]): r["cocitations"]
              for r in cocitation_pairs(e, max_fanout=2).collect()}
    assert capped == {(1, 2): 1}
    exact = {(r["a"], r["b"]): r["cocitations"]
             for r in cocitation_pairs(e, max_fanout=None).collect()}
    assert exact == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_dedup_clusters_from_explicit_pairs(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 20)],
        "doc_id LONG, text STRING",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG"
    )
    from ps_projekt_pagerank_spark.operators.dedup import dedup_clusters

    got = {
        r["doc_id"]: (r["cluster_id"], r["is_duplicate"])
        for r in dedup_clusters(docs, pairs=pairs).collect()
    }
    assert got == {
        1: (1, False), 2: (1, True), 3: (1, True),
        10: (10, False), 11: (10, True), 20: (20, False),
    }


def test_dedup_clusters_default_lsh_path(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark engines"),
        ],
        "doc_id LONG, text STRING",
    )
    from ps_projekt_pagerank_spark.operators.dedup import dedup_clusters

    got = {
        r["doc_id"]: (r["cluster_id"], r["is_duplicate"])
        for r in dedup_clusters(docs).collect()
    }
    assert got == {1: (1, False), 2: (1, True), 3: (3, False)}


# --- ANF ------------------------------------------------------------------

EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 6), (6, 4), (7, 7)]


def _seed_pos(node: int, r: int, nibbles: int = 10) -> int:
    h = hashlib.md5(f"{node}#{r}".encode()).hexdigest()[:nibbles]
    x = int(h, 16)
    if x == 0:
        return nibbles * 4
    return (x & -x).bit_length() - 1


def _py_anf(edges, rounds, num_sketches=4):
    """Exact replication: per-node out-ball BFS, OR of member seed bits,
    sum of lowest-zero-bit positions over all nodes and sketches."""
    adj = {}
    nodes = set()
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    out = {}
    for h in range(rounds + 1):
        total = 0
        for v in nodes:
            ball = {v}
            frontier = {v}
            for _ in range(h):
                frontier = {d for u in frontier for d in adj.get(u, ())}
                ball |= frontier
            for r in range(num_sketches):
                mask = 0
                for u in ball:
                    mask |= 1 << _seed_pos(u, r)
                pos = 0
                while mask & (1 << pos):
                    pos += 1
                total += pos
        out[h] = total
    return out


def test_anf_matches_python_bit_for_bit(spark):
    from ps_projekt_pagerank_spark.operators.anf import anf_neighborhood

    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        int(r["h"]): int(r["sum_positions"])
        for r in anf_neighborhood(e, rounds=3, num_sketches=4).collect()
    }
    assert got == _py_anf(EDGES, 3, 4)


def test_anf_est_monotone_and_diameter(spark):
    from ps_projekt_pagerank_spark.operators.anf import (
        anf_neighborhood,
        effective_diameter,
    )

    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    rows = sorted(
        anf_neighborhood(e, rounds=4, num_sketches=8).collect(),
        key=lambda r: r["h"],
    )
    ests = [r["est_reach"] for r in rows]
    assert ests == sorted(ests)  # balls only grow
    # path 1..5 has undirected diameter 4; effective diameter <= 4
    d = effective_diameter(e, max_rounds=5, num_sketches=8)
    assert 1 <= d <= 5
