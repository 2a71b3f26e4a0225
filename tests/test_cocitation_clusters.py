"""Co-citation / bibliographic coupling vs a brute-force Python oracle,
and dedup_clusters (LSH pairs -> connected components -> survivor flags)."""

from __future__ import annotations

from itertools import combinations

import pytest


EDGES = [
    (1, 10), (1, 11), (2, 10), (2, 11), (2, 12),
    (3, 12), (3, 13), (4, 10), (4, 13), (5, 14),
]


def _py_pairs(edges, shared_idx, paired_idx):
    by_shared = {}
    for e in set(edges):
        by_shared.setdefault(e[shared_idx], set()).add(e[paired_idx])
    counts = {}
    for members in by_shared.values():
        for a, b in combinations(sorted(members), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return counts


@pytest.fixture()
def edges(spark):
    return spark.createDataFrame(EDGES, "src LONG, dst LONG")


def test_cocitation_matches_python(edges):
    from ps_projekt_pagerank_spark.operators.cocitation import cocitation_pairs

    got = {
        (r["a"], r["b"]): r["cocitations"]
        for r in cocitation_pairs(edges, max_fanout=None).collect()
    }
    assert got == _py_pairs(EDGES, 0, 1)


def test_coupling_matches_python(edges):
    from ps_projekt_pagerank_spark.operators.cocitation import coupling_pairs

    got = {
        (r["a"], r["b"]): r["couplings"]
        for r in coupling_pairs(edges, max_fanout=None).collect()
    }
    assert got == _py_pairs(EDGES, 1, 0)


def test_cocitation_min_count_filters(edges):
    from ps_projekt_pagerank_spark.operators.cocitation import cocitation_pairs

    got = {
        (r["a"], r["b"])
        for r in cocitation_pairs(edges, min_count=2, max_fanout=None).collect()
    }
    want = {p for p, n in _py_pairs(EDGES, 0, 1).items() if n >= 2}
    assert got == want


def test_cocitation_max_fanout_drops_hub_sources(spark):
    from ps_projekt_pagerank_spark.operators.cocitation import cocitation_pairs

    # source 99 cites 20 pages -> excluded at max_fanout=8; source 1 kept
    rows = [(99, d) for d in range(100, 120)] + [(1, 100), (1, 101)]
    e = spark.createDataFrame(rows, "src LONG, dst LONG")
    got = {
        (r["a"], r["b"]): r["cocitations"]
        for r in cocitation_pairs(e, max_fanout=8).collect()
    }
    assert got == {(100, 101): 1}


def test_dedup_clusters_groups_lsh_pairs(spark):
    from ps_projekt_pagerank_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # exact dup of 1
            (3, base + " extra"),           # near dup of 1/2
            (4, "completely different text about spark shuffles and joins"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_duplicate"])
        for r in dedup_clusters(docs).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # 1 and 2 must share a cluster rooted at min id 1; 2 flagged duplicate
    assert got[1] == (1, False)
    assert got[2] == (1, True)
    # 4 is a singleton survivor
    assert got[4] == (4, False)
    # every cluster id is the min doc_id of its members
    clusters = {}
    for doc, (cid, _) in got.items():
        clusters.setdefault(cid, []).append(doc)
    for cid, members in clusters.items():
        assert cid == min(members)


def test_dedup_clusters_accepts_custom_pairs(spark):
    from pyspark.sql import functions as F
    from ps_projekt_pagerank_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 6)], "doc_id LONG, text STRING"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a LONG, id_b LONG"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs=pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_leakage_safe_split_keeps_clusters_together(spark):
    import hashlib

    from ps_projekt_pagerank_spark.operators.dedup import leakage_safe_split

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base + f" tail{i // 4}") for i in range(40)]  # dup groups of 4
    rows += [(100 + i, f"unique document number {i} about topic {i * 7}")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = leakage_safe_split(docs, test_frac=0.3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # the leakage guarantee: one side per cluster
    assert all(len(sides) == 1 for sides in by_cluster.values())
    # the draw replays the documented md5-uniform exactly
    for r in out:
        u = int(
            hashlib.md5(f"{r['cluster_id']}#split".encode()).hexdigest()[:8],
            16,
        ) / 2**32
        assert r["split"] == ("test" if u < 0.3 else "train")
    # both sides are populated at this corpus size
    assert {r["split"] for r in out} == {"test", "train"}


def test_leakage_safe_split_validates_frac(spark):
    from ps_projekt_pagerank_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    try:
        leakage_safe_split(docs, test_frac=1.5)
        raised = False
    except ValueError:
        raised = True
    assert raised
