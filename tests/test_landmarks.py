"""Landmark distance oracle semantics."""

from collections import deque

import duckdb
import pytest

from ps_projekt_pagerank_spark.operators.landmarks import (
    landmark_distances,
    landmark_distances_sql,
    select_landmarks,
)

EDGES = [(0, 1), (1, 2), (2, 3), (1, 3), (0, 2), (3, 4), (4, 0), (2, 5)]


def _exact_dist(edges, src):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist, q = {src: 0}, deque([src])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_landmark_estimates_are_upper_bounds(spark):
    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    nodes = sorted({x for p in EDGES for x in p})
    pairs = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a != b], "src LONG, dst LONG"
    )
    out = {
        (r["src"], r["dst"]): r["est_dist"]
        for r in landmark_distances(e, pairs, num_landmarks=2, max_depth=6).collect()
    }
    assert out, "oracle must bound some pairs"
    for (a, b), est in out.items():
        exact = _exact_dist(EDGES, a).get(b)
        assert exact is not None and est >= exact, (a, b, est, exact)
    # an estimate through a landmark on the shortest path is exact:
    lmk = select_landmarks(e, 2)
    for (a, b), est in out.items():
        d_a = _exact_dist(EDGES, a)
        if any(
            ell in d_a
            and b in _exact_dist(EDGES, ell)
            and d_a[ell] + _exact_dist(EDGES, ell)[b] == d_a[b]
            for ell in lmk
        ):
            assert est == _exact_dist(EDGES, a)[b], (a, b)


def test_landmark_matches_duckdb_twin(spark):
    e = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    nodes = sorted({x for p in EDGES for x in p})
    pairs = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a != b], "src LONG, dst LONG"
    )
    got = sorted(
        tuple(r)
        for r in landmark_distances(e, pairs, num_landmarks=2, max_depth=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", EDGES)
    pairs_sql = " UNION ALL ".join(
        f"SELECT {a} AS src, {b} AS dst"
        for a in nodes
        for b in nodes
        if a != b
    )
    exp = sorted(
        tuple(r)
        for r in con.sql(
            landmark_distances_sql(
                "SELECT src, dst FROM e", pairs_sql, num_landmarks=2, max_depth=4
            )
        ).fetchall()
    )
    assert got == exp


def test_landmark_validates_params(spark):
    with pytest.raises(ValueError):
        landmark_distances(None, None, num_landmarks=0)
