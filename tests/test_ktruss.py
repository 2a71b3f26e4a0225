"""k-truss peeling vs a pure-Python replication and the DuckDB twin."""

import duckdb

from ps_projekt_pagerank_spark.operators.triangles import (
    k_truss,
    k_truss_sql,
)

# a 4-clique {0,1,2,3} (every edge support 2 -> survives k=4), a triangle
# {4,5,6} glued to the clique by one edge (support 1 -> peeled at k=4 but
# kept at k=3), and a tail 6-7 (support 0 -> peeled at k>=3)
CLIQUE = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
TRI = [(4, 5), (4, 6), (5, 6)]
GLUE = [(3, 4)]
TAIL = [(6, 7)]
EDGES = CLIQUE + TRI + GLUE + TAIL


def _py_ktruss(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b])
            for a, b in es
        }
        kill = {e for e in es if sup[e] < k - 2}
        if not kill:
            return es
        es -= kill


def test_ktruss_matches_python(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    for k in (2, 3, 4, 5):
        got = {
            (r["a"], r["b"]) for r in k_truss(df, k).collect()
        }
        assert got == _py_ktruss(EDGES, k), k
    assert {(r["a"], r["b"]) for r in k_truss(df, 4).collect()} == set(
        CLIQUE
    )
    assert {(r["a"], r["b"]) for r in k_truss(df, 5).collect()} == set()


def test_ktruss_cascading_peel(spark):
    # a chain of triangles sharing single edges: peeling one kills the
    # next round's support — exercises multi-round convergence
    chain = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5),
             (5, 6), (4, 6)]
    df = spark.createDataFrame(chain, "src LONG, dst LONG")
    got = {(r["a"], r["b"]) for r in k_truss(df, 4).collect()}
    assert got == _py_ktruss(chain, 4) == set()


def test_ktruss_duckdb_twin(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {(r["a"], r["b"]) for r in k_truss(df, 4).collect()}
    values = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = k_truss_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", 4, rounds=5
    )
    oracle = {
        (r[0], r[1]) for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def test_ktruss_delta_peeling_work_shrinks(spark):
    # gradient path-power graph (vertex i reaches i+1..i+reach, reach
    # shrinking 5->2 along the path) + a K7: k=6 peels the gradient in 3
    # rounds (verified by the pure-Python oracle: dead triangles 63, 25,
    # 0) while the clique survives. The stats assert the delta property:
    # after the ONE full enumeration, per-round touched work (dead
    # triangles) strictly DECREASES — the full-recount loop would have
    # paid the complete wedge enumeration all 3 rounds.
    n = 40
    grad = []
    for i in range(n):
        reach = 5 - min(4, i // 10)
        for j in range(i + 1, min(i + 1 + reach, n)):
            grad.append((i + 100, j + 100))
    clique = [(a, b) for a in range(7) for b in range(a + 1, 7)]
    edges = grad + clique
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    stats = []
    got = {(r["a"], r["b"]) for r in k_truss(df, 6, stats=stats).collect()}
    assert got == _py_ktruss(edges, 6)
    assert set(clique) <= got
    assert len(stats) >= 3, "fixture must need multiple peel rounds"
    dead = [s["dead_triangles"] for s in stats]
    assert all(a > b for a, b in zip(dead, dead[1:])), dead
    live = [s["live_triangles"] for s in stats]
    assert all(a >= b for a, b in zip(live, live[1:])), live
    # work accounting: every dead triangle is counted exactly once
    assert live[0] + dead[0] == live[-1] + sum(dead)


def test_ktruss_delta_support_matches_full_recount(spark):
    # after convergence every surviving edge's support (within the
    # survivor subgraph) must be >= k-2 per the FULL recount oracle —
    # the delta-maintained state cannot drift from _edge_support
    from pyspark.storagelevel import StorageLevel

    from ps_projekt_pagerank_spark.operators.triangles import _edge_support

    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    out = k_truss(df, 3)
    e = out.persist(StorageLevel.MEMORY_AND_DISK)
    sup = {(r["a"], r["b"]): r["support"] for r in _edge_support(e).collect()}
    kept = {(r["a"], r["b"]) for r in e.collect()}
    e.unpersist()
    for edge in kept:
        assert sup.get(edge, 0) >= 1, (edge, sup.get(edge, 0))


def _py_trussness(pairs):
    """literal peel-based truss decomposition — the definitional oracle."""
    from collections import defaultdict

    edges = set()
    adj = defaultdict(set)
    for s, d in pairs:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        edges.add((a, b))
        adj[a].add(b)
        adj[b].add(a)
    tri_of = defaultdict(list)
    tris = []
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                tris.append(((a, b), (a, c), (b, c)))
    for t in tris:
        for e in t:
            tri_of[e].append(t)
    cur_edges, cur_tris = set(edges), set(tris)
    sup = {e: len(tri_of[e]) for e in edges}
    truss = {}
    k = 3
    while cur_edges:
        while True:
            rem = [e for e in cur_edges if sup[e] < k - 2]
            if not rem:
                break
            for e in rem:
                cur_edges.discard(e)
                truss[e] = k - 1
                for t in tri_of[e]:
                    if t in cur_tris:
                        cur_tris.discard(t)
                        for e2 in t:
                            if e2 in cur_edges:
                                sup[e2] -= 1
        k += 1
        if k > 60:
            break
    return truss


def test_truss_decomposition_matches_peel_and_fixpoint(spark):
    from itertools import combinations

    from ps_projekt_pagerank_spark.operators.triangles import (
        truss_decomposition,
    )

    edges = (
        list(combinations(range(5), 2))  # K5: every edge trussness 5
        + [(0, 10), (10, 11)]            # pendant chain: trussness 2
        + [(20, 21), (21, 22), (22, 20)]  # triangle: trussness 3
        + [(30, 31), (40, 40), (0, 1)]   # isolated edge, self-loop, dup
    )
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    fixp = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(df).collect()
    }
    fixed = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(df, rounds=8).collect()
    }
    assert fixp == fixed == _py_trussness(edges)
    assert fixp[(0, 1)] == 5 and fixp[(20, 21)] == 3 and fixp[(30, 31)] == 2


def test_truss_decomposition_sql_twin(spark):
    import duckdb

    from ps_projekt_pagerank_spark.operators.triangles import (
        truss_decomposition,
        truss_decomposition_sql,
    )

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (3, 1), (4, 5)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(df, rounds=6).collect()
    }
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = truss_decomposition_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", 6
    )
    oracle = {
        (r[0], r[1]): r[2] for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle
    # K4 edges have trussness 4; the disconnected edge 2
    assert got[(0, 1)] == 4 and got[(4, 5)] == 2
