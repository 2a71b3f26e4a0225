"""SimRank (pruned, nano-int) and corpus-diversity operators: closed-form
hand fixtures plus a pure-Python SimRank replication on a random graph."""

import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.diversity import corpus_diversity
from ps_projekt_pagerank_spark.operators.simrank import NANO, simrank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# --- simrank ---------------------------------------------------------------


def test_simrank_one_iteration_closed_form(spark):
    # 0→2, 0→3, 1→2, 1→3: I(2) = I(3) = {0,1} →
    # s1(2,3) = C · |I∩| / (n·n) = 0.8 · 2/4 = 0.4
    edges = _edges(spark, [(0, 2), (0, 3), (1, 2), (1, 3)])
    out = simrank(edges, iterations=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (2, 3)
    assert r["snano"] == 400_000_000 and r["simrank"] == 0.4


def test_simrank_second_iteration_uses_parent_scores(spark):
    # I(2)=I(3)={0,1}; (4,5) shares no in-neighbor → never a candidate
    # (the pruning contract). s2(2,3): contributions over {0,1}²: two
    # identity terms → 2·NANO, the (0,1) pair is untracked → 0, so
    # s2(2,3) = (4 · 2·NANO) div (5 · 4) = 0.4 — a fixpoint here.
    edges = _edges(spark, [(0, 2), (0, 3), (1, 2), (1, 3), (2, 4), (3, 5)])
    out = {(r["id_a"], r["id_b"]): r["snano"] for r in simrank(edges, iterations=2).collect()}
    assert out == {(2, 3): 400_000_000}


def test_simrank_matches_pure_python_on_random_graph(spark):
    # deterministic pseudo-random digraph; prune-aware reference replica
    import hashlib

    pairs = []
    for i in range(240):
        h = int(hashlib.md5(f"sr{i}".encode()).hexdigest()[:8], 16)
        pairs.append((h % 17, (h // 17) % 23))
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = _edges(spark, pairs)

    e = sorted(set(pairs))
    in_nb = {}
    for s, d in e:
        in_nb.setdefault(d, set()).add(s)
    cand = {}
    for a in in_nb:
        for b in in_nb:
            if a < b and in_nb[a] & in_nb[b]:
                if len(in_nb[a]) <= 64 and len(in_nb[b]) <= 64:
                    cand[(a, b)] = (len(in_nb[a]), len(in_nb[b]))
    prev = {}
    for _ in range(3):
        cur = {}
        for (a, b), (na, nb) in cand.items():
            tot = 0
            for i in in_nb[a]:
                for j in in_nb[b]:
                    if i == j:
                        tot += NANO
                    else:
                        tot += prev.get((min(i, j), max(i, j)), 0)
            cur[(a, b)] = (4 * tot) // (5 * na * nb)
        prev = cur
    want = {k: v for k, v in prev.items() if v > 0}

    got = {
        (r["id_a"], r["id_b"]): r["snano"]
        for r in simrank(edges, iterations=3).collect()
    }
    assert got == want


def test_simrank_excludes_hubs(spark):
    # dst 9 has in-degree 3 > cap 2 → every pair involving 9 dropped
    edges = _edges(spark, [(0, 9), (1, 9), (2, 9), (0, 5), (1, 5)])
    out = simrank(edges, iterations=1, max_in_degree=2).collect()
    assert out == []


def test_simrank_validates_params(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        simrank(e, iterations=0)
    with pytest.raises(ValueError):
        simrank(e, c_num=5, c_den=4)


# --- corpus diversity --------------------------------------------------------


def test_diversity_uniform_and_concentrated(spark):
    rows = (
        [(i, "en", "s%d" % (i % 4)) for i in range(8)]  # uniform over 4
        + [(100 + i, "fr", "s0") for i in range(5)]  # all in one source
        + [(200, "fr", "s1")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = {r["lang"]: r for r in corpus_diversity(docs).collect()}
    en = out["en"]
    # uniform: inv_simpson == m == 4, gini == 0
    assert en["n_docs"] == 8 and en["n_units"] == 4
    assert en["inv_simpson"] == pytest.approx(4.0, abs=1e-6)
    assert en["gini"] == pytest.approx(0.0, abs=1e-6)
    fr = out["fr"]
    # concentrated: 36 / (25 + 1); gini = (2·(1·1 + 2·5))/(2·6) − 3/2
    assert fr["inv_simpson"] == pytest.approx(36 / 26, abs=1e-6)
    assert fr["gini"] == pytest.approx(22 / 12 - 1.5, abs=1e-6)
