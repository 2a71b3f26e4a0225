"""HyperBall harmonic centrality vs an exact pure-Python replication of
the FM-sketch trajectory (balls computed by BFS, sketches = OR of member
seeds — identical by induction to the propagation loop)."""

import hashlib
import math

import pytest

from ps_projekt_pagerank_spark.operators.anf import (
    harmonic_centrality,
    harmonic_est_table,
)

EDGES = [
    (0, 1), (1, 2), (2, 0),          # 3-cycle
    (3, 0), (4, 0), (5, 0),          # spokes into 0
    (5, 6), (6, 6),                  # chain + self-loop (dropped)
    (7, 3),
]
R, NIB, H = 4, 10, 3


def _seed(u: int, r: int) -> int:
    x = int(hashlib.md5(f"{u}#{r}".encode()).hexdigest()[:NIB], 16)
    tz = NIB * 4 if x == 0 else (x & -x).bit_length() - 1
    return 1 << tz


def _lzp(s: int) -> int:
    # position of lowest zero bit = bit_count(((~s) & (s+1)) - 1)
    return bin(((~s) & (s + 1)) - 1 & ((1 << 64) - 1)).count("1")


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6  # Spark HALF_UP for positives


def _py_harmonic(edges, direction="in"):
    e = {(s, d) for s, d in edges if s != d}
    if direction == "in":
        e = {(d, s) for s, d in e}
    nodes = {u for p in e for u in p}
    out = {u: [] for u in nodes}
    for s, d in e:
        out[s].append(d)

    def ball(v, h):
        cur = {v}
        for _ in range(h):
            cur = cur | {w for u in cur for w in out[u]}
        return cur

    tbl = harmonic_est_table(R, NIB)

    def est(v, h):
        pos = sum(
            _lzp(
                __import__("functools").reduce(
                    lambda a, u: a | _seed(u, r), ball(v, h), 0
                )
            )
            for r in range(R)
        )
        return tbl[pos]

    harm = {}
    for v in nodes:
        acc, prev = 0.0, est(v, 0)
        for h in range(1, H + 1):
            cur = est(v, h)
            acc += (cur - prev) / float(h)
            prev = cur
        harm[v] = _round6(acc)
    return harm


@pytest.mark.parametrize("direction", ["in", "out"])
def test_harmonic_matches_python_exactly(spark, direction):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(
            df, rounds=H, num_sketches=R, nibbles=NIB, direction=direction
        ).collect()
    }
    want = _py_harmonic(EDGES, direction)
    assert got == want


def test_harmonic_star_center_tops_in_ranking(spark):
    # everything points at 0 -> 0 has the largest in-harmonic
    star = [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(star, "src LONG, dst LONG")
    rows = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(df, rounds=2, num_sketches=8).collect()
    }
    assert rows[0] == max(rows.values())
    assert all(rows[i] == 0.0 for i in range(1, 9))


def test_harmonic_rejects_bad_direction(spark):
    df = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    with pytest.raises(ValueError, match="direction"):
        harmonic_centrality(df, rounds=1, direction="sideways")
