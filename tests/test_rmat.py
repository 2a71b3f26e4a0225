"""R-MAT generator: Python replay, skew shape, twin parity, validation."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from ps_projekt_pagerank_spark.sources.rmat import rmat_edges, rmat_edges_sql


def _py_rmat(n_edges, scale, quads=(5700, 1900, 1900)):
    ta, tb, tc = quads
    t1, t2, t3 = ta, ta + tb, ta + tb + tc
    out = []
    for i in range(n_edges):
        src = dst = 0
        for level in range(scale):
            r = int(
                hashlib.md5(f"{i}#{level}".encode()).hexdigest()[:8], 16
            ) % 10000
            sbit = 0 if r < t2 else 1
            dbit = 1 if ((t1 <= r < t2) or r >= t3) else 0
            src = src * 2 + sbit
            dst = dst * 2 + dbit
        out.append((i, src, dst))
    return out


def test_rmat_matches_python_and_duckdb(spark):
    got = sorted(
        tuple(r) for r in rmat_edges(spark, n_edges=500, scale=8).collect()
    )
    assert got == _py_rmat(500, 8)
    oracle = sorted(duckdb.connect().execute(rmat_edges_sql(500, 8)).fetchall())
    assert got == oracle
    # all ids inside [0, 2^scale)
    assert all(0 <= s < 256 and 0 <= d < 256 for _, s, d in got)


def test_rmat_is_heavy_tailed(spark):
    from collections import Counter

    edges = _py_rmat(5000, 10)
    outdeg = Counter(s for _, s, _ in edges)
    # skewed quadrants concentrate mass: the top source must hold many
    # times the mean degree (5000 edges over <=1024 sources)
    assert max(outdeg.values()) > 10 * (5000 / 1024)
    with pytest.raises(ValueError, match="rmat"):
        rmat_edges(spark, 10, 4, quads=(9000, 2000, 0))
