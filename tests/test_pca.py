"""Power-iteration principal component: alignment with NumPy's exact top
eigenvector on a planted-direction fixture, the degenerate guard, and
projection consistency."""

import numpy as np
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.embeddings import (
    pc_projection,
    principal_component,
)


def _planted(spark, n=200, d=16, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    x = rng.normal(size=(n, 1)) * 3.0 * u + 0.2 * rng.normal(size=(n, d))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>"),
        x.astype(np.float32).astype(np.float64),
        u,
    )


def test_pc_aligns_with_numpy_top_eigenvector(spark):
    vecs, x, _ = _planted(spark)
    got = principal_component(vecs, iters=3)
    comp = np.array(
        [r["component"] for r in got.orderBy("dim").collect()], dtype=float
    )
    xc = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(xc.T @ xc)
    top = evecs[:, -1]
    cos = abs(comp @ top) / (np.linalg.norm(comp) * np.linalg.norm(top))
    assert cos > 0.99, cos


def test_pc_projection_matches_numpy(spark):
    vecs, x, _ = _planted(spark)
    pc = principal_component(vecs, iters=3)
    rows = sorted(pc.collect(), key=lambda r: r["dim"])
    mean = np.array([r["mean"] for r in rows])
    comp = np.array([r["component"] for r in rows])
    got = {
        r["vec_id"]: r["pc1"] for r in pc_projection(vecs, pc).collect()
    }
    for i in range(0, 200, 37):
        want = float((x[i] - mean) @ comp)
        assert abs(got[i] - want) < 5e-4, (i, got[i], want)


def test_pc_degenerate_constant_embeddings(spark):
    vecs = spark.createDataFrame(
        [(i, [1.5] * 8) for i in range(10)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = principal_component(vecs, iters=2).collect()
    # centered data is all-zero: the guard keeps the all-ones init, no NULLs
    assert all(r["component"] == 1.0 for r in rows)
    proj = pc_projection(vecs, principal_component(vecs, iters=2)).collect()
    assert all(r["pc1"] == 0.0 for r in proj)
