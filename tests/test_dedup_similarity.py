"""Dedup family + similarity search vs straightforward Python oracles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators import dedup as dd
from ps_projekt_pagerank_spark.operators import similarity as sim

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat"),  # exact dup of 0
    (2, "the cat sat on a mat"),  # near dup
    (3, "spark shuffles partitions across executors"),
    (4, "completely different text about databases and queries"),
    (5, "THE CAT SAT ON THE MAT"),  # case-differs
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def _py_jaccard(a: str, b: str) -> float:
    ta, tb = set(a.lower().split()), set(b.lower().split())
    return len(ta & tb) / len(ta | tb)


def test_exact_duplicates(docs):
    rows = dd.exact_duplicates(docs).collect()
    groups = {r["text_hash"]: (r["n_docs"], r["keep_id"]) for r in rows}
    assert len(groups) == 5  # 6 docs, one exact-dup pair
    assert (2, 0) in groups.values()  # docs 0,1 collapse, survivor 0


def test_minhash_lsh_finds_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dd.minhash_lsh_pairs(docs).collect()}
    # identical token sets MUST share every band
    assert (0, 1) in pairs
    assert (0, 5) in pairs and (1, 5) in pairs  # lowercased tokens equal
    # unrelated docs share no band (4 minhashes over disjoint vocab)
    assert (3, 4) not in pairs


def test_token_jaccard_matches_python(docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.token_jaccard_pairs(docs, threshold=0.0).collect()
    }
    for (a, ta), (b, tb) in [
        ((0, DOCS[0][1]), (2, DOCS[2][1])),
        ((0, DOCS[0][1]), (1, DOCS[1][1])),
    ]:
        expected = _py_jaccard(ta, tb)
        assert math.isclose(got[(a, b)], round(expected, 6), abs_tol=1e-9)
    assert got[(0, 1)] == 1.0
    assert got[(0, 5)] == 1.0  # lowercase normalization


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash64(docs).collect()}
    assert sh[0] == sh[1] == sh[5]  # identical token sets → identical hash
    ham03 = bin(sh[0] ^ sh[3]).count("1")
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    assert ham02 < ham03  # near-dup closer than unrelated doc
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0


def _vec_rows():
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.randn(8).astype(np.float32)  # near-dup
    return [(i, [float(x) for x in vecs[i]]) for i in range(20)], vecs


def test_embedding_neardup_and_knn(spark):
    rows, vecs = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dd.embedding_neardup_pairs(df, threshold=0.99).collect()
    }
    assert (0, 1) in pairs

    # brute-force knn vs numpy
    v64 = vecs.astype(np.float64)
    sims = v64 @ v64.T / (
        np.linalg.norm(v64, axis=1)[:, None] * np.linalg.norm(v64, axis=1)[None, :]
    )
    queries = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = sim.knn_bruteforce(df, queries, k=3).collect()
    for q in (0, 1):
        expected = sorted(
            ((round(sims[q][j], 6), j) for j in range(20) if j != q),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        got_q = sorted(
            (r["neighbor_id"], r["knn_rank"]) for r in got if r["query_id"] == q
        )
        assert got_q == sorted((j, r + 1) for r, (_, j) in enumerate(expected))


def test_knn_lsh_subset_of_bruteforce_scores(spark):
    rows, _ = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    queries = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    approx = sim.knn_lsh(df, queries, k=3, num_bits=2).collect()
    exact = sim.knn_bruteforce(df, queries, k=20).collect()
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["score"] for r in exact
    }
    for r in approx:  # every ANN hit is a real candidate with a real score
        assert (r["query_id"], r["neighbor_id"]) in exact_scores
        assert r["score"] == exact_scores[(r["query_id"], r["neighbor_id"])]


def _kmeans_numpy(mat, num_centroids, iters):
    """NumPy replication of similarity.ivf_centroids' deterministic Lloyd
    trajectory: seeds = smallest ids, assignment by round(cosine,6) with
    ties → smaller cent_id, update = per-dim mean rounded to 6 dp; empty
    cells drop. Returns (cent_ids, centroid_matrix)."""
    m = mat.astype("float64")
    cent_ids = list(range(num_centroids))
    cents = np.round(m[:num_centroids].copy(), 10)
    for _ in range(iters):
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        cs = np.round(mn @ cn.T, 6)
        # stable argmax = first max = smallest cent index; cent_ids ascend
        cells = cs.argmax(axis=1)
        new_ids, new_cents = [], []
        for ci in range(len(cent_ids)):
            members = m[cells == ci]
            if len(members) == 0:
                continue
            new_ids.append(cent_ids[ci])
            new_cents.append(np.round(members.mean(axis=0), 6))
        cent_ids, cents = new_ids, np.array(new_cents)
    return cent_ids, cents


def test_ivf_centroids_match_numpy_kmeans(spark):
    import numpy as np

    from ps_projekt_pagerank_spark.operators.similarity import ivf_centroids

    rng = np.random.RandomState(5)
    mat = rng.randn(40, 8).astype("float32")
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r["cent_id"]: r["cvec"]
        for r in ivf_centroids(vecs, num_centroids=4, kmeans_iters=2).collect()
    }
    exp_ids, exp_cents = _kmeans_numpy(mat, 4, 2)
    assert sorted(got) == exp_ids
    for ci, cid in enumerate(exp_ids):
        assert np.allclose(got[cid], exp_cents[ci], atol=1e-9)


def test_knn_ivf_matches_numpy_replication(spark):
    """IVF = brute-force restricted to the query's nprobe nearest trained
    cells; replicate the k-means, cells, probes and ranking in NumPy and
    compare exactly."""
    import numpy as np

    from ps_projekt_pagerank_spark.operators.similarity import knn_ivf
    from pyspark.sql import functions as F

    rng = np.random.RandomState(5)
    mat = rng.randn(40, 8).astype("float32")
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    queries = vecs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {
        (r["query_id"], r["knn_rank"]): r["neighbor_id"]
        for r in knn_ivf(
            vecs, queries, k=3, num_centroids=4, nprobe=2, kmeans_iters=2
        ).collect()
    }

    cent_ids, cents = _kmeans_numpy(mat, 4, 2)
    m = mat.astype("float64")
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cs = np.round(norm @ cn.T, 6)  # cosine to the trained centroids
    # cell per vector: argmax with tie-break by centroid id (stable argmax)
    cells = cs.argmax(axis=1)
    expected = {}
    for qid in (0, 1):
        order = sorted(range(len(cent_ids)), key=lambda c: (-cs[qid, c], c))[:2]
        cand = [
            j for j in range(40)
            if j != qid and cells[j] in order
        ]
        scores = np.round(norm[cand] @ norm[qid], 6)
        ranked = sorted(zip(cand, scores), key=lambda t: (-t[1], t[0]))[:3]
        for rank, (nid, _) in enumerate(ranked, 1):
            expected[(qid, rank)] = nid
    assert got == expected


def test_embedding_neardup_bucketed_subset_no_cartesian(spark):
    """The IVF-bucketed near-dup path must (a) emit only true pairs —
    a subset of the brute-force oracle, (b) still find the planted
    near-duplicate, (c) compile to a plan with NO cartesian product (the
    only non-equi joins allowed are the K-row broadcast centroid
    assignments)."""
    rows, _ = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    bucketed = dd.embedding_neardup_pairs(
        df, threshold=0.9, num_centroids=4, nprobe=2, kmeans_iters=1
    )
    got = {(r["id_a"], r["id_b"]) for r in bucketed.collect()}
    brute = {
        (r["id_a"], r["id_b"])
        for r in dd.embedding_neardup_pairs_bruteforce(df, threshold=0.9).collect()
    }
    assert got <= brute
    assert (0, 1) in got
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bucketed.explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()


def test_token_jaccard_df_cap_skips_stopword_buckets(spark):
    """The finite max_token_df default must keep stopwords out of the
    self-join: with a cap below the stopword's df, pairs that share ONLY
    the stopword disappear (documented underestimate), while low-df
    tokens still pair up; an explicit None restores the exact answer."""
    rows = [(i, f"the uniq{i}") for i in range(6)] + [(6, "the uniq5")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.token_jaccard_pairs(
            docs, threshold=0.0, max_token_df=3
        ).collect()
    }
    # "the" (df=7 > 3) is never a join bucket: only the uniq5 pair remains,
    # its jaccard an underestimate (intersection misses the capped token)
    assert set(capped) == {(5, 6)}
    # inter misses "the" → 1 / (sz_a + sz_b - inter) = 1/3, not the true 1.0
    assert math.isclose(capped[(5, 6)], round(1 / 3, 6), abs_tol=1e-9)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.token_jaccard_pairs(
            docs, threshold=0.0, max_token_df=None
        ).collect()
    }
    assert len(exact) == 21  # all C(7,2) pairs share "the"
    assert exact[(5, 6)] == 1.0


def test_token_jaccard_candidate_path_matches_full(docs):
    """Candidate-driven jaccard == full token-bucket jaccard restricted to
    the candidate set (same scores, no pair invented or lost)."""
    cands = dd.minhash_lsh_pairs(docs)
    via_cand = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.token_jaccard_pairs(
            docs, threshold=0.2, candidates=cands
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.token_jaccard_pairs(docs, threshold=0.2).collect()
    }
    cand_set = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert via_cand == {p: j for p, j in full.items() if p in cand_set}


def test_derive_num_centroids_sqrt_clamped():
    from ps_projekt_pagerank_spark.operators.similarity import (
        derive_num_centroids,
    )

    assert derive_num_centroids(0) == 2
    assert derive_num_centroids(3) == 2
    assert derive_num_centroids(100) == 10
    assert derive_num_centroids(10**10) == 65536  # clamp: stays broadcastable


def test_derive_nprobe_sixth_of_cells():
    from ps_projekt_pagerank_spark.operators.similarity import derive_nprobe

    assert derive_nprobe(2) == 2       # floor
    assert derive_nprobe(12) == 2
    assert derive_nprobe(22) == 4      # ceil(22/6), the sf0.01 derived K
    assert derive_nprobe(44) == 8      # sf0.1's K: recall@5 0.916 measured
    assert derive_nprobe(65536) == 10923


def test_knn_ivf_auto_centroids(spark):
    """num_centroids=None derives K=isqrt(n) and must equal the explicit-K
    run (n=40 -> K=6)."""
    import numpy as np

    from ps_projekt_pagerank_spark.operators.similarity import knn_ivf
    from pyspark.sql import functions as F

    rng = np.random.RandomState(5)
    mat = rng.randn(40, 8).astype("float32")
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    queries = vecs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    def rows(nc):
        return sorted(
            (r["query_id"], r["knn_rank"], r["neighbor_id"])
            for r in knn_ivf(
                vecs, queries, k=3, num_centroids=nc, nprobe=2, kmeans_iters=2
            ).collect()
        )

    assert rows(None) == rows(6)


def test_semdedup_groups_and_outlier_survivor(spark):
    # three planted semantic-dup groups + untouched singletons; the
    # survivor must be each group's farthest-from-centroid member
    # (SemDeDup keeps the outlier), verified against a numpy replay of
    # the deterministic k-means cells.
    rng = np.random.RandomState(11)
    base = rng.randn(6, 8).astype(np.float32)
    rows = []
    vid = 0
    groups = []
    for g in range(3):  # groups of 3 near-identical vectors
        ids = []
        for j in range(3):
            v = base[g] + 0.001 * (j + 1) * rng.randn(8).astype(np.float32)
            rows.append((vid, [float(x) for x in v]))
            ids.append(vid)
            vid += 1
        groups.append(ids)
    for g in range(3, 6):  # singletons
        rows.append((vid, [float(x) for x in base[g]]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r["doc_id"]: r for r in dd.semdedup(
        df, threshold=0.999, num_centroids=4, nprobe=2
    ).collect()}
    assert len(out) == len(rows)
    for ids in groups:
        clusters = {out[i]["cluster_id"] for i in ids}
        assert clusters == {min(ids)}, "group must close into one cluster"
        surv = {out[i]["survivor_id"] for i in ids}
        assert len(surv) == 1
        expect = min(
            (round(out[i]["centroid_sim"], 6), i) for i in ids
        )[1]  # farthest from centroid, tie -> smaller id
        assert surv == {expect}
        for i in ids:
            assert out[i]["is_duplicate"] == (i != expect)
    for i in range(9, 12):  # singletons survive as their own cluster
        assert out[i]["cluster_id"] == i
        assert out[i]["survivor_id"] == i
        assert not out[i]["is_duplicate"]


def test_cell_cosine_pairs_subbucket_oversized_cell(spark):
    """Triangle sub-bucketing of oversized cells (round-4 verdict task 1):
    planting ALL vectors in one cell with max_cell_rows=5 forces
    s = ceil(30/5) = 6 sub-buckets; the pair SET must be identical to the
    un-bucketed run AND to the exact within-cell cosine oracle, and the
    pair-scoring join must be a ShuffledHashJoin (never a broadcast of
    the vector side)."""
    import contextlib
    import io

    rng = np.random.default_rng(11)
    base = rng.normal(size=8)
    rows = []
    for i in range(30):
        v = base + rng.normal(scale=0.05 if i < 20 else 5.0, size=8)
        rows.append((i, [float(x) for x in np.round(v, 3)]))
    vecs = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    cells = spark.createDataFrame(
        [(i, 0) for i in range(30)], "pid LONG, cell INT"
    )
    sub = dd._cell_cosine_pairs(
        cells, vecs, 0.9, "vec_id", "embedding", max_cell_rows=5
    )
    flat = dd._cell_cosine_pairs(
        cells, vecs, 0.9, "vec_id", "embedding", max_cell_rows=10**9
    )
    got_sub = {(r["id_a"], r["id_b"]) for r in sub.collect()}
    got_flat = {(r["id_a"], r["id_b"]) for r in flat.collect()}

    mat = np.array([r[1] for r in rows], dtype="float64")
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = n @ n.T
    oracle = {
        (i, j)
        for i in range(30)
        for j in range(i + 1, 30)
        if cos[i, j] > 0.9
    }
    assert got_sub == oracle  # no pair lost or duplicated by sub-bucketing
    assert got_sub == got_flat
    assert len(oracle) >= 150  # the planted tight cluster actually pairs

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sub.explain("formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
