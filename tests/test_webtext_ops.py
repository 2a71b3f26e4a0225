"""Chunk-level dup stats, weighted Bernoulli sampling, and int8 embedding
quantization vs pure-Python replications and the DuckDB twins."""

import hashlib
import math

import duckdb

from ps_projekt_pagerank_spark.functions.embeddings import (
    quantize_embeddings,
    quantize_embeddings_sql,
)
from ps_projekt_pagerank_spark.operators.dedup import (
    chunk_dup_stats,
    chunk_dup_stats_sql,
)
from ps_projekt_pagerank_spark.operators.sampling import (
    weighted_bernoulli_sample,
)

DOCS = [
    (0, "a b c d e f g h"),          # chunks(4): "a b c d", "e f g h"
    (1, "a b c d x y z w"),          # shares "a b c d" with doc 0
    (2, "p q r"),                    # < 4 tokens -> 0 chunks
    (3, "e f g h e f g h"),          # internal duplicate chunk
]


def _py_chunk_stats(docs, w):
    from collections import Counter

    chunks = {}
    for did, text in docs:
        toks = text.split(" ")
        n = len(toks) // w
        chunks[did] = [
            " ".join(toks[i * w : (i + 1) * w]) for i in range(n)
        ]
    freq = Counter(c for cs in chunks.values() for c in cs)
    out = {}
    for did, cs in chunks.items():
        dup = sum(1 for c in cs if freq[c] > 1)
        out[did] = (
            len(cs),
            dup,
            float(dup) / len(cs) if cs else None,
        )
    return out


def test_chunk_dup_stats_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_fraction"])
        for r in chunk_dup_stats(df, chunk_tokens=4).collect()
    }
    assert got == _py_chunk_stats(DOCS, 4)


def test_chunk_dup_stats_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_fraction"])
        for r in chunk_dup_stats(df, chunk_tokens=4).collect()
    }
    values = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = chunk_dup_stats_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)", 4
    )
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle


def test_weighted_sample_matches_python(spark):
    rows = [(i, min(1.0, i / 50.0)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id LONG, keep_p DOUBLE")
    kept = {
        r["doc_id"]
        for r in weighted_bernoulli_sample(
            df, "keep_p", key_cols=["doc_id"], salt="s"
        ).collect()
    }
    expect = set()
    for i, p in rows:
        u = int(hashlib.md5(f"{i}#s".encode()).hexdigest()[:8], 16) / 2**32
        if u < p:
            expect.add(i)
    assert kept == expect
    assert 0 not in kept  # p=0 never kept
    assert 99 in kept or 98 in kept  # p=1 rows always kept
    assert all(i in kept for i, p in rows if p >= 1.0)


def _py_quantize(vecs):
    out = {}
    for vid, v in vecs:
        scale = max(abs(float(x)) for x in v) if v else 0.0
        for d, x in enumerate(v):
            q = (
                int(math.floor(float(x) / scale * 127.0 + 0.5))
                if scale > 0
                else 0
            )
            out[(vid, d)] = (q, scale)
    return out


def test_quantize_matches_python_and_duckdb(spark):
    vecs = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector -> q=0, scale=0
        (2, [-2.0, 1.5, 0.1, 3.3]),
    ]
    df = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {
        (r["vec_id"], r["dim"]): (r["q"], r["scale"])
        for r in quantize_embeddings(df).collect()
    }
    # float32 storage: replicate through float32 like the engines read it
    import numpy as np

    vecs32 = [(vid, list(np.array(v, dtype=np.float32))) for vid, v in vecs]
    assert got == _py_quantize(vecs32)
    values = ", ".join(
        f"({vid}, [" + ", ".join(f"CAST({x} AS FLOAT)" for x in v) + "])"
        for vid, v in vecs
    )
    sql = quantize_embeddings_sql(
        f"SELECT * FROM (VALUES {values}) AS t(vec_id, embedding)"
    )
    oracle = {
        (r[0], r[1]): (r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == oracle
    assert all(-127 <= q <= 127 for q, _ in got.values())


def test_corpus_splits_deterministic_and_partitioned(spark):
    from ps_projekt_pagerank_spark.operators.sampling import corpus_splits

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id LONG")
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    a = {
        r["doc_id"]: r["split"]
        for r in corpus_splits(df, fr, salt="s").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in corpus_splits(
            df.repartition(7), fr, salt="s"
        ).collect()
    }
    assert a == b  # parallelism-independent
    expect = {}
    for i in range(400):
        u = int(hashlib.md5(f"{i}#s".encode()).hexdigest()[:8], 16) / 2**32
        expect[i] = "train" if u < 0.5 else ("val" if u < 0.75 else "test")
    assert a == expect
    from collections import Counter

    c = Counter(a.values())
    assert 150 < c["train"] < 250 and c["val"] > 50 and c["test"] > 50


def test_corpus_splits_validation(spark):
    import pytest as _pytest

    from ps_projekt_pagerank_spark.operators.sampling import corpus_splits

    df = spark.createDataFrame([(1,)], "doc_id LONG")
    with _pytest.raises(ValueError):
        corpus_splits(df, {})
    with _pytest.raises(ValueError):
        corpus_splits(df, {"a": 0.9, "b": 0.2})


def test_cluster_stats(spark):
    import duckdb as _duck

    from ps_projekt_pagerank_spark.functions.embeddings import (
        cluster_stats,
        cluster_stats_sql,
    )

    vecs = [
        (0, [1.0, 0.0], 7), (1, [1.0, 0.0], 7), (2, [0.0, 2.0], 8),
        (3, [2.0, -2.0], 8), (4, [0.5, 0.5], 8),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    got = {
        r["label"]: (
            r["n_vectors"], r["dim"], r["centroid_norm"], r["mean_sq_norm"]
        )
        for r in cluster_stats(df).collect()
    }
    # label 7: centroid (1,0) -> norm 1; mean sq norm = 1
    assert got[7] == (2, 2, 1.0, 1.0)
    # label 8: centroid ((0+2+.5)/3, (2-2+.5)/3) = (0.833333, 0.166667)
    import math

    m0, m1 = round(2.5 / 3, 6), round(0.5 / 3, 6)
    assert got[8][2] == round(math.sqrt(m0 * m0 + m1 * m1), 6)
    values = ", ".join(
        f"([{', '.join(f'CAST({x} AS FLOAT)' for x in v)}], {lab})"
        for _, v, lab in vecs
    )
    sql = cluster_stats_sql(
        f"SELECT * FROM (VALUES {values}) AS t(embedding, label)"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in _duck.connect().execute(sql).fetchall()
    }
    assert got == oracle
