"""Composed corpus-filter pipeline: stage semantics and the DuckDB twin
on a hand-built corpus with known dups / junk / short docs."""

import duckdb

from ps_projekt_pagerank_spark.functions.text import repeated_ngram_sql
from ps_projekt_pagerank_spark.operators.dedup import chunk_dup_stats_sql
from ps_projekt_pagerank_spark.plans.corpus import (
    corpus_pipeline,
    corpus_pipeline_sql,
    exact_dedup_survivors,
)

LONG_A = " ".join(f"tok{i % 37}" for i in range(60))
LONG_B = " ".join(f"w{i % 53} u{i % 11}" for i in range(40))
JUNK = "spam ham " * 30  # dup_ratio_2gr ~ 1 -> quality_filter drops
DOCS = [
    (0, LONG_A, 400),
    (1, LONG_A, 300),     # exact dup of 0, lower quality -> removed
    (2, LONG_B, 500),
    (3, LONG_A, 450),     # exact dup of 0, HIGHER quality -> the survivor
    (4, "too short", 20),  # < 10 tokens -> quality_filter drops
    (5, JUNK.strip(), 490),
]


def test_exact_dedup_survivors(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING, n_chars LONG")
    ids = {r["doc_id"] for r in exact_dedup_survivors(df).collect()}
    assert ids == {2, 3, 4, 5}  # 3 wins the {0,1,3} group on n_chars


def test_corpus_pipeline_semantics(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING, n_chars LONG")
    out = {
        r["doc_id"]: r
        for r in corpus_pipeline(df, keep_p_scale=100.0).collect()
    }
    # 0/1 lost dedup, 4 too short, 5 junk (repetition) -> at most {2, 3};
    # keep_p = 1.0 for both (n_chars > 100), so the sampler keeps them
    assert set(out) == {2, 3}
    assert all(r["keep_p"] == 1.0 for r in out.values())


def test_corpus_pipeline_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING, n_chars LONG")
    got = {
        (r["doc_id"], r["n_tokens"], r["dup_fraction"], r["keep_p"])
        for r in corpus_pipeline(df, keep_p_scale=100.0).collect()
    }
    values = ", ".join(f"({i}, '{t}', {q})" for i, t, q in DOCS)
    sql = corpus_pipeline_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text, n_chars)",
        quality_sql_of=lambda d: (
            "SELECT doc_id, n_tokens, "
            "(n_tokens >= 10 AND n_tokens <= 100000 AND "
            "dup_ratio_2gr <= 0.6 AND dup_ratio_3gr <= 0.4) AS keep "
            f"FROM ({repeated_ngram_sql(d)})"
        ),
        chunk_sql_of=lambda d: chunk_dup_stats_sql(d, 16),
        keep_p_scale=100.0,
    )
    oracle = set(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == oracle


# ------------------------------------------------------- near-dup stage
def test_near_dup_fixture_discriminates(spark):
    # planted near-dups (id >= 10^7) cluster with EXACTLY their source;
    # unrelated docs stay singletons (the wide md5 vocabulary keeps
    # unrelated Jaccard ~ 0, verified 0 band collisions by a hashlib
    # replica of the minhash) — the property the raw documents fixture
    # lacks and the reason corpus_pipeline(near_dup=) defaults off
    from ps_projekt_pagerank_spark.operators.dedup import dedup_survivors
    from ps_projekt_pagerank_spark.sources import derived as D

    docs = D.near_dup_documents(spark, "/root/testdata/sf0.001")
    nd = dedup_survivors(docs, "n_chars").collect()
    by_id = {r["doc_id"]: r for r in nd}
    planted = [i for i in by_id if i >= 10_000_000]
    assert len(planted) == 20
    for p in planted:
        src = p - 10_000_000
        # same cluster, original wins the equal-quality tie-break
        assert by_id[p]["cluster_id"] == by_id[src]["cluster_id"]
        assert by_id[p]["survivor_id"] == src
        assert by_id[p]["is_duplicate"] and not by_id[src]["is_duplicate"]
    # unrelated docs never collapse: every non-planted doc is its own
    # survivor
    for i, r in by_id.items():
        if i < 10_000_000 and (i % 10 != 0 or i + 10_000_000 not in by_id):
            assert r["cluster_id"] == i and not r["is_duplicate"], i


def test_corpus_pipeline_near_dup_stage(spark):
    from ps_projekt_pagerank_spark.plans.corpus import corpus_pipeline
    from ps_projekt_pagerank_spark.sources import derived as D

    docs = D.near_dup_documents(spark, "/root/testdata/sf0.001")
    # keep_p 1.0 (scale 1): isolates the near-dup stage from the sampler
    with_nd = corpus_pipeline(docs, near_dup=True, keep_p_scale=1.0)
    ids = {r["doc_id"] for r in with_nd.collect()}
    assert ids, "pipeline must keep the originals"
    assert not {i for i in ids if i >= 10_000_000}, "planted dups survive"
    without = {
        r["doc_id"]
        for r in corpus_pipeline(docs, keep_p_scale=1.0).collect()
    }
    # exact dedup alone cannot remove them (texts differ by one token)
    assert {i for i in without if i >= 10_000_000}
