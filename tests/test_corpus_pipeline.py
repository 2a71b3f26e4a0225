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
