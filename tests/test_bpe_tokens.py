"""BPE-ish pretokenizer count semantics."""

import duckdb

from ps_projekt_pagerank_spark.functions.text import (
    bpe_ish_token_stats,
    bpe_ish_token_stats_sql,
)

ROWS = [
    (0, "don't stop-me now!! 123abc"),  # 4 words, 11 bpe pieces
    (1, "plain words only here"),  # 4 == 4
    (2, ""),  # no words -> NULL fertility
    (3, "a1b2"),  # 1 word, 4 pieces
]


def test_bpe_counts_and_fertility(spark):
    docs = spark.createDataFrame(ROWS, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in bpe_ish_token_stats(docs).collect()}
    assert (out[0]["ws_tokens"], out[0]["bpe_tokens"]) == (4, 11)
    assert (out[1]["ws_tokens"], out[1]["bpe_tokens"]) == (4, 4)
    assert out[1]["fertility"] == 1.0
    assert out[2]["ws_tokens"] == 0 and out[2]["fertility"] is None
    assert (out[3]["ws_tokens"], out[3]["bpe_tokens"]) == (1, 4)
    assert out[3]["fertility"] == 4.0


def test_bpe_matches_duckdb_twin(spark):
    docs = spark.createDataFrame(ROWS, "doc_id LONG, text STRING")
    got = sorted(tuple(r) for r in bpe_ish_token_stats(docs).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", ROWS)
    exp = sorted(
        tuple(r)
        for r in con.sql(
            bpe_ish_token_stats_sql("SELECT doc_id, text FROM d")
        ).fetchall()
    )
    assert got == exp
