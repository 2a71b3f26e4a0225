"""TextRank keyword extraction semantics."""

import duckdb
import pytest

from ps_projekt_pagerank_spark.operators.textrank import (
    NANO,
    textrank_keywords,
    textrank_keywords_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_textrank_hub_word_wins(spark):
    # "graph" co-occurs with everything; peripheral words with one thing
    docs = _docs(
        spark,
        [(0, "graph rank graph walk graph node graph edge graph cut")],
    )
    out = textrank_keywords(docs, top_k=3).collect()
    assert [r["keyword"] for r in sorted(out, key=lambda r: r["kw_rank"])][0] == "graph"
    assert {r["kw_rank"] for r in out} == {1, 2, 3}


def test_textrank_rank_mass_and_edge_docs(spark):
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma alpha delta"),
            (1, "solo"),  # single token: no edges, no keywords
            (2, ""),  # empty
            (3, "same same same"),  # only self-pairs: dropped
        ],
    )
    rows = textrank_keywords(docs, top_k=100).collect()
    assert {r["doc_id"] for r in rows} == {0}
    total = sum(r["rank_nano"] for r in rows)
    # teleport+damping floors lose < 1e-9/term; mass stays ~1.0
    assert 0.9 * NANO <= total <= NANO


def test_textrank_matches_duckdb_twin(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog the fox"),
        (1, "pagerank is a link analysis rank of a web graph rank"),
        (2, "a b c a b c a d"),
        (3, "x"),
    ]
    got = sorted(
        tuple(r) for r in textrank_keywords(_docs(spark, rows), top_k=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    exp = sorted(
        tuple(r)
        for r in con.sql(
            textrank_keywords_sql("SELECT doc_id, text FROM d", top_k=3)
        ).fetchall()
    )
    assert got == exp


def test_textrank_validates_params(spark):
    with pytest.raises(ValueError):
        textrank_keywords(None, iterations=0)
    with pytest.raises(ValueError):
        textrank_keywords(None, d_num=100, d_den=100)
