"""Gopher-style repeated-n-gram stats and the composed quality filter:
pure-Python replication + DuckDB-twin parity."""

from __future__ import annotations

import duckdb

from ps_projekt_pagerank_spark.functions.text import (
    quality_filter,
    repeated_ngram_sql,
    repeated_ngram_stats,
)

DOCS = [
    (1, "a b a b c"),              # 2-grams: ab ba ab bc -> dup 1/4
    (2, ""),                       # empty -> all zeros
    (3, "x y"),                    # too short for 3-grams
    (4, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (5, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),  # clean, length 12
    (6, "  double  spaced  tokens  "),  # empty tokens filtered
]


def _py_ngram_stats(text, n):
    toks = [t for t in text.split(" ") if t]
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    total = len(grams)
    dup = round((total - len(set(grams))) / total, 6) if total else 0.0
    return len(toks), total, dup


def test_repeated_ngram_stats_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r.asDict() for r in repeated_ngram_stats(df).collect()}
    for doc_id, text in DOCS:
        n_tok, t2, d2 = _py_ngram_stats(text, 2)
        _, t3, d3 = _py_ngram_stats(text, 3)
        r = got[doc_id]
        assert (
            r["n_tokens"], r["total_2gr"], r["dup_ratio_2gr"],
            r["total_3gr"], r["dup_ratio_3gr"],
        ) == (n_tok, t2, d2, t3, d3), doc_id


def test_quality_filter_rule(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    keep = {r["doc_id"]: r["keep"] for r in quality_filter(df).collect()}
    # 1-3: too short; 4: 12 tokens but dup_ratio_2gr = 1.0 > 0.6; 5: clean
    assert keep == {1: False, 2: False, 3: False, 4: False, 5: True, 6: False}


def test_repeated_ngram_sql_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    spark_rows = {
        tuple(r) for r in repeated_ngram_stats(df).collect()
    }
    values = ", ".join(
        "(%d, '%s')" % (i, t.replace("'", "''")) for i, t in DOCS
    )
    oracle = {
        tuple(r)
        for r in duckdb.connect()
        .execute(
            repeated_ngram_sql(
                f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)"
            )
        )
        .fetchall()
    }
    assert spark_rows == oracle
