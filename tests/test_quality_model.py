"""Hashed linear quality scorer vs a literal Python replay + twin parity."""

from __future__ import annotations

import hashlib

import duckdb

from ps_projekt_pagerank_spark.functions.quality_model import (
    hashed_linear_score,
    hashed_linear_score_sql,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spam spam spam buy now cheap pills spam"),
    (3, ""),
    (4, "   "),
    (5, "MIXED Case Tokens mixed case tokens"),
]


def _py_score(text, dim=1024):
    toks = [t for t in text.lower().split(" ") if t]
    if not toks:
        return 0, 0, 0.0, 0.5, False
    ws = 0
    for t in toks:
        f = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
        w = int(hashlib.md5(f"w#{f}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        ws += w
    score = ws / (1000.0 * len(toks))
    prob = 0.5 + score / (2.0 * (1.0 + abs(score)))
    return len(toks), ws, score, prob, prob > 0.5


def test_hashed_linear_score_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["weight_sum"], r["score"], r["prob"], r["keep"]
        )
        for r in hashed_linear_score(df).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_score(text), doc_id
    # empty / whitespace-only docs: neutral 0.5, dropped by strict >
    assert got[3] == (0, 0, 0.0, 0.5, False)
    assert got[4] == (0, 0, 0.0, 0.5, False)
    # case-folding: "MIXED Case Tokens" == its lowercase twin per token
    assert got[5][1] % 2 == 0  # every token weight counted twice


def test_hashed_linear_score_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = sorted(tuple(r) for r in hashed_linear_score(df).collect())
    vlist = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in DOCS
    )
    sql = hashed_linear_score_sql(
        f"SELECT * FROM (VALUES {vlist}) AS t(doc_id, text)"
    )
    oracle = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == oracle
