"""Whole-document BM25 retrieval (functions/search.py)."""

import pytest

from ps_projekt_pagerank_spark.functions.search import (
    doc_bm25_search,
    doc_postings,
)

DOCS = [
    (1, "apple banana apple zz"),
    (2, "apple cherry zz"),
    (3, "banana banana banana banana zz"),
    (4, "cherry date egg fig grape hat ice jam kiwi lime"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_postings(docs):
    p = {
        (r["term"], r["doc_id"]): (r["tf"], r["df_term"])
        for r in doc_postings(docs).collect()
    }
    assert p[("apple", 1)] == (2, 2)
    assert p[("apple", 2)] == (1, 2)
    assert p[("banana", 3)] == (4, 2)


def test_tf_and_idf_ordering(docs):
    rows = doc_bm25_search(docs, ["apple"], k=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]  # tf 2 beats tf 1
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0
    assert all(r["n_terms_hit"] == 1 for r in rows)


def test_common_term_idf_zero(docs):
    # 'zz' is in 3 of 4 docs -> floor(log2(4/3)) = 0 -> score 0, ties by id
    rows = doc_bm25_search(docs, ["zz"], k=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert all(r["bm25"] == 0.0 for r in rows)


def test_k_and_empty_query(docs):
    assert len(doc_bm25_search(docs, ["apple", "banana"], k=1).collect()) == 1
    with pytest.raises(ValueError):
        doc_bm25_search(docs, [])
