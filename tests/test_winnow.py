"""Winnowing fingerprint semantics (Schleimer et al. 2003)."""

import duckdb
import pytest

from ps_projekt_pagerank_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
    winnow_pairs_sql,
)

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1, "xx the quick brown fox jumps over the lazy dog zz other tail"),
    (2, "completely different content with no overlap whatsoever here"),
    (3, "short"),  # < k+w-1 chars of any shared run
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id LONG, text STRING")


def test_winnow_shared_passage_guarantee(spark):
    # docs 0/1 share a passage far longer than w+k-1=8 chars: the
    # winnowing guarantee says they MUST share fingerprints; doc 2
    # shares none; doc 3 is too short to emit any
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnow_pairs(_docs(spark), min_shared=1).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 5
    assert all(a == 0 and b == 1 for a, b in pairs)
    fps = winnow_fingerprints(_docs(spark)).collect()
    assert not [r for r in fps if r["doc_id"] == 3]


def test_winnow_density(spark):
    # kept fingerprints per doc ~ 2/(w+1) of the k-gram count — assert
    # the coarse bounds (distinct-ness only lowers it)
    doc = _docs(spark).where("doc_id = 0")
    n_kgrams = len(ROWS[0][1]) - 5 + 1
    n_fps = winnow_fingerprints(doc, k=5, w=4).count()
    assert n_fps <= n_kgrams - 4 + 1
    assert n_fps >= (n_kgrams - 4 + 1) // 4  # >= one per disjoint window


def test_winnow_matches_duckdb_twin(spark):
    got = sorted(
        tuple(r) for r in winnow_pairs(_docs(spark), min_shared=1).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", ROWS)
    exp = sorted(
        tuple(r)
        for r in con.sql(
            winnow_pairs_sql("SELECT doc_id, text FROM d", min_shared=1)
        ).fetchall()
    )
    assert got == exp


def test_winnow_validates_params(spark):
    with pytest.raises(ValueError):
        winnow_fingerprints(None, k=0)
