"""dsir_weights: target-domain importance weighting semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.text import (
    dsir_weights,
    dsir_weights_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(6):  # target-domain docs: medical-ish vocabulary
        rows.append((i, f"dose trial patient dose outcome {i % 2} trial"))
    for i in range(6, 12):  # off-domain docs
        rows.append((i, f"goal match striker goal referee {i % 2} match"))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING"), rows


def test_dsir_prefers_target_domain(spark, corpus):
    docs, _ = corpus
    target = docs.where(F.col("doc_id") < 3).select("doc_id", "text")
    out = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
    assert len(out) == 12
    med = [out[i]["bits_per_feat"] for i in range(6)]
    sport = [out[i]["bits_per_feat"] for i in range(6, 12)]
    assert min(med) > max(sport), (med, sport)
    # unigrams + bigrams of a 7-token doc = 13 features
    assert all(out[i]["n_feats"] == 13 for i in range(12))


def test_dsir_matches_duckdb_twin(spark, corpus):
    docs, rows = corpus
    target = docs.where(F.col("doc_id") < 3).select("doc_id", "text")
    got = sorted(
        (r["doc_id"], r["n_feats"], r["dsir_bits"], round(r["bits_per_feat"], 9))
        for r in dsir_weights(docs, target).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    exp = sorted(
        (r[0], r[1], r[2], round(r[3], 9))
        for r in con.sql(
            dsir_weights_sql(
                "SELECT doc_id, text FROM d",
                "SELECT doc_id, text FROM d WHERE doc_id < 3",
            )
        ).fetchall()
    )
    assert got == exp


def test_dsir_empty_doc_zero_feats(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "")], "doc_id LONG, text STRING"
    )
    target = docs.where(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
    assert out[1]["n_feats"] == 0
    assert out[1]["dsir_bits"] == 0
    assert out[1]["bits_per_feat"] is None
