"""Bloom membership filter and Count-Min frequency sketch semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions.bloom import (
    bloom_build,
    bloom_probe,
    bloom_seen_sql,
)
from ps_projekt_pagerank_spark.functions.cms import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters_sql,
)


def test_bloom_no_false_negatives_and_some_discrimination(spark):
    seen = spark.range(100).select(F.col("id"))
    cand = spark.range(300).select(F.col("id"))
    # small m forces false positives; false NEGATIVES must never happen
    bloom = bloom_build(seen, "id", m_bits=256, num_hashes=3)
    out = {
        r["id"]: r["maybe_present"]
        for r in bloom_probe(bloom, cand, "id", m_bits=256, num_hashes=3).collect()
    }
    assert len(out) == 300
    assert all(out[i] for i in range(100)), "false negative"
    unseen_hits = sum(out[i] for i in range(100, 300))
    assert 0 < unseen_hits < 200, "filter should discriminate but collide some"


def test_bloom_wide_filter_is_nearly_exact(spark):
    seen = spark.range(50)
    cand = spark.range(200)
    bloom = bloom_build(seen, "id", m_bits=1 << 16, num_hashes=5)
    out = {
        r["id"]: r["maybe_present"]
        for r in bloom_probe(
            bloom, cand, "id", m_bits=1 << 16, num_hashes=5
        ).collect()
    }
    assert all(out[i] for i in range(50))
    assert sum(out[i] for i in range(50, 200)) == 0


def test_bloom_rejects_nonpositive_m():
    with pytest.raises(ValueError):
        bloom_build(None, "id", m_bits=0)


def test_bloom_matches_duckdb_twin(spark):
    seen = spark.range(0, 400, 3).select("id")  # every 3rd id
    cand = spark.range(400).select("id")
    bloom = bloom_build(seen, "id", m_bits=512, num_hashes=3)
    got = sorted(
        (r["id"], r["maybe_present"])
        for r in bloom_probe(bloom, cand, "id", m_bits=512, num_hashes=3).collect()
    )
    exp = sorted(
        duckdb.sql(
            bloom_seen_sql(
                "SELECT unnest(range(0, 400, 3)) AS id",
                "SELECT unnest(range(0, 400)) AS id",
                m_bits=512,
                num_hashes=3,
            )
        ).fetchall()
    )
    assert got == exp


def _token_rows():
    # skewed corpus: token t{i} appears (20 - i) times
    rows = []
    for i in range(20):
        rows.extend([(f"t{i:02d}",)] * (20 - i))
    return rows


def test_cms_never_undercounts_and_wide_grid_exact(spark):
    vals = spark.createDataFrame(_token_rows(), "v STRING")
    exact = {r["v"]: r["cnt"] for r in vals.groupBy("v").agg(
        F.count("*").alias("cnt")).collect()}
    for width, check in ((16, "ge"), (4096, "eq")):
        grid = cms_build(vals, "v", depth=3, width=width)
        est = {
            r["v"]: r["est"]
            for r in cms_estimate(grid, vals, "v", depth=3, width=width).collect()
        }
        for v, c in exact.items():
            if check == "eq":
                assert est[v] == c, (width, v)
            else:
                assert est[v] >= c, (width, v)


def test_cms_unseen_key_estimate_bounded(spark):
    vals = spark.createDataFrame(_token_rows(), "v STRING")
    grid = cms_build(vals, "v", depth=3, width=4096)
    est = cms_estimate(
        grid, spark.createDataFrame([("zzz",)], "v STRING"), "v",
        depth=3, width=4096,
    ).collect()
    assert est[0]["est"] == 0  # wide grid: no collision mass


def test_cms_matches_duckdb_twin(spark):
    vals = spark.createDataFrame(_token_rows(), "v STRING")
    grid = cms_build(vals, "v", depth=3, width=64)
    exact = vals.groupBy("v").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "v").limit(10)
    got = sorted(
        (r["v"], r["exact_cnt"], r["cms_est"])
        for r in top.join(
            cms_estimate(grid, top, "v", depth=3, width=64)
            .withColumnRenamed("est", "cms_est"),
            "v",
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE vals (v VARCHAR)")
    con.executemany("INSERT INTO vals VALUES (?)", _token_rows())
    exp = sorted(
        con.sql(
            cms_heavy_hitters_sql(
                "SELECT v FROM vals", top_k=10, depth=3, width=64
            )
        ).fetchall()
    )
    assert got == exp
