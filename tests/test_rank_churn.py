"""Rank-churn report (plans/reporting.py::rank_churn)."""

from ps_projekt_pagerank_spark.plans.reporting import rank_churn


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, rank DOUBLE")


def test_churn_counters_and_perfect_rho(spark):
    old = _df(spark, [(1, 0.5), (2, 0.3), (3, 0.2)])
    new = _df(spark, [(1, 0.45), (2, 0.35), (4, 0.2)])
    r = rank_churn(old, new, k=2).collect()[0]
    assert r["n_common"] == 2
    assert r["n_new"] == 1  # id 4 appeared
    assert r["n_dropped"] == 1  # id 3 vanished
    assert r["spearman_rho"] == 1.0  # common ordering unchanged
    assert r["topk_overlap"] == 1.0
    assert abs(r["max_abs_delta"] - 0.05) < 1e-9


def test_full_inversion_rho_minus_one(spark):
    old = _df(spark, [(1, 0.6), (2, 0.4)])
    new = _df(spark, [(1, 0.4), (2, 0.6)])
    r = rank_churn(old, new, k=1).collect()[0]
    assert r["spearman_rho"] == -1.0
    assert r["topk_overlap"] == 0.0  # top-1 flipped from id 1 to id 2


def test_single_common_id_rho_null(spark):
    old = _df(spark, [(1, 1.0), (2, 0.5)])
    new = _df(spark, [(1, 1.0), (3, 0.5)])
    r = rank_churn(old, new, k=1).collect()[0]
    assert r["n_common"] == 1
    assert r["spearman_rho"] is None  # undefined at n=1, never NaN
