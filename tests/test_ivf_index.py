"""Persisted IVF index: stored-index serving equals the inline IVF path,
and the candidate scan is partition-pruned to the probed cells."""

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.operators.similarity import (
    build_ivf_index,
    knn_ivf,
    knn_ivf_stored,
)


def _vecs(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_stored_index_matches_inline(spark):
    vecs = _vecs(spark)
    queries = vecs.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    try:
        k_trained = build_ivf_index(vecs, "t_ivf", num_centroids=8)
        assert k_trained == 8
        stored = {
            (r["query_id"], r["knn_rank"]): (r["neighbor_id"], r["score"])
            for r in knn_ivf_stored(
                spark, "t_ivf", queries, 5, nprobe=2
            ).collect()
        }
        inline = {
            (r["query_id"], r["knn_rank"]): (r["neighbor_id"], r["score"])
            for r in knn_ivf(
                vecs, queries, 5, num_centroids=8, nprobe=2
            ).collect()
        }
        assert stored == inline and len(stored) == 20
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf_centroids")
        spark.sql("DROP TABLE IF EXISTS t_ivf_cells")


def test_stored_index_partition_prunes(spark):
    vecs = _vecs(spark)
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    try:
        build_ivf_index(vecs, "t_ivf2", num_centroids=8)
        plan = knn_ivf_stored(
            spark, "t_ivf2", queries, 3, nprobe=1
        )._jdf.queryExecution().executedPlan().toString()
        # the cells scan must carry a partition filter on `cell`
        # (other scans legitimately have empty PartitionFilters)
        import re

        assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf2_centroids")
        spark.sql("DROP TABLE IF EXISTS t_ivf2_cells")
