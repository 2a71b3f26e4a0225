"""Embedding-column transforms for the training-data pipeline (north-rule
extension; the reference has no vector columns).

Int8 symmetric quantization — the standard 4x memory/IO reduction applied
to embedding tables before ANN indexing at corpus scale (a 100 TB float32
embedding column becomes 25 TB int8 + one float scale per vector, and the
IVF/LSH bucket joins in ``operators/similarity.py`` read a quarter of the
bytes). Everything here is exact cross-engine: the scale is a max (order
independent), and q = floor(v/scale*127 + 0.5) is a fixed chain of
correctly-rounded IEEE ops, so the DuckDB twin hash-matches with no
rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, dim INT, q INT, scale DOUBLE) — symmetric per-vector int8
    quantization, exploded one row per dimension: scale = max |v_i|,
    q_i = floor(v_i/scale*127 + 0.5) in [-127, 127] (an all-zero vector
    quantizes to all-zero q with scale 0). Reconstruct with q*scale/127.

    Scale: one explode (|vectors|*dim rows, narrow), one map-side-
    combinable max agg back to |vectors| rows, one equi-join on the
    vector id; no windows, no Python.
    """
    ex = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("dim", "v"),
    ).select("vec_id", "dim", F.col("v").cast("double").alias("v"))
    sc = ex.groupBy("vec_id").agg(F.max(F.abs("v")).alias("scale"))
    return ex.join(sc, "vec_id").select(
        "vec_id",
        "dim",
        F.when(
            F.col("scale") > 0,
            F.floor(F.col("v") / F.col("scale") * 127.0 + 0.5).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("q"),
        "scale",
    )


def quantize_embeddings_sql(embeddings_sql: str) -> str:
    """DuckDB twin — identical explode/max/floor chain (unnest(range())
    carries the list; CAST the FLOAT element to DOUBLE before any
    arithmetic, exactly like the Spark side)."""
    return (
        "WITH ex0 AS (SELECT vec_id, "
        "unnest(range(0, len(embedding))) AS dim, embedding AS emb "
        f"FROM ({embeddings_sql})), "
        "ex AS (SELECT vec_id, CAST(dim AS INT) AS dim, "
        "CAST(emb[CAST(dim AS INT) + 1] AS DOUBLE) AS v FROM ex0), "
        "sc AS (SELECT vec_id, max(abs(v)) AS scale FROM ex GROUP BY vec_id) "
        "SELECT ex.vec_id, ex.dim, "
        "CASE WHEN scale > 0 THEN CAST(floor(v / scale * 127.0 + 0.5) AS INT) "
        "ELSE 0 END AS q, scale "
        "FROM ex JOIN sc ON ex.vec_id = sc.vec_id"
    )
