"""S3 — deterministic graph tripler (reference prepleti.cpp:44-74).

From edge set E with max id M emit E ∪ {(M+dst+1, src)} ∪
{(M+src+1, M+dst)}. A pure DataFrame transform (two projections + unionAll
— no shuffle at all); applied k times it scales any fixture graph 3^k× for
benchmarking, exactly like the reference's synthetic scale-up generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tripled(edges: DataFrame, max_id: int | None = None) -> DataFrame:
    if max_id is None:
        row = edges.agg(
            F.greatest(F.max("src"), F.max("dst")).alias("m")
        ).first()
        max_id = int(row["m"])
    m = F.lit(max_id)
    a = edges.select("src", "dst")
    b = edges.select((m + F.col("dst") + 1).alias("src"), F.col("src").alias("dst"))
    c = edges.select(
        (m + F.col("src") + 1).alias("src"), (m + F.col("dst")).alias("dst")
    )
    return a.unionAll(b).unionAll(c)


def tripled_k(edges: DataFrame, k: int, max_id: int | None = None) -> DataFrame:
    """k applications; ids stay in [0, (max_id+1)*2^k) so max_id of each
    round is derivable without an action when the first max_id is given."""
    for _ in range(k):
        edges = tripled(edges, max_id)
        if max_id is not None:
            max_id = 2 * max_id + 1
    return edges
