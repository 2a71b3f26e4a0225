"""R1-R4 reporting queries (reference src/main.cpp:143-242).

- R1 total-rank sum (probability-mass invariant, main.cpp:157-160)
- R2/R3 top-k / bottom-k by rank with in-link counts (main.cpp:228-241) —
  TakeOrderedAndProject, no full sort materialized
- R4 positional order-agreement between two rank vectors
  (main.cpp:16-33) — the reference's cross-backend equivalence metric
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def total_rank(ranks: DataFrame) -> float:
    """R1 — Σ ranks (must be ~1.0)."""
    return float(ranks.agg(F.sum("rank").alias("s")).first()["s"])


def top_bottom_k(ranks: DataFrame, edges: DataFrame, k: int = 10) -> DataFrame:
    """R2+R3 — k highest and k lowest ranked nodes with in-link counts.

    Deterministic: ties broken by id, like a stable re-run of the
    reference's sort (main.cpp:13-14 sorts by rank only; id tiebreak makes
    the distributed result reproducible).
    """
    indeg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("inlinks")
    )
    r = ranks.join(indeg, "id", "left").select(
        "id", F.coalesce("inlinks", F.lit(0)).alias("inlinks"), "rank"
    )
    top = r.orderBy(F.desc("rank"), F.asc("id")).limit(k).withColumn(
        "which", F.lit("top")
    )
    bottom = r.orderBy(F.asc("rank"), F.asc("id")).limit(k).withColumn(
        "which", F.lit("bottom")
    )
    return top.unionAll(bottom)


def order_agreement(ranks_a: DataFrame, ranks_b: DataFrame) -> float:
    """R4 — fraction of positions at which the two rank-descending id
    sequences agree (ties broken by id for determinism). Positions come
    from the distributed numbering in plans.positions — no partitionless
    Window, so the |V|-row rank vectors never funnel through one task."""
    from .positions import global_positions

    a = global_positions(
        ranks_a.select(F.col("id").alias("id_a"), "rank"),
        [F.desc("rank"), F.asc("id_a")],
    ).drop("rank")
    b = global_positions(
        ranks_b.select(F.col("id").alias("id_b"), "rank"),
        [F.desc("rank"), F.asc("id_b")],
    ).drop("rank")
    joined = a.join(b, "pos")
    row = joined.agg(
        F.avg((F.col("id_a") == F.col("id_b")).cast("double")).alias("agree")
    ).first()
    return float(row["agree"] or 0.0)


def degree_distribution(edges: DataFrame) -> DataFrame:
    """(outdeg LONG, n_nodes LONG) — how many nodes have each out-degree,
    including the outdeg=0 sinks (north-rule extension: the first sanity
    report any web-graph pipeline runs — power-law shape check). Two hash
    aggs with map-side combine; output is at most |distinct degrees| rows."""
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
        .join(
            edges.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("outdeg")
            ),
            "id",
            "left",
        )
        .select(F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
    )
    return deg.groupBy("outdeg").agg(F.count("*").alias("n_nodes"))
