"""Co-citation and bibliographic coupling (north-rule link-analysis
extension; Small 1973 / Kessler 1963 — the similarity measures HITS's
authority/hub scores implicitly factorize, here as explicit pair counts).

- co-citation(a, b)      = |{s : s→a and s→b}|  (pages cited together)
- coupling(a, b)         = |{d : a→d and b→d}|  (pages citing the same set)

Both are a self-join of the edge table on the shared endpoint followed by
a pair-count agg — the A·Aᵀ / Aᵀ·A products restricted to nonzero cells.

Scale: a shared endpoint of degree d fans out d·(d-1)/2 pairs, so hub
pages make the naive join quadratic (the same blowup triangle counting
dodges via degree orientation). ``max_fanout`` drops shared endpoints
above a degree cap before pairing — a 10^4-out-degree index page asserts
almost nothing about any single pair it cites, so capping trades a
documented, bounded undercount for a join that stays linear in |E|·cap.
Pair output is halved by requiring a < b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _paired_on(edges: DataFrame, shared: str, paired: str,
               max_fanout: int | None) -> DataFrame:
    e = edges.select(shared, paired).distinct()
    if max_fanout is not None:
        deg = e.groupBy(shared).agg(F.count("*").alias("_d"))
        e = e.join(
            F.broadcast(deg.where(F.col("_d") > max_fanout).select(shared)),
            shared,
            "left_anti",
        )
    a = e.select(F.col(shared).alias("_s"), F.col(paired).alias("a"))
    b = e.select(F.col(shared).alias("_s2"), F.col(paired).alias("b"))
    return (
        a.join(b, (F.col("_s") == F.col("_s2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )


def cocitation_pairs(
    edges: DataFrame, min_count: int = 1, max_fanout: int | None = 256
) -> DataFrame:
    """(a, b, cocitations) — pages co-cited by ≥ ``min_count`` common
    sources; sources with out-degree > ``max_fanout`` are excluded from
    pairing (None = exact, test-scale only)."""
    out = _paired_on(edges, "src", "dst", max_fanout)
    return (
        out.where(F.col("n") >= min_count)
        .select("a", "b", F.col("n").alias("cocitations"))
    )


def neighborhood_jaccard(
    edges: DataFrame, min_common: int = 2, max_fanout: int | None = 256
) -> DataFrame:
    """(a, b, common, jaccard) — "related pages" by in-neighborhood
    overlap (Dean & Henzinger 1999's companion measure): jaccard =
    |I(a) ∩ I(b)| / |I(a) ∪ I(b)|.

    Both numerator (the co-citation count) and the degrees in the
    denominator are computed over the SAME distinct, fanout-capped edge
    set, so the ratio is internally consistent under the cap. Pairing
    cost is bounded exactly like cocitation_pairs; the degree join is a
    |V|-row broadcast-able dimension.
    """
    e = edges.select("src", "dst").distinct()
    if max_fanout is not None:
        deg = e.groupBy("src").agg(F.count("*").alias("_d"))
        e = e.join(
            F.broadcast(deg.where(F.col("_d") > max_fanout).select("src")),
            "src",
            "left_anti",
        )
    a = e.select(F.col("src").alias("_s"), F.col("dst").alias("a"))
    b = e.select(F.col("src").alias("_s2"), F.col("dst").alias("b"))
    pairs = (
        a.join(b, (F.col("_s") == F.col("_s2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= min_common)
    )
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("indeg")
    )
    return (
        pairs.join(indeg.select(F.col("id").alias("a"), F.col("indeg").alias("_da")), "a")
        .join(indeg.select(F.col("id").alias("b"), F.col("indeg").alias("_db")), "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def coupling_pairs(
    edges: DataFrame, min_count: int = 1, max_fanout: int | None = 256
) -> DataFrame:
    """(a, b, couplings) — pages citing ≥ ``min_count`` common targets;
    targets with in-degree > ``max_fanout`` are excluded from pairing."""
    out = _paired_on(edges, "dst", "src", max_fanout)
    return (
        out.where(F.col("n") >= min_count)
        .select("a", "b", F.col("n").alias("couplings"))
    )
