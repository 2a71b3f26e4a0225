"""Configuration-model rewiring — the degree-preserving null graph.

Motif statistics (triangle counts, reciprocity, assortativity) only mean
something against a null model with the SAME degree sequence: the
configuration model cuts every edge into a src-stub and a dst-stub and
re-pairs the two stub multisets at random (Newman, SIAM Review 2003).
Each node keeps its exact out-degree (it still owns its src-stubs) and
exact in-degree (its dst-stubs), while the src→dst pairing is destroyed
— self-loops and multi-edges may appear, as the model prescribes.

The reference repo has no null-model counterpart (it ranks one fixed
graph); this is a north-rule-era addition in the same spirit as the
R-MAT generator (sources/rmat.py).

Determinism instead of RNG (the repo-wide contract): each stub gets an
md5 priority keyed by its (side, src, dst, occurrence) identity, both
stub sets are numbered by the DISTRIBUTED global ordering on that
priority (plans.positions — no partitionless window), and stub i of one
set pairs with stub i of the other. Any engine that can sort md5 hex
strings reproduces the identical rewired edge list — md5-as-uniform is
the same trick the samplers use.

Scale: two |E|-row global numberings (range-partitioned sort) + one
equi-join on position. No collect, no window without partition, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.plans.positions import global_positions


def _stubs(edges: DataFrame, side: str) -> DataFrame:
    """One row per edge occurrence: the kept endpoint + its md5 priority.

    ``occ`` numbers duplicate (src,dst) edges 1..n — rows within a
    (src,dst) group are indistinguishable, so the unordered row_number
    still yields a deterministic (endpoint, priority) MULTISET.
    """
    occ = F.row_number().over(
        Window.partitionBy("src", "dst").orderBy(F.lit(1))
    )
    keep = "src" if side == "s" else "dst"
    key = F.md5(
        F.concat_ws(
            "#",
            F.lit(side),
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            occ.cast("string"),
        ).cast("binary")
    )
    return edges.select(F.col(keep).alias(keep), key.alias("k"))


def rewire_configuration(edges: DataFrame) -> DataFrame:
    """(src, dst) — the configuration-model rewiring of ``edges``:
    identical out-degree and in-degree per node, md5-shuffled pairing."""
    srcs = global_positions(
        _stubs(edges, "s"), [F.asc("k"), F.asc("src")], pos_col="pos"
    ).select("src", "pos")
    dsts = global_positions(
        _stubs(edges, "d"), [F.asc("k"), F.asc("dst")], pos_col="pos"
    ).select("dst", "pos")
    return srcs.join(dsts, "pos").select("src", "dst")


def rewire_configuration_sql(edges_sql: str) -> str:
    """ANSI twin: same stub keys, row_number orderings, position join."""

    def stub(side: str, keep: str) -> str:
        return (
            f"SELECT {keep}, md5('{side}' || '#' || CAST(src AS VARCHAR) "
            "|| '#' || CAST(dst AS VARCHAR) || '#' || CAST(occ AS VARCHAR))"
            " AS k FROM ("
            "SELECT src, dst, row_number() OVER "
            "(PARTITION BY src, dst) AS occ FROM e)"
        )

    return (
        f"WITH e AS ({edges_sql}), "
        f"ss AS (SELECT src, row_number() OVER (ORDER BY k, src) AS pos "
        f"FROM ({stub('s', 'src')})), "
        f"ds AS (SELECT dst, row_number() OVER (ORDER BY k, dst) AS pos "
        f"FROM ({stub('d', 'dst')})) "
        "SELECT ss.src, ds.dst FROM ss JOIN ds ON ss.pos = ds.pos"
    )


def motif_significance(edges: DataFrame) -> DataFrame:
    """One row (observed_triangles, null_triangles, excess_ratio) —
    triangle count on the real graph vs its configuration-model null;
    excess_ratio > 1 means more closure than the degree sequence alone
    explains (the classic small-world / community signal)."""
    from ps_projekt_pagerank_spark.operators.triangles import (
        triangles_total,
    )

    obs = triangles_total(edges).select(
        F.col("triangles").alias("observed_triangles")
    )
    nul = triangles_total(rewire_configuration(edges)).select(
        F.col("triangles").alias("null_triangles")
    )
    row = obs.crossJoin(nul)
    return row.select(
        "observed_triangles",
        "null_triangles",
        F.when(
            F.col("null_triangles") > 0,
            F.round(
                F.col("observed_triangles").cast("double")
                / F.col("null_triangles").cast("double"),
                6,
            ),
        ).alias("excess_ratio"),
    )
