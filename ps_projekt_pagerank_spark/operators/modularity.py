"""Directed modularity of a community assignment (north-rule extension;
no reference counterpart — the reference stops at rank vectors).

Newman/Leicht-Newman directed modularity over the edge multiset:

    Q = intra/m - (sum_c out_c * in_c) / m^2

where m = |E| (multigraph count, self-loops included), intra = edges whose
endpoints share a community, out_c / in_c = summed multigraph out-/in-degree
of community c. This is the objective LP/CC community assignments are
usually judged by, so it belongs next to them as a report.

Determinism contract (the reason for this formulation): all three moments
(m, intra, S = sum_c out_c*in_c) are EXACT BIGINT aggregates — order
independent, bit-identical on any engine — and the closing expression is
two IEEE divisions and one subtraction, so the double matches DuckDB with
no rounding tricks. Bound: S fits int64 until sum of out_c*in_c crosses
2^63 (a single community holding ~3e9 in- and out-edges); past that switch
the moment to DOUBLE and accept last-ulp nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """One row (n_edges, intra_edges, degree_product_sum, modularity).

    ``labels`` must cover every node appearing in ``edges`` (inner joins —
    an unlabeled endpoint would silently drop its edges; CC/LP outputs
    cover all nodes by construction).

    Scale: two |V|-row label-broadcast joins onto the |E|-row edge table
    (left to AQE — |V| can exceed broadcast size on a real crawl, and both
    joins reuse one shuffle partitioning of ``labels``), then one |E|-row
    single-pass agg for (m, intra), two |E|→|C| degree aggs, a |C|-row
    equi-join for the degree products, and single-row cross joins to close.
    The |E| data moves three times total; nothing is quadratic in |C|.
    """
    lab = labels.select("id", F.col(label_col).alias("_mlab"))
    e = (
        edges.select("src", "dst")
        .join(lab.select(F.col("id").alias("src"), F.col("_mlab").alias("src_lab")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("_mlab").alias("dst_lab")), "dst")
    )
    base = e.agg(
        F.count("*").alias("n_edges"),
        F.sum(
            (F.col("src_lab") == F.col("dst_lab")).cast("long")
        ).alias("intra_edges"),
    )
    out_c = e.groupBy(F.col("src_lab").alias("_c")).agg(
        F.count("*").alias("out_c")
    )
    in_c = e.groupBy(F.col("dst_lab").alias("_c")).agg(
        F.count("*").alias("in_c")
    )
    # inner join: a community with zero out- or in-edges contributes 0
    s = out_c.join(in_c, "_c").agg(
        F.sum(F.col("out_c") * F.col("in_c")).alias("degree_product_sum")
    )
    m = F.col("n_edges").cast("double")
    return base.crossJoin(s).select(
        "n_edges",
        "intra_edges",
        "degree_product_sum",
        F.when(
            F.col("n_edges") > 0,
            F.col("intra_edges").cast("double") / m
            - F.col("degree_product_sum").cast("double") / m / m,
        ).alias("modularity"),
    )


def modularity_sql(edges_sql: str, labels_sql: str) -> str:
    """DuckDB twin — identical BIGINT moments, identical IEEE closing
    expression (CAST the CASE sum to BIGINT: DuckDB sum(int) is HUGEINT,
    which would hash-mismatch Spark's LONG)."""
    return (
        f"WITH me AS (SELECT src, dst FROM ({edges_sql})), "
        f"ml AS (SELECT id, label AS _mlab FROM ({labels_sql})), "
        "j AS (SELECT l1._mlab AS src_lab, l2._mlab AS dst_lab "
        "FROM me JOIN ml l1 ON me.src = l1.id JOIN ml l2 ON me.dst = l2.id), "
        "base AS (SELECT count(*) AS n_edges, "
        "CAST(sum(CASE WHEN src_lab = dst_lab THEN 1 ELSE 0 END) AS BIGINT) "
        "AS intra_edges FROM j), "
        "oc AS (SELECT src_lab AS _c, count(*) AS out_c FROM j GROUP BY src_lab), "
        "ic AS (SELECT dst_lab AS _c, count(*) AS in_c FROM j GROUP BY dst_lab), "
        "s AS (SELECT CAST(sum(out_c * in_c) AS BIGINT) AS degree_product_sum "
        "FROM oc JOIN ic ON oc._c = ic._c) "
        "SELECT n_edges, intra_edges, degree_product_sum, "
        "CASE WHEN n_edges > 0 THEN "
        "CAST(intra_edges AS DOUBLE) / CAST(n_edges AS DOUBLE) "
        "- CAST(degree_product_sum AS DOUBLE) / CAST(n_edges AS DOUBLE) "
        "/ CAST(n_edges AS DOUBLE) END AS modularity "
        "FROM base CROSS JOIN s"
    )
