"""Corpus diversity / concentration — per language (or any stratum), how
concentrated the corpus is over its sources: a training mix dominated by
one crawler or one domain overfits to it, and the mix designer wants the
EFFECTIVE number of sources, not the raw distinct count.

Measures (all from exact integer moments, so both engines agree bit-for-
bit before the single IEEE division at the end — the same reason text.py
uses integer log2 for PMI):

- inverse Simpson index  n_docs² / Σ_u c_u²  — the "effective number of
  sources": m for a uniform mix over m sources, →1 as one source takes
  over;
- Gini coefficient over per-source doc counts via the rank formula
  G = (2 Σ i·c_(i)) / (m Σ c) − (m+1)/m with c_(i) ascending — ties
  share equal counts so rank order among them cannot change the sum.

Scale: one hash agg to per-(group, unit) counts, a group-partitioned
window for the ascending ranks (bounded by the per-group source count,
never a global sort), one agg per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_diversity(
    docs: DataFrame,
    group_col: str = "lang",
    unit_col: str = "source",
) -> DataFrame:
    """(group, n_docs, n_units, inv_simpson, gini) — per-``group_col``
    concentration of documents over ``unit_col`` values."""
    counts = docs.groupBy(
        F.col(group_col).alias("grp"), F.col(unit_col).alias("unit")
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("grp").orderBy(F.col("c").asc(), F.col("unit").asc())
    ranked = counts.withColumn("i", F.row_number().over(w).cast("long"))
    agg = ranked.groupBy("grp").agg(
        F.sum("c").alias("n_docs"),
        F.count("*").alias("n_units"),
        F.sum(F.col("c") * F.col("c")).alias("_sum_c2"),
        F.sum(F.col("i") * F.col("c")).alias("_sum_ic"),
    )
    m = F.col("n_units").cast("double")
    return agg.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_units",
        F.round(
            (F.col("n_docs") * F.col("n_docs")).cast("double")
            / F.col("_sum_c2"),
            6,
        ).alias("inv_simpson"),
        F.round(
            (2.0 * F.col("_sum_ic"))
            / (m * F.col("n_docs").cast("double"))
            - (m + 1.0) / m,
            6,
        ).alias("gini"),
    )


def corpus_diversity_sql(
    docs_sql: str, group_col: str = "lang", unit_col: str = "source"
) -> str:
    """DuckDB twin — identical integer moments, rank window with the same
    (count, unit) tie-break, same final IEEE expressions."""
    return (
        f"WITH counts AS (SELECT {group_col} AS grp, {unit_col} AS unit, "
        f"count(*) AS c FROM ({docs_sql}) GROUP BY 1, 2), "
        "ranked AS (SELECT grp, c, CAST(row_number() OVER ("
        "PARTITION BY grp ORDER BY c ASC, unit ASC) AS BIGINT) AS i "
        "FROM counts), "
        "agg AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_units, "
        "CAST(sum(c * c) AS BIGINT) AS sum_c2, "
        "CAST(sum(i * c) AS BIGINT) AS sum_ic FROM ranked GROUP BY grp) "
        f"SELECT grp AS {group_col}, n_docs, n_units, "
        "round(CAST(n_docs * n_docs AS DOUBLE) / sum_c2, 6) AS inv_simpson, "
        "round((2.0 * sum_ic) / (CAST(n_units AS DOUBLE) * n_docs) "
        "- (n_units + 1.0) / n_units, 6) AS gini FROM agg"
    )
