"""Weisfeiler-Lehman color refinement — structural node signatures
(north-rule extension; no reference counterpart).

WL refinement assigns every node a color that encodes its k-hop
structural role: round 0 colors by (out-degree, in-degree); each round
re-colors as the hash of (own color, sorted multiset of out-neighbor
colors, sorted multiset of in-neighbor colors). Two nodes share a round-k
color iff their k-hop neighborhoods are indistinguishable to the 1-WL
test — the standard structural-role / graph-fingerprint primitive
(template pages, boilerplate navigation hubs, and mirror sites land in
the same color class; the color histogram is a cheap whole-graph
fingerprint for change detection between crawls).

Engine-exact by construction: colors are md5 hex strings, the neighbor
multiset is canonicalized by SORTING (Spark ``array_sort(collect_list)``,
DuckDB ``string_agg(... ORDER BY ...)``) so aggregation order never
matters, and the hash input grammar uses distinct separators so no two
different multisets collide on concatenation.

Scale: each round is two edge-side aggregations (out / in neighbor color
lists — the PageRank gather shape with list-collect for +) and a |V|-row
join; the collected lists are degree-sized, so the same skew guards that
bound the gather bound this (cap hub degrees upstream if a 10^7-degree
hub's sorted list is too wide — WL colors of such hubs saturate anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def wl_colors(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """(id LONG, wl_color STRING) — md5 color after ``rounds`` WL
    refinements (round 0 = hash of "outdeg#indeg")."""
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    od = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("od"))
    idg = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("idn"))
    colors = (
        nodes.join(od, "id", "left")
        .join(idg, "id", "left")
        .select(
            "id",
            F.md5(
                F.concat_ws(
                    "#",
                    F.coalesce("od", F.lit(0)).cast("string"),
                    F.coalesce("idn", F.lit(0)).cast("string"),
                ).cast("binary")
            ).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        outn = (
            e.join(colors.select(F.col("id").alias("dst"), "c"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.concat_ws(
                    ",", F.array_sort(F.collect_list("c"))
                ).alias("oc")
            )
        )
        inn = (
            e.join(colors.select(F.col("id").alias("src"), "c"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.concat_ws(
                    ",", F.array_sort(F.collect_list("c"))
                ).alias("ic")
            )
        )
        colors = (
            colors.join(outn, "id", "left")
            .join(inn, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("c"),
                        F.coalesce("oc", F.lit("")),
                        F.coalesce("ic", F.lit("")),
                    ).cast("binary")
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist(blocking=False)
    return colors.select("id", F.col("c").alias("wl_color"))


def wl_color_histogram(colors: DataFrame) -> DataFrame:
    """(wl_color STRING, n_nodes BIGINT) — the whole-graph structural
    fingerprint: how many nodes inhabit each structural role. Compare
    two crawls' histograms to detect template/topology drift without
    aligning node ids."""
    return colors.groupBy("wl_color").agg(F.count("*").alias("n_nodes"))


def wl_colors_sql(edges_sql: str, rounds: int = 2) -> str:
    """DuckDB twin — identical init hash, sorted-multiset string_agg, and
    separator grammar, unrolled ``rounds`` times (MATERIALIZED: each
    round references the previous colors three times)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        f"({edges_sql}) WHERE src <> dst)",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))",
        "dg AS MATERIALIZED (SELECT n.id, "
        "coalesce(o.od, 0) AS od, coalesce(i.idn, 0) AS idn FROM nodes n "
        "LEFT JOIN (SELECT src AS id, count(*) AS od FROM e GROUP BY src) o "
        "ON n.id = o.id "
        "LEFT JOIN (SELECT dst AS id, count(*) AS idn FROM e GROUP BY dst) i "
        "ON n.id = i.id)",
        "c0 AS MATERIALIZED (SELECT id, "
        "md5(od::VARCHAR || '#' || idn::VARCHAR) AS c FROM dg)",
    ]
    for r in range(1, rounds + 1):
        p = f"c{r - 1}"
        parts += [
            f"oc{r} AS MATERIALIZED (SELECT e.src AS id, "
            f"string_agg(p.c, ',' ORDER BY p.c) AS oc "
            f"FROM e JOIN {p} p ON e.dst = p.id GROUP BY e.src)",
            f"ic{r} AS MATERIALIZED (SELECT e.dst AS id, "
            f"string_agg(p.c, ',' ORDER BY p.c) AS ic "
            f"FROM e JOIN {p} p ON e.src = p.id GROUP BY e.dst)",
            f"c{r} AS MATERIALIZED (SELECT p.id, "
            f"md5(p.c || '|' || coalesce(o.oc, '') || '|' || "
            f"coalesce(i.ic, '')) AS c "
            f"FROM {p} p LEFT JOIN oc{r} o ON p.id = o.id "
            f"LEFT JOIN ic{r} i ON p.id = i.id)",
        ]
    return (
        ",\n".join(parts)
        + f"\nSELECT id, c AS wl_color FROM c{rounds}"
    )
