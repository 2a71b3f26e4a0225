"""SimRank over candidate pairs — "two pages are similar if they are
linked to by similar pages" (Jeh & Widom, KDD 2002), the in-link
structural-similarity measure that complements this repo's one-shot
co-citation / neighborhood-jaccard scores with a recursive one.

Exact SimRank is O(|V|²) state — meaningless at web scale. The standard
pruned form computed here keeps scores ONLY for candidate pairs (default:
co-cited pairs, i.e. pairs sharing ≥1 in-neighbor — exactly the pairs
with a nonzero first-iteration score); any pair outside the tracked set
contributes 0 to the recursion. Hubs are excluded up front
(``max_in_degree``), both because the per-pair join fans out as
in-degree² and because SimRank over a mega-hub's in-neighborhood is
noise. The iteration is therefore |P|·cap²-bounded DataFrame algebra:
one equi-join chain + hash agg per sweep, no windows, no driver loops.

Engine determinism: scores are BIGINT nano-units with integer floor
division (betweenness.py's idiom) — s_k(a,b) = (c_num · Σ s_{k-1}(i,j))
div (c_den · |I(a)|·|I(b)|), identity pairs contributing 10^9. Every
intermediate fits int64: terms ≤ 10^9, ≤ cap² ≤ 4096 of them per pair,
× c_num — ≤ 1.6e13 at the default cap 64. The float column is one IEEE
division at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000


def simrank(
    edges: DataFrame,
    iterations: int = 2,
    c_num: int = 4,
    c_den: int = 5,
    max_in_degree: int = 64,
) -> DataFrame:
    """(id_a, id_b, snano, simrank) — pruned SimRank after ``iterations``
    sweeps over the co-cited candidate pairs (id_a < id_b), decay
    C = c_num/c_den (default 0.8, the paper's choice) kept rational so
    the nano-unit arithmetic stays integer-exact in every engine."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0 < c_num < c_den):
        raise ValueError(f"need 0 < c_num < c_den, got {c_num}/{c_den}")
    e = edges.select("src", "dst").distinct()
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("d"))
    ok = ind.where(F.col("d") <= max_in_degree)
    ea = e.select(F.col("src").alias("_i"), F.col("dst").alias("id_a"))
    eb = e.select(F.col("src").alias("_j"), F.col("dst").alias("id_b"))
    cand = (
        ea.join(eb, (F.col("_i") == F.col("_j")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
        .join(ok.select(F.col("id").alias("id_a"), F.col("d").alias("na")), "id_a")
        .join(ok.select(F.col("id").alias("id_b"), F.col("d").alias("nb")), "id_b")
        .persist()
    )
    scores = None  # None = identity-only s_0
    for _ in range(iterations):
        pairs = cand.join(ea, "id_a").join(eb, "id_b")
        if scores is None:
            term = F.when(F.col("_i") == F.col("_j"), F.lit(NANO)).otherwise(
                F.lit(0)
            )
            joined = pairs
        else:
            prev = scores.select(
                F.col("id_a").alias("_pa"),
                F.col("id_b").alias("_pb"),
                F.col("snano").alias("_ps"),
            )
            joined = pairs.join(
                prev,
                (F.least("_i", "_j") == F.col("_pa"))
                & (F.greatest("_i", "_j") == F.col("_pb")),
                "left",
            )
            term = F.when(F.col("_i") == F.col("_j"), F.lit(NANO)).otherwise(
                F.coalesce("_ps", F.lit(0))
            )
        scores = (
            joined.groupBy("id_a", "id_b", "na", "nb")
            .agg(F.sum(term).alias("_tot"))
            .select(
                "id_a",
                "id_b",
                "na",
                "nb",
                F.expr(
                    f"({c_num} * _tot) div ({c_den} * na * nb)"
                ).alias("snano"),
            )
        )
    out = scores.where(F.col("snano") > 0).select(
        "id_a",
        "id_b",
        "snano",
        F.round(F.col("snano") / NANO, 6).alias("simrank"),
    )
    return out


def simrank_sql(
    edges_sql: str,
    iterations: int = 2,
    c_num: int = 4,
    c_den: int = 5,
    max_in_degree: int = 64,
) -> str:
    """DuckDB twin — the sweeps unrolled as CTEs with the identical
    nano-unit integer recurrence (// == Spark's div on the non-negative
    values here)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "ind AS (SELECT dst AS id, count(*) AS d FROM e GROUP BY dst)",
        f"ok AS (SELECT id, d FROM ind WHERE d <= {int(max_in_degree)})",
        "cand AS (SELECT c.id_a, c.id_b, a.d AS na, b.d AS nb FROM "
        "(SELECT DISTINCT ea.dst AS id_a, eb.dst AS id_b FROM e ea "
        "JOIN e eb ON ea.src = eb.src AND ea.dst < eb.dst) c "
        "JOIN ok a ON a.id = c.id_a JOIN ok b ON b.id = c.id_b)",
    ]
    prev = None
    for k in range(1, iterations + 1):
        name = f"s{k}"
        if prev is None:
            term = "CASE WHEN ea.src = eb.src THEN 1000000000 ELSE 0 END"
            join_prev = ""
        else:
            term = (
                "CASE WHEN ea.src = eb.src THEN 1000000000 "
                "ELSE coalesce(p.snano, 0) END"
            )
            join_prev = (
                f" LEFT JOIN {prev} p ON p.id_a = least(ea.src, eb.src) "
                "AND p.id_b = greatest(ea.src, eb.src)"
            )
        ctes.append(
            f"{name} AS (SELECT c.id_a, c.id_b, c.na, c.nb, "
            f"({c_num} * sum({term})) // ({c_den} * c.na * c.nb) AS snano "
            "FROM cand c JOIN e ea ON ea.dst = c.id_a "
            f"JOIN e eb ON eb.dst = c.id_b{join_prev} "
            "GROUP BY c.id_a, c.id_b, c.na, c.nb)"
        )
        prev = name
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT id_a, id_b, snano, round(snano / 1000000000.0, 6) "
        f"AS simrank FROM {prev} WHERE snano > 0"
    )
