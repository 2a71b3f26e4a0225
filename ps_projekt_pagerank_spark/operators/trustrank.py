"""TrustRank and spam-mass estimation (Gyongyi, Garcia-Molina & Pedersen,
"Combating Web Spam with TrustRank", VLDB 2004).

TrustRank IS personalized PageRank with the teleport restricted to a
manually-vetted trusted seed set — the reference computes only the global
variant (Graph.cpp:118-173); this north-rule extension composes the two
existing fixed-sweep kernels. The paper's statistics, with both vectors
summing to 1:

    mass(p)     = PR(p) - TR(p)          (absolute spam mass — the rank
                                          share p receives from sources the
                                          trusted core cannot reach)
    rel_mass(p) = mass(p) / PR(p)        (~1 -> nearly all of p's rank is
                                          unattributable to trusted pages;
                                          the paper's detection statistic)

Scale: ONE graph build (the |E|-row shuffle, salting, int32 narrowing,
persist) shared by both rank loops; each loop then touches only |V|-row
state per sweep. The final join is |V|-vs-|V| on the id both sides are
already hashed by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import DAMPING
from .graph import GraphTables, build_graph
from .pagerank import pagerank_fixed, pagerank_personalized_fixed


def trustrank(
    edges: DataFrame,
    trusted: list[int],
    num_iterations: int,
    damping: float = DAMPING,
    graph: GraphTables | None = None,
) -> DataFrame:
    """(id, rank) — fixed-sweep TrustRank: personalized PageRank whose
    teleport (and redistributed sink mass) flows only to ``trusted``."""
    return pagerank_personalized_fixed(
        edges, seeds=trusted, num_iterations=num_iterations,
        damping=damping, graph=graph,
    )


def spam_mass(
    edges: DataFrame,
    trusted: list[int],
    num_iterations: int,
    damping: float = DAMPING,
    graph: GraphTables | None = None,
) -> DataFrame:
    """(id, pr, tr, mass, rel_mass) — PageRank, TrustRank, and the VLDB'04
    spam-mass statistics, off one shared graph build.

    pr/tr are rounded to 9 dp BEFORE the subtraction and mass/rel_mass are
    derived from the rounded values, so any engine replaying the two
    unrolled fixed-sweep recurrences reproduces every output bit (the
    DuckDB twin in __spark_entry__ does exactly this). rel_mass is NULL
    for the (theoretically impossible after one sweep, but guarded)
    pr == 0 case.
    """
    own_graph = graph is None
    g = graph or build_graph(edges)
    pr = pagerank_fixed(edges, num_iterations, damping, graph=g)
    tr = pagerank_personalized_fixed(
        edges, seeds=trusted, num_iterations=num_iterations,
        damping=damping, graph=g,
    )
    pr9 = F.round(pr["rank"], 9)
    tr9 = F.round(tr["rank"], 9)
    out = pr.join(tr.withColumnRenamed("rank", "tr_rank"), "id").select(
        "id",
        pr9.alias("pr"),
        F.round("tr_rank", 9).alias("tr"),
        F.round(pr9 - F.round("tr_rank", 9), 9).alias("mass"),
        F.when(
            pr9 > 0,
            F.round((pr9 - F.round("tr_rank", 9)) / pr9, 6),
        ).alias("rel_mass"),
    )
    if own_graph:
        g.unpersist()
    return out


def spam_mass_sql(
    pagerank_sql: str, trustrank_sql: str, rel_round: int = 6
) -> str:
    """DuckDB twin: joins the two unrolled fixed-sweep CTE chains (each a
    full ``WITH ... SELECT id, round(rank, 9)`` statement) and derives the
    mass columns from the same 9-dp-rounded values as the Spark side."""
    return (
        f"WITH pr AS ({pagerank_sql}), tr AS ({trustrank_sql}) "
        "SELECT pr.id, pr.rank AS pr, tr.rank AS tr, "
        "round(pr.rank - tr.rank, 9) AS mass, "
        "CASE WHEN pr.rank > 0 THEN "
        f"round((pr.rank - tr.rank) / pr.rank, {rel_round}) END AS rel_mass "
        "FROM pr JOIN tr ON pr.id = tr.id"
    )
