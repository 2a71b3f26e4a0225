"""Louvain phase-1 community moves, synchronous distributed variant
(Blondel/Guillaume/Lambiotte/Lefebvre 2008; sync parallelization as in
the standard GraphX/Grappolo adaptations).

The reference engine stops at rank vectors (Graph4CL.cpp) — community
detection is part of the north-rule §2.5 extension family beside CC, LP
and triangle counting, and Louvain is the canonical modularity-ascent
member. We implement phase 1 (node-level moves) as SYNCHRONOUS rounds:
every node simultaneously evaluates moving into each neighboring
community and takes the best modularity gain. Synchronous moves are the
only deterministic parallel formulation (the classic sequential sweep is
order-dependent — not reproducible across partitionings); naive sync
moves oscillate (two adjacent singletons each jump into the other's
community forever), so rounds alternate by id parity — on round r only
nodes with (id + r) % 2 == 0 may move: the red-black / Jacobi
half-sweep scheduling standard in parallel Louvain implementations.
Monotone ascent is still not guaranteed in general, so the operator runs
a FIXED round count, like our label propagation, rather than a
convergence loop (a node moves at most every other round — size the
round count ~2x the sequential sweep count).

Exact arithmetic (engine-portable, no floats): moving node i into
community c changes modularity by

    dQ ∝ k_in(i,c) - k_i * tot(c\\i) / m2        (m2 = Σ k_i = 2m)

which is compared via the BIGINT score  m2·k_in(i,c) − k_i·tot'(c)
(tot'(c) = tot(c) − k_i when c is i's current community). All moments
are exact integer aggregates; ties break to the smallest community id.
Overflow bound: |score| ≤ m2·k_max — guarded with Python bignum
arithmetic at setup (raises past 2^63; at that scale switch the score
to DECIMAL(38,0) and accept the constant-factor cost).

Graph model: the directed multigraph is symmetrized (w(u,v) = number of
edges between u and v in either direction, self-loops dropped — they
cancel in the gain comparison); isolated / self-loop-only nodes keep
their own singleton community.

Scale shape: the per-round work is ONE |E|-row join (neighbor labels) +
two |V|-row aggregations + a per-node max_by hash-agg argmax (map-side
combinable — no sort). The symmetric adjacency is built once and persisted;
rounds reuse it, exactly like the PageRank scatter reusing the build-once
adjacency (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_I64_MAX = (1 << 63) - 1


def _sym_adj(edges: DataFrame) -> DataFrame:
    """(a, b, w BIGINT) — symmetric weighted simple adjacency."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def louvain_moves(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """(id LONG, community LONG) — community of every node appearing in
    ``edges`` after ``rounds`` synchronous Louvain phase-1 move rounds."""
    if rounds < 1:
        raise ValueError(f"louvain_moves: rounds must be >= 1, got {rounds}")
    nodes = (
        edges.select(F.explode(F.array("src", "dst")).alias("id"))
        .distinct()
    )
    sym = _sym_adj(edges).persist()
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.sum("w").cast("long").alias("k")
    )
    # m2 and the overflow guard are driver scalars (bignum-exact), same
    # pattern as the reference's host-side sink_sum (Graph4CL.cpp:166-172)
    row = deg.agg(
        F.coalesce(F.sum("k"), F.lit(0)).alias("m2"),
        F.coalesce(F.max("k"), F.lit(0)).alias("kmax"),
    ).collect()[0]
    m2, kmax = int(row["m2"]), int(row["kmax"])
    if m2 * kmax > _I64_MAX:
        raise OverflowError(
            f"louvain_moves: m2*kmax = {m2 * kmax} exceeds int64 — "
            "switch the score expression to DECIMAL(38,0)"
        )
    state = nodes.select("id", F.col("id").alias("c")).persist()
    deg = deg.persist()
    for rnd in range(1, rounds + 1):
        tot = (
            state.join(deg, "id", "left")
            .groupBy("c")
            .agg(F.sum(F.coalesce("k", F.lit(0))).cast("long").alias("tot"))
        )
        cand = (
            sym.join(
                state.select(F.col("id").alias("b"), F.col("c")), "b"
            )
            .groupBy(F.col("a").alias("id"), "c")
            .agg(F.sum("w").cast("long").alias("kin"))
            .unionByName(
                state.select("id", "c", F.lit(0).cast("long").alias("kin"))
            )
            .groupBy("id", "c")
            .agg(F.sum("kin").cast("long").alias("kin"))
        )
        scored = (
            cand.join(state.select("id", F.col("c").alias("_cur")), "id")
            # red-black half-sweep: inactive nodes keep their community
            .where(
                ((F.col("id") + F.lit(rnd)) % 2 == 0)
                | (F.col("c") == F.col("_cur"))
            )
            .join(deg, "id", "left")
            .join(tot, "c")
            .select(
                "id",
                "c",
                (
                    F.lit(m2) * F.col("kin")
                    - F.coalesce("k", F.lit(0))
                    * (
                        F.col("tot")
                        - F.when(
                            F.col("c") == F.col("_cur"),
                            F.coalesce("k", F.lit(0)),
                        ).otherwise(F.lit(0))
                    )
                ).alias("score"),
            )
        )
        # argmax as a HASH AGG (max over the lexicographic (score, -c)
        # struct = best score, ties to the smallest community id) — a
        # per-id window compiles to a sort per round; max_by is map-side
        # combinable and never sorts (measured 41.9 -> 29.4 s on the
        # sf0.1 louvain4 bench entry in the same host window)
        nxt = (
            scored.groupBy("id")
            .agg(
                F.max_by(
                    "c",
                    F.struct(
                        F.col("score"), (-F.col("c")).alias("nc")
                    ),
                ).alias("c")
            )
            .persist()
        )
        nxt.count()  # materialize before unpersisting the parent
        state.unpersist()
        state = nxt
    out = state.select("id", F.col("c").alias("community"))
    sym.unpersist()
    deg.unpersist()
    return out


def louvain_moves_sql(edges_sql: str, rounds: int = 3) -> str:
    """DuckDB twin — identical symmetrization, BIGINT scores, and
    per-node argmax, rounds unrolled as MATERIALIZED CTEs."""
    if rounds < 1:
        raise ValueError(f"louvain_moves_sql: rounds must be >= 1, got {rounds}")
    parts = [
        f"e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        f"(SELECT src AS id FROM ({edges_sql}) "
        f"UNION ALL SELECT dst FROM ({edges_sql})))",
        "sym AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) AS w "
        "FROM (SELECT src AS a, dst AS b FROM e "
        "UNION ALL SELECT dst AS a, src AS b FROM e) GROUP BY 1, 2)",
        "deg AS MATERIALIZED (SELECT a AS id, CAST(SUM(w) AS BIGINT) AS k "
        "FROM sym GROUP BY 1)",
        "mm AS MATERIALIZED (SELECT CAST(COALESCE(SUM(k), 0) AS BIGINT) "
        "AS m2 FROM deg)",
        "s0 AS MATERIALIZED (SELECT id, id AS c FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"tot{r} AS MATERIALIZED (SELECT s.c, "
            "CAST(SUM(COALESCE(d.k, 0)) AS BIGINT) AS tot "
            f"FROM {prev} s LEFT JOIN deg d USING (id) GROUP BY 1)"
        )
        parts.append(
            f"agg{r} AS MATERIALIZED (SELECT id, c, "
            "CAST(SUM(kin) AS BIGINT) AS kin FROM ("
            "SELECT sym.a AS id, sj.c AS c, CAST(SUM(sym.w) AS BIGINT) AS kin "
            f"FROM sym JOIN {prev} sj ON sym.b = sj.id GROUP BY 1, 2 "
            f"UNION ALL SELECT id, c, 0 FROM {prev}) GROUP BY 1, 2)"
        )
        parts.append(
            f"sc{r} AS MATERIALIZED (SELECT g.id, g.c, "
            "(SELECT m2 FROM mm) * g.kin - COALESCE(d.k, 0) * "
            "(t.tot - CASE WHEN g.c = s.c THEN COALESCE(d.k, 0) "
            "ELSE 0 END) AS score "
            f"FROM agg{r} g JOIN {prev} s USING (id) "
            "LEFT JOIN deg d ON g.id = d.id "
            f"JOIN tot{r} t ON g.c = t.c "
            f"WHERE ((g.id + {r}) % 2 = 0) OR g.c = s.c)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT id, c FROM "
            "(SELECT id, c, row_number() OVER "
            "(PARTITION BY id ORDER BY score DESC, c) AS rn "
            f"FROM sc{r}) WHERE rn = 1)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT id, c AS community FROM s{rounds}"
    )
