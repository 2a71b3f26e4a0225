"""Triangle counting over the canonicalized simple graph (north-rule
extension; contract = oracle.graph_algos.triangle_count).

Standard distributed algorithm: canonicalize (src<dst), dedup, then a
wedge self-join closed by a semi-check join — all DataFrame equi-joins, so
Catalyst picks broadcast/SMJ and AQE splits skewed build sides. Each
triangle a<b<c is found exactly once as wedge (a-b, b-c) closed by edge
(a-c).

Degree-ordered orientation (the web-scale essential): each undirected edge
is oriented from its lower-(degree, id) endpoint to the higher one, and
wedges are enumerated only from out-neighbor PAIRS at the pivot — so a
degree-d hub contributes C(out_d, 2) wedges with out_d bounded by the
number of HIGHER-degree neighbors (≤ O(sqrt(E)) on any graph), instead of
C(d, 2). On power-law web graphs this is the difference between a feasible
job and a quadratic hub blowup. Every triangle is counted exactly once, at
its minimum-(degree, id) corner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def canonical_edges(edges: DataFrame) -> DataFrame:
    """undirected simple view: self-loops dropped, (min,max), distinct."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def _oriented(e: DataFrame) -> DataFrame:
    """(u, v): each canonical edge oriented low→high by (degree, id)."""
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    ranked = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )


def _closed_triangles(
    edges: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(closed, e, o): closed = one row (x, y, z) per triangle; e/o are the
    persisted canonical and oriented edge sets — callers MUST unpersist both
    after materializing anything derived from ``closed``."""
    e = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    o = _oriented(e).persist(StorageLevel.MEMORY_AND_DISK)
    w1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = o.select(F.col("u").alias("x2"), F.col("v").alias("z"))
    # unordered out-neighbor pairs at the pivot: y < z by id avoids double
    # enumeration; the closing undirected edge is checked canonically
    wedges = w1.join(
        w2, (F.col("x") == F.col("x2")) & (F.col("y") < F.col("z"))
    ).select("x", "y", "z")
    closed = wedges.join(
        e,
        (F.least("y", "z") == F.col("a")) & (F.greatest("y", "z") == F.col("b")),
        "left_semi",
    )
    return closed, e, o


def triangles_total(edges: DataFrame) -> DataFrame:
    """1-row DataFrame: (triangles LONG)."""
    closed, e, o = _closed_triangles(edges)
    # materialize the scalar (localCheckpoint keeps the result a DataFrame)
    # so the two persisted edge sets can be released before returning
    out = closed.agg(F.count("*").alias("triangles")).localCheckpoint(eager=True)
    e.unpersist()
    o.unpersist()
    return out


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(id LONG, triangles LONG) — triangles through each node; nodes in no
    triangle get 0."""
    closed, e, o = _closed_triangles(edges)
    counts = (
        closed.select(F.col("x").alias("id"))
        .unionAll(closed.select(F.col("y").alias("id")))
        .unionAll(closed.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
        # ≤|V| rows; materializing here lets e/o be released eagerly
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    o.unpersist()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return nodes.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, coefficient) — local clustering coefficient
    on the simple undirected view: c(v) = 2·t(v) / (deg(v)·(deg(v)−1)),
    0.0 for degree < 2 (the Watts-Strogatz per-node statistic; on web
    graphs the classic density probe for template/boilerplate link blocks).

    ``coefficient`` is a single multiply/divide rounded to 9 dp, so any
    engine reproduces it bit-for-bit from the same integer (triangles,
    degree) pair. Scale: adds ONE hash agg (canonical degree) and a |V|-row
    join on top of triangles_per_node's oriented-wedge plan — no new join
    shape beyond what triangle counting already pays.
    """
    tri = triangles_per_node(edges)
    e = canonical_edges(edges)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    # left join: self-loop-only nodes are in `tri` (degree 0) but have no
    # canonical edge at all
    return tri.join(deg, "id", "left").select(
        "id",
        F.coalesce("degree", F.lit(0)).alias("degree"),
        "triangles",
        F.when(F.coalesce("degree", F.lit(0)) < 2, F.lit(0.0))
        .otherwise(
            F.round(
                2.0
                * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
                9,
            )
        )
        .alias("coefficient"),
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """(a, b, support) — triangles through each canonical edge of the
    PERSISTED canonical edge set ``e`` (degree-ordered enumeration, one
    row per triangle, each credited to its three edges).

    This is the FULL recount — kept as the correctness oracle the delta
    peeling in ``k_truss`` is tested against (tests assert the maintained
    support equals this recount after every peel round)."""
    o = _oriented(e)
    w1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = o.select(F.col("u").alias("x2"), F.col("v").alias("z"))
    wedges = w1.join(
        w2, (F.col("x") == F.col("x2")) & (F.col("y") < F.col("z"))
    ).select("x", "y", "z")
    closed = wedges.join(
        e,
        (F.least("y", "z") == F.col("a"))
        & (F.greatest("y", "z") == F.col("b")),
        "left_semi",
    )
    sides = (
        closed.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .unionAll(
            closed.select(
                F.least("x", "z").alias("a"),
                F.greatest("x", "z").alias("b"),
            )
        )
        .unionAll(
            closed.select(
                F.least("y", "z").alias("a"),
                F.greatest("y", "z").alias("b"),
            )
        )
    )
    return sides.groupBy("a", "b").agg(F.count("*").alias("support"))


def _tri_edge(x, y):
    """canonical edge key (a, b) of a triangle side."""
    return F.least(x, y), F.greatest(x, y)


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    stats: list | None = None,
) -> DataFrame:
    """(a LONG, b LONG) — the canonical edges of the k-truss: the maximal
    subgraph where every edge closes >= k-2 triangles WITHIN the subgraph
    (Cohen 2008) — the cohesive-community filter that survives the noisy
    halo a raw triangle count keeps. k=2 returns all edges.

    DELTA peeling (VERDICT r3 task 3): the full degree-ordered wedge
    enumeration runs ONCE to materialize the triangle list T; every peel
    round then touches only the triangles that contain an edge removed
    that round — dead = T ⋉ removed (three equi semi-joins), support
    decrements = dead's surviving sides, T -= dead (three anti-joins).
    Per-round work is O(|triangles killed|), not O(full wedge fanout):
    on a 100× graph with many peel rounds the old recount multiplied the
    most expensive join in the repo by the round count; this multiplies
    it by 1. State = T (shrinks monotonically) + one support row per
    surviving edge; both are localCheckpointed per round (lineage cut).
    The support sequence is identical to a full recount — T is exactly
    the triangle set of the current subgraph at every round — so the
    fixpoint (and the DuckDB twin) is unchanged.

    ``stats``: pass a list to receive per-round dicts
    (round, removed_edges, dead_triangles, live_triangles) — the
    work-shrinks evidence; costs one extra count per round, skipped when
    None.
    """
    if k < 2:
        raise ValueError("k_truss needs k >= 2")
    import warnings

    e = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    # ONE full enumeration: triangle list (x, y, z), one row per triangle
    closed, o = _closed_triangles_of(e)
    tri = closed.localCheckpoint(eager=True)
    o.unpersist()
    ea, eb = _tri_edge(F.col("x"), F.col("y"))
    fa, fb = _tri_edge(F.col("x"), F.col("z"))
    # y < z by construction, so (y, z) is already canonical
    sides0 = (
        tri.select(ea.alias("a"), eb.alias("b"))
        .unionAll(tri.select(fa.alias("a"), fb.alias("b")))
        .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
    )
    sup0 = sides0.groupBy("a", "b").agg(F.count("*").alias("support"))
    # state: one row per CURRENT edge, its support within the current
    # subgraph (0-support edges included — they peel first when k > 2)
    state = (
        e.join(sup0, ["a", "b"], "left")
        .select(
            "a", "b", F.coalesce("support", F.lit(0)).alias("support")
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    converged = False
    for rnd in range(max_rounds):
        removed = state.where(F.col("support") < k - 2).select("a", "b")
        n_removed = removed.count()
        if n_removed == 0:
            converged = True
            break
        # triangles killed this round: any of the 3 sides was removed.
        # AQE picks broadcast for the typically-small removed set (round 1
        # can be large — the 0-support fringe — so no forced broadcast)
        conds = [
            [ea, eb],
            [fa, fb],
            [F.col("y"), F.col("z")],
        ]
        dead = None
        live = tri
        for ca, cb in conds:
            r = removed.select(F.col("a").alias("_ra"), F.col("b").alias("_rb"))
            hit = (ca == F.col("_ra")) & (cb == F.col("_rb"))
            d = tri.join(r, hit, "left_semi")
            dead = d if dead is None else dead.unionAll(d)
            live = live.join(r, hit, "left_anti")
        # a triangle with 2+ removed sides appears in several branches —
        # it must decrement each surviving side exactly once
        dead = dead.distinct()
        dec_sides = (
            dead.select(ea.alias("a"), eb.alias("b"))
            .unionAll(dead.select(fa.alias("a"), fb.alias("b")))
            .unionAll(
                dead.select(F.col("y").alias("a"), F.col("z").alias("b"))
            )
        )
        dec = dec_sides.groupBy("a", "b").agg(F.count("*").alias("_dec"))
        survivors = state.where(F.col("support") >= k - 2)
        new_state = (
            survivors.join(dec, ["a", "b"], "left")
            .select(
                "a",
                "b",
                (
                    F.col("support") - F.coalesce("_dec", F.lit(0))
                ).alias("support"),
            )
            .localCheckpoint(eager=True)
        )
        new_tri = live.localCheckpoint(eager=True)
        if stats is not None:
            stats.append(
                {
                    "round": rnd,
                    "removed_edges": n_removed,
                    "dead_triangles": dead.count(),
                    "live_triangles": new_tri.count(),
                }
            )
        state, tri = new_state, new_tri
    if not converged:
        warnings.warn(
            f"k_truss: no fixpoint within {max_rounds} rounds — result "
            "may keep under-supported edges; raise max_rounds",
            stacklevel=2,
        )
    return state.select("a", "b")


def _closed_triangles_of(e: DataFrame):
    """(closed, o) for an ALREADY-persisted canonical edge set ``e`` —
    the _closed_triangles shape without re-deriving/persisting e."""
    o = _oriented(e).persist(StorageLevel.MEMORY_AND_DISK)
    w1 = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = o.select(F.col("u").alias("x2"), F.col("v").alias("z"))
    wedges = w1.join(
        w2, (F.col("x") == F.col("x2")) & (F.col("y") < F.col("z"))
    ).select("x", "y", "z")
    closed = wedges.join(
        e,
        (F.least("y", "z") == F.col("a"))
        & (F.greatest("y", "z") == F.col("b")),
        "left_semi",
    )
    return closed, o


def truss_decomposition(
    edges: DataFrame, rounds: int | None = None, max_rounds: int = 100
) -> DataFrame:
    """(a LONG, b LONG, trussness LONG) — the truss number of EVERY
    canonical edge (the largest k such that the edge survives in the
    k-truss). Full decomposition, not one fixed-k slice like
    :func:`k_truss`; edges in no triangle report trussness 2.

    Computed by the LOCAL iteration (Sariyüce/Seshadhri/Pinar, WWW 2017
    "nucleus decomposition" family): t₀(e) = support(e); each round
    t(e) ← H-index of { min(t(f), t(g)) : (e,f,g) a triangle }, whose
    fixpoint is exactly the peel-based triangle-core number τ(e), and
    trussness = τ + 2 (pytest proves equality against a literal peel).

    Why this shape at 100×: the expensive object — the triangle list —
    is enumerated ONCE through the same degree-oriented wedge join as
    :func:`triangles_total` and persisted as a 3-rows-per-triangle
    "role" table; each round after that touches only (role ⋈ t ⋈ t) +
    one per-edge window + one agg, i.e. O(|T|) work per round with NO
    re-enumeration (contrast k_truss delta peeling, which still pays the
    initial enumeration per k-slice). Convergence is a scalar Σt check
    (per-edge monotone non-increasing), one action per round. Round
    count is the graph's triangle-relaxation depth — 3 on the sparse
    gate fixture, ~40 on the dense web fixture; ``rounds=None``
    (production) iterates to the counted fixpoint, an explicit
    ``rounds`` runs exactly that many (the twinnable gate shape;
    over-unrolling past the fixpoint is the identity)."""
    from pyspark.sql import Window

    closed, e, o = _closed_triangles(edges)
    c = closed.select(
        F.least("x", "y").alias("a1"),
        F.greatest("x", "y").alias("b1"),
        F.least("x", "z").alias("a2"),
        F.greatest("x", "z").alias("b2"),
        F.least("y", "z").alias("a3"),
        F.greatest("y", "z").alias("b3"),
    )
    roles = (
        c.select(
            F.col("a1").alias("ea"), F.col("b1").alias("eb"),
            F.col("a2").alias("fa"), F.col("b2").alias("fb"),
            F.col("a3").alias("ga"), F.col("b3").alias("gb"),
        )
        .unionAll(
            c.select(
                F.col("a2").alias("ea"), F.col("b2").alias("eb"),
                F.col("a1").alias("fa"), F.col("b1").alias("fb"),
                F.col("a3").alias("ga"), F.col("b3").alias("gb"),
            )
        )
        .unionAll(
            c.select(
                F.col("a3").alias("ea"), F.col("b3").alias("eb"),
                F.col("a1").alias("fa"), F.col("b1").alias("fb"),
                F.col("a2").alias("ga"), F.col("b2").alias("gb"),
            )
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    all_e = e.localCheckpoint(eager=True)
    roles.count()  # materialize before releasing the wedge-join inputs
    o.unpersist()
    e.unpersist()
    sup = roles.groupBy("ea", "eb").agg(F.count("*").alias("t"))
    t = (
        all_e.join(
            sup,
            (all_e["a"] == sup["ea"]) & (all_e["b"] == sup["eb"]),
            "left",
        )
        .select("a", "b", F.coalesce("t", F.lit(0)).alias("t"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    if rounds is None:
        prev_sum = t.agg(F.sum("t")).collect()[0][0]
    w = Window.partitionBy("ea", "eb").orderBy(F.desc("val"))
    n_rounds = rounds if rounds is not None else max_rounds
    for _ in range(n_rounds):
        tf = t.select(
            F.col("a").alias("fa"), F.col("b").alias("fb"),
            F.col("t").alias("tf"),
        )
        tg = t.select(
            F.col("a").alias("ga"), F.col("b").alias("gb"),
            F.col("t").alias("tg"),
        )
        vals = (
            roles.join(tf, ["fa", "fb"])
            .join(tg, ["ga", "gb"])
            .select("ea", "eb", F.least("tf", "tg").alias("val"))
        )
        hx = (
            vals.withColumn("rn", F.row_number().over(w))
            .groupBy("ea", "eb")
            .agg(F.max(F.least(F.col("rn"), F.col("val"))).alias("t"))
        )
        t_new = (
            all_e.join(
                hx,
                (all_e["a"] == hx["ea"]) & (all_e["b"] == hx["eb"]),
                "left",
            )
            .select("a", "b", F.coalesce("t", F.lit(0)).alias("t"))
            .localCheckpoint(eager=True)
        )
        t.unpersist()
        t = t_new
        if rounds is None:
            s = t.agg(F.sum("t")).collect()[0][0]
            if s == prev_sum:
                break
            prev_sum = s
    roles.unpersist(blocking=False)
    return t.select(
        "a", "b", (F.col("t") + F.lit(2)).cast("long").alias("trussness")
    )


def truss_decomposition_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB twin of :func:`truss_decomposition` with explicit
    ``rounds`` — triangles enumerated ONCE (id-ordered x<y<z; the same
    set the degree-oriented Spark enumeration produces), then the
    h-index round unrolled over the static role table."""
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({edges_sql}) WHERE src <> dst)",
        "tri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b "
        "WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.b "
        "AND e3.b = e2.b))",
        "roles AS MATERIALIZED ("
        "SELECT x AS ea, y AS eb, x AS fa, z AS fb, y AS ga, z AS gb FROM tri "
        "UNION ALL "
        "SELECT x, z, x, y, y, z FROM tri "
        "UNION ALL "
        "SELECT y, z, x, y, x, z FROM tri)",
        "t0 AS MATERIALIZED (SELECT e.a, e.b, coalesce(s.t, 0) AS t FROM e "
        "LEFT JOIN (SELECT ea, eb, count(*) AS t FROM roles "
        "GROUP BY ea, eb) s ON e.a = s.ea AND e.b = s.eb)",
    ]
    for r in range(1, rounds + 1):
        p = f"t{r - 1}"
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT e.a, e.b, coalesce(x.t, 0) AS t "
            f"FROM e LEFT JOIN (SELECT ea, eb, max(least(rn, val)) AS t FROM "
            f"(SELECT roles.ea, roles.eb, least(f.t, g.t) AS val, "
            f"row_number() OVER (PARTITION BY roles.ea, roles.eb "
            f"ORDER BY least(f.t, g.t) DESC) AS rn FROM roles "
            f"JOIN {p} f ON roles.fa = f.a AND roles.fb = f.b "
            f"JOIN {p} g ON roles.ga = g.a AND roles.gb = g.b) "
            f"GROUP BY ea, eb) x ON e.a = x.ea AND e.b = x.eb)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT a, b, CAST(t + 2 AS BIGINT) AS trussness FROM t{rounds}"
    )


def k_truss_sql(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB twin — the peeling loop unrolled to ``rounds`` (overshoot is
    safe: past the fixpoint every round is identity; pick rounds >= the
    Spark side's measured round count on the gate fixture)."""
    # every CTE is MATERIALIZED: each round references the previous one
    # several times, and an inlining planner would otherwise expand the
    # chain exponentially (measured: rounds=5 never finished planning)
    parts = [
        f"WITH raw AS MATERIALIZED ({edges_sql})",
        "t0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM raw WHERE src <> dst)",
    ]
    for r in range(1, rounds + 1):
        p = f"t{r - 1}"
        parts += [
            f"tri{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            f"FROM {p} e1 JOIN {p} e2 ON e1.a = e2.a AND e1.b < e2.b "
            f"WHERE EXISTS (SELECT 1 FROM {p} e3 WHERE e3.a = e1.b "
            "AND e3.b = e2.b))",
            f"sup{r} AS MATERIALIZED (SELECT a, b, count(*) AS support FROM ("
            f"SELECT least(x, y) AS a, greatest(x, y) AS b FROM tri{r} "
            f"UNION ALL SELECT least(x, z), greatest(x, z) FROM tri{r} "
            f"UNION ALL SELECT least(y, z), greatest(y, z) FROM tri{r}"
            ") GROUP BY a, b)",
            f"t{r} AS MATERIALIZED (SELECT t.a, t.b FROM {p} t LEFT JOIN sup{r} s "
            "ON t.a = s.a AND t.b = s.b "
            f"WHERE coalesce(s.support, 0) >= {int(k) - 2})",
        ]
    return ",\n".join(parts) + f"\nSELECT a, b FROM t{rounds}"


def global_transitivity(edges: DataFrame) -> DataFrame:
    """One row (n_wedges BIGINT, n_triangles BIGINT, transitivity DOUBLE)
    — the GLOBAL clustering coefficient C = 3·triangles / wedges
    (Newman's transitivity ratio; a different statistic from the
    per-node Watts-Strogatz coefficient above — wedge-heavy hubs drag C
    far below the mean local coefficient on web graphs).

    Wedges come from one degree agg on the simple undirected view —
    Σ deg·(deg−1)/2 as exact BIGINTs — and the triangle count reuses the
    degree-ordered enumeration; the ratio is one IEEE division rounded
    9 dp. Scale: one hash agg beyond triangle counting.
    """
    simple = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        simple.select(F.col("a").alias("id"))
        .unionAll(simple.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # Σ d·(d−1) is even term-by-term, so the integer div by 2 is exact —
    # never a double sum (inexact past 2^53 wedges)
    wedges = deg.agg(
        F.expr("coalesce(sum(d * (d - 1)), 0) div 2")
        .cast("long")
        .alias("n_wedges")
    )
    tri = triangles_total(edges).select(
        F.col("triangles").alias("n_triangles")
    )
    return wedges.crossJoin(tri).select(
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
                9,
            ),
        ).alias("transitivity"),
    )
