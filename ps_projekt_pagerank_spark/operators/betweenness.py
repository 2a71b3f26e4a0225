"""Sampled betweenness centrality — Brandes (2001) from a seed sample,
depth-capped, in exact integer arithmetic (north-rule extension; no
reference counterpart).

Betweenness answers "which pages sit on the navigation paths between
everything else" — the mediator signal PageRank (visit probability) and
HITS (endorsement) don't capture. Exact Brandes is O(|V||E|); at crawl
scale everyone runs the sampled estimator (Brandes & Pich 2007): run the
dependency accumulation from k sampled sources and scale. This module is
that estimator with the two loops re-expressed as DataFrame joins:

- forward sweep: per-seed BFS levels (``bfs_per_seed``) + shortest-path
  counts σ, built level-by-level (σ(v) = Σ σ(u) over in-edges from the
  previous level) — σ stays an exact BIGINT.
- backward sweep: dependencies δ(v) = Σ_{w: v→w, dist(w)=dist(v)+1}
  σ(v)/σ(w) · (1 + δ(w)), deepest level first.

Determinism contract (the novel bit): δ is carried in integer NANO-UNITS
— δ_nano(v) = Σ_w (σ(v) · (10^9 + δ_nano(w))) div σ(w) — so every
aggregate in both sweeps is an exact BIGINT sum and any engine reproduces
every row bit-for-bit (the same reason the FM/ANF readouts compare
integers). The floor in the div quantizes each term by < 1e-9, far below
the sampling error the estimator already carries. int64 bound: σ(v) ·
(10^9 + δ_nano(w)) must fit — safe while σ · (1 + δ) < 9·10^9, i.e. path
counts into the millions at web-graph δs; past that switch the nano scale
to 10^6 (docstring knob) before overflow, not after.

Scale: forward = one frontier join + hash agg per level (the BFS shape);
backward = one join + hash agg per level; everything is (seed, id)-keyed
rows, no windows, no Python. Levels ≤ max_depth (effective web diameter
~6-8), seeds = the sample size — both small constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ps_projekt_pagerank_spark.operators.bfs import bfs_per_seed

NANO = 1_000_000_000


def betweenness_sampled(
    edges: DataFrame, seeds: list[int], max_depth: int
) -> DataFrame:
    """(id LONG, bc_nano LONG, betweenness DOUBLE) — summed dependency
    δ of every node over BFS DAGs from the seed sample (seeds excluded
    from their own totals, per Brandes), depth-capped at ``max_depth``.
    ``bc_nano`` is the exact integer invariant; ``betweenness`` =
    bc_nano / 1e9 (one IEEE division).
    """
    if not seeds:
        raise ValueError("betweenness_sampled needs >= 1 seed node")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dist = bfs_per_seed(e, seeds, max_depth).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # ONE action learns which levels exist (the driver loops over them —
    # no per-level isEmpty probes) and materializes dist for all readers
    deepest = int(
        dist.agg(F.max("dist").alias("m")).first()["m"] or 0
    )

    # forward: σ level by level (σ of level 0 = 1); the chain is pure
    # plan construction — sig_all's single materialization below
    # evaluates it (plan depth = #levels, bounded by max_depth)
    sigma = dist.where(F.col("dist") == 0).select(
        "seed", "id", F.lit(1).cast("long").alias("sigma")
    )
    sig_all = sigma
    for k in range(1, deepest + 1):
        lvl = dist.where(F.col("dist") == k).select("seed", "id")
        nxt = (
            sigma.join(e, sigma["id"] == e["src"])
            .select("seed", F.col("dst").alias("id"), "sigma")
            .join(lvl, ["seed", "id"])  # only true level-k nodes count
            .groupBy("seed", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        sigma = nxt
        sig_all = sig_all.unionAll(nxt)
    sig_all = sig_all.join(dist, ["seed", "id"]).localCheckpoint(
        eager=True
    )

    # backward: δ_nano level by level, deepest first; δ at the deepest
    # level is 0, so start the accumulator empty. Pure plan construction
    # off the checkpointed sig_all — the final per-node aggregate is the
    # ONE action that evaluates the whole backward DAG.
    delta = None  # (seed, id, d_nano) for levels > k
    acc = []  # per-level contributions to the final per-node sum
    for k in range(int(deepest) - 1, -1, -1):
        lvl_v = sig_all.where(F.col("dist") == k).select(
            "seed", "id", "sigma"
        )
        lvl_w = sig_all.where(F.col("dist") == k + 1).select(
            F.col("seed").alias("w_seed"),
            F.col("id").alias("w_id"),
            F.col("sigma").alias("w_sigma"),
        )
        if delta is not None:
            lvl_w = lvl_w.join(
                delta.select(
                    F.col("seed").alias("w_seed"),
                    F.col("id").alias("w_id"),
                    "d_nano",
                ),
                ["w_seed", "w_id"],
                "left",
            )
        else:
            lvl_w = lvl_w.select(
                "*", F.lit(None).cast("long").alias("d_nano")
            )
        terms = (
            lvl_v.join(e, lvl_v["id"] == e["src"])
            .join(
                lvl_w,
                (F.col("dst") == F.col("w_id"))
                & (F.col("seed") == F.col("w_seed")),
            )
            .select(
                "seed",
                "id",
                # overflow guard (VERDICT r3 task 8): σ·(1e9+δ_nano) must
                # fit int64; fail loudly with the remedy instead of
                # wrapping (or dying with ANSI's generic message)
                F.expr(
                    "CASE WHEN sigma > 9223372036854775807 div "
                    f"({NANO} + coalesce(d_nano, 0L)) THEN "
                    "raise_error('betweenness_sampled: sigma * (1e9 + "
                    "delta_nano) exceeds int64 — lower the NANO scale "
                    "to 1e6 (module docstring knob)') "
                    f"ELSE (sigma * ({NANO} + coalesce(d_nano, 0L))) "
                    "div w_sigma END"
                ).alias("t"),
            )
            .groupBy("seed", "id")
            .agg(F.sum("t").alias("d_nano"))
        )
        # nodes at level k with no level-(k+1) successors keep δ = 0 and
        # contribute nothing; only non-zero δ rows persist. δ at level k
        # feeds both level k-1 and the final sum — the chain depth is
        # bounded by max_depth, so lazy plans suffice (no checkpoints).
        delta = terms
        acc.append(delta)

    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if acc:
        allc = acc[0]
        for a in acc[1:]:
            allc = allc.unionAll(a)
        # Brandes: a seed's own dependency rows (id == seed) are excluded
        per_node = (
            allc.where(F.col("id") != F.col("seed"))
            .groupBy("id")
            .agg(F.sum("d_nano").alias("bc_nano"))
        )
    else:
        per_node = nodes.select(
            "id", F.lit(0).cast("long").alias("bc_nano")
        ).limit(0)
    out = nodes.join(per_node, "id", "left").select(
        "id",
        F.coalesce("bc_nano", F.lit(0).cast("long")).alias("bc_nano"),
        (
            F.coalesce("bc_nano", F.lit(0).cast("long")).cast("double")
            / F.lit(float(NANO))
        ).alias("betweenness"),
    )
    # materialize (|V| rows) so the persisted inputs release eagerly;
    # repeated δ subtrees inside this one job dedupe via ReusedExchange
    out = out.localCheckpoint(eager=True)
    e.unpersist(blocking=False)
    dist.unpersist(blocking=False)
    return out


def betweenness_sampled_sql(
    edges_sql: str, seeds: list[int], max_depth: int
) -> str:
    """DuckDB twin — the same unrolled level chains with identical BIGINT
    σ and nano-unit δ arithmetic. Level count must cover the Spark side's
    actual deepest level; unused deeper CTEs are empty and harmless."""
    seed_rows = ", ".join(f"({int(s)})" for s in sorted(set(seeds)))
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) "
        "WHERE src <> dst)",
        f"p0 AS (SELECT id AS seed, id FROM (VALUES {seed_rows}) AS t(id))",
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"p{k} AS (SELECT seed, id FROM p{k - 1} UNION "
            f"SELECT s.seed, e.dst AS id FROM e JOIN p{k - 1} s "
            "ON e.src = s.id)"
        )
    unions = " UNION ALL ".join(
        f"SELECT seed, id, {k} AS dist FROM p{k}"
        for k in range(max_depth + 1)
    )
    parts.append(
        f"dist AS (SELECT seed, id, CAST(min(dist) AS INT) AS dist "
        f"FROM ({unions}) GROUP BY seed, id)"
    )
    parts.append(
        "sg0 AS (SELECT seed, id, CAST(1 AS BIGINT) AS sigma FROM dist "
        "WHERE dist = 0)"
    )
    for k in range(1, max_depth + 1):
        parts.append(
            f"sg{k} AS (SELECT s.seed, e.dst AS id, "
            "CAST(sum(s.sigma) AS BIGINT) AS sigma "
            f"FROM sg{k - 1} s JOIN e ON s.id = e.src "
            f"JOIN dist d ON d.seed = s.seed AND d.id = e.dst "
            f"AND d.dist = {k} GROUP BY s.seed, e.dst)"
        )
    sig_union = " UNION ALL ".join(
        f"SELECT seed, id, sigma, {k} AS dist FROM sg{k}"
        for k in range(max_depth + 1)
    )
    parts.append(f"sig AS ({sig_union})")
    # backward deltas: dl{k} holds δ_nano of level-k nodes
    parts.append(
        f"dl{max_depth} AS (SELECT seed, id, CAST(0 AS BIGINT) AS d_nano "
        f"FROM sig WHERE dist = {max_depth} AND FALSE)"
    )
    for k in range(max_depth - 1, -1, -1):
        parts.append(
            f"dl{k} AS (SELECT v.seed, v.id, CAST(sum("
            f"(v.sigma * ({NANO} + coalesce(w.d_nano, 0))) // w.sigma"
            ") AS BIGINT) AS d_nano "
            f"FROM (SELECT seed, id, sigma FROM sig WHERE dist = {k}) v "
            "JOIN e ON v.id = e.src "
            f"JOIN (SELECT s.seed, s.id, s.sigma, d.d_nano FROM "
            f"(SELECT seed, id, sigma FROM sig WHERE dist = {k + 1}) s "
            f"LEFT JOIN dl{k + 1} d ON d.seed = s.seed AND d.id = s.id) w "
            "ON e.dst = w.id AND v.seed = w.seed "
            "GROUP BY v.seed, v.id)"
        )
    dl_union = " UNION ALL ".join(
        f"SELECT seed, id, d_nano FROM dl{k}" for k in range(max_depth)
    )
    parts.append(
        "bc AS (SELECT id, CAST(sum(d_nano) AS BIGINT) AS bc_nano FROM "
        f"({dl_union}) WHERE id <> seed GROUP BY id)"
    )
    parts.append(
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e "
        "UNION ALL SELECT dst AS id FROM e))"
    )
    return (
        ",\n".join(parts)
        + "\nSELECT n.id, coalesce(bc.bc_nano, 0) AS bc_nano, "
        f"CAST(coalesce(bc.bc_nano, 0) AS DOUBLE) / {float(NANO)} "
        "AS betweenness "
        "FROM nodes n LEFT JOIN bc ON n.id = bc.id"
    )
