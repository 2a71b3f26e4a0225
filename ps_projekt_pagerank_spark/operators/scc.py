"""Strongly connected components and the Broder bow-tie decomposition —
the canonical structural analysis of a directed web graph ("Graph
structure in the Web", Broder et al., WWW 2000: CORE / IN / OUT /
TENDRILS / DISCONNECTED). North-rule extension of the reference's
directed-graph scope (ps-projekt-pagerank builds the same directed link
graph, Graph.cpp:41-117, but only ranks it).

SCC algorithm: trim + forward/backward min-label, the standard BSP
formulation (Salihoglu & Widom, "Optimizing Graph Algorithms on
Pregel-like Systems", VLDB 2014) re-expressed as DataFrame joins:

1. TRIM — iteratively peel nodes with zero in- or out-degree in the
   remaining subgraph (they are singleton SCCs). On web graphs this alone
   disposes of the DAG-shaped majority (IN/OUT/tendrils).
2. F fixpoint — F(v) = min id of any ancestor of v (min-label propagation
   along edge direction; rounds ≤ remaining diameter).
3. B fixpoint — B(v) = min id of any descendant (same, reversed edges).
4. F(v) == B(v) == m means m →* v and v →* m, so v ∈ SCC(m): settle those
   nodes with component = m, drop them from the graph, repeat. The SCC of
   the minimum remaining id always settles (its members have F = B = that
   id), so every outer round makes progress; real web graphs finish in
   one or two outer rounds (one giant core + trimmed periphery).

Every round is |V|-row state against the |E|-row edge set — the same
shuffle shape as the PageRank sweep; each fixpoint round is ONE action
(changed-count observed on the state checkpoint, components.py pattern).
All label values are ids (integers), so any engine reproduces them
bit-for-bit and the DuckDB twin (a recursive-CTE reachability closure)
hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _min_label_fixpoint(
    nodes: DataFrame, edges: DataFrame, max_rounds: int, tag: str
) -> DataFrame:
    """(id, lbl) — lbl = min id over {v} ∪ ancestors of v along ``edges``
    (propagation src → dst). One observed action per round."""
    labels = nodes.select("id", F.col("id").alias("lbl")).localCheckpoint(
        eager=True
    )
    for rnd in range(max_rounds):
        pushed = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("nmin"))
        )
        obs = Observation(f"scc_{tag}_{rnd}")
        new_labels = (
            labels.join(pushed, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"), F.coalesce("nmin", F.col("lbl"))
                ).alias("new_lbl"),
                F.col("lbl").alias("old_lbl"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("new_lbl") != F.col("old_lbl")).cast("long")
                ).alias("changed"),
            )
            .select("id", F.col("new_lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


def strongly_connected_components(
    edges: DataFrame, max_outer: int = 50, max_label_rounds: int = 200
) -> DataFrame:
    """(id LONG, component LONG) — component = min node id in v's SCC.

    Nodes = every id appearing as src or dst (self-loops count for node
    discovery but are singleton-irrelevant for SCC membership).
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionAll(edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    settled: list[DataFrame] = []
    n_edges = e.count()
    for _ in range(max_outer):
        # 1. TRIM to the subgraph where every node has in- and out-degree
        # ≥ 1 (same counted-peel loop shape as kcore.k_core)
        while n_edges > 0:
            keep = (
                e.select(F.col("src").alias("id"))
                .intersect(e.select(F.col("dst").alias("id")))
            )
            kept = (
                e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            n_kept = kept.count()
            stable = n_kept == n_edges
            e.unpersist()
            e, n_edges = kept, n_kept
            if stable:
                break
        core_nodes = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # everything trimmed away this round is its own singleton SCC
        singleton = nodes.join(core_nodes, "id", "left_anti").select(
            "id", F.col("id").alias("component")
        ).localCheckpoint(eager=True)
        settled.append(singleton)
        if n_edges == 0:
            nodes.unpersist()
            core_nodes.unpersist()
            break
        # 2./3. forward (ancestor-min) and backward (descendant-min) labels
        fwd = _min_label_fixpoint(core_nodes, e, max_label_rounds, "f")
        bwd = _min_label_fixpoint(
            core_nodes,
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            max_label_rounds,
            "b",
        )
        both = fwd.join(
            bwd.withColumnRenamed("lbl", "blbl"), "id"
        ).localCheckpoint(eager=True)
        fwd.unpersist()
        bwd.unpersist()
        done = both.where(F.col("lbl") == F.col("blbl")).select(
            "id", F.col("lbl").alias("component")
        ).localCheckpoint(eager=True)
        settled.append(done)
        remaining = both.where(F.col("lbl") != F.col("blbl")).select("id")
        # 4. drop settled nodes, loop on the rest
        kept = (
            e.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        new_nodes = remaining.localCheckpoint(eager=True)
        n_edges = kept.count()
        e.unpersist()
        both.unpersist()
        nodes.unpersist()
        core_nodes.unpersist()
        e, nodes = kept, new_nodes
        if new_nodes.isEmpty():
            e.unpersist()
            nodes.unpersist()
            break
    else:
        # max_outer exhausted mid-graph (only possible on a long chain of
        # non-trivial SCCs — not a web-graph shape): fail loudly rather
        # than return a partial labeling
        raise RuntimeError(
            f"strongly_connected_components: {max_outer} outer rounds "
            "exhausted with nodes unsettled; raise max_outer"
        )
    out = settled[0]
    for s in settled[1:]:
        out = out.unionAll(s)
    return out


_PARTS = ("CORE", "IN", "OUT", "TENDRIL", "DISCONNECTED")


def _reachable_from(
    seed: DataFrame, edges: DataFrame, max_hops: int = 200
) -> DataFrame:
    """(id) — the seed set plus every node reachable from it along
    ``edges`` src→dst. BFS, one counted action per hop; hops ≤ diameter."""
    visited = seed.select("id").localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_hops):
        nxt = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            nxt.unpersist()
            break
        new_visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        visited.unpersist()
        frontier = nxt
        visited = new_visited
    return visited


def bow_tie(edges: DataFrame) -> DataFrame:
    """(id LONG, part STRING) — Broder bow-tie classification:

    - CORE: the largest SCC (ties broken toward the smaller component id)
    - IN:   reaches the core, not in it
    - OUT:  reachable from the core, not in it
    - TENDRIL: weakly connected to the core but none of the above
      (tendrils and tubes, collapsed — the usual coarse reading)
    - DISCONNECTED: everything else
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scc = strongly_connected_components(edges).localCheckpoint(eager=True)
    top = (
        scc.groupBy("component")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
    )
    core = scc.join(
        top.select("component"), "component", "left_semi"
    ).select("id").localCheckpoint(eager=True)
    fwd = _reachable_from(core, e).localCheckpoint(eager=True)
    bwd = _reachable_from(
        core, e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    und = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    weak = _reachable_from(core, und).localCheckpoint(eager=True)
    out = (
        scc.select("id")
        .join(core.select("id", F.lit(True).alias("is_core")), "id", "left")
        .join(fwd.select("id", F.lit(True).alias("is_fwd")), "id", "left")
        .join(bwd.select("id", F.lit(True).alias("is_bwd")), "id", "left")
        .join(weak.select("id", F.lit(True).alias("is_weak")), "id", "left")
        .select(
            "id",
            F.when(F.col("is_core"), F.lit("CORE"))
            .when(F.col("is_bwd"), F.lit("IN"))
            .when(F.col("is_fwd"), F.lit("OUT"))
            .when(F.col("is_weak"), F.lit("TENDRIL"))
            .otherwise(F.lit("DISCONNECTED"))
            .alias("part"),
        )
        .localCheckpoint(eager=True)
    )
    for df in (e, scc, core, fwd, bwd, weak):
        df.unpersist()
    return out


def condensation_depth(edges: DataFrame, max_rounds: int = 200) -> DataFrame:
    """(component LONG, n_nodes BIGINT, depth INT) — the SCC condensation
    DAG with each component's longest-path depth from a source component.

    Collapsing SCCs always yields a DAG, so the synchronous relaxation

        depth_0(c)     = 0
        depth_{r+1}(c) = max(depth_r(c), 1 + max_{b→c} depth_r(b))

    reaches its fixpoint in (longest path length) rounds — on web-shaped
    graphs that is the bow-tie depth, tiny compared to |V|. depth orders
    crawl/recompute scheduling: rank updates can sweep components in
    topological waves instead of global iterations.

    Scale shape: the condensed edge list has one row per inter-component
    link (≪ |E| after collapse) and is checkpointed once; each round is
    one hash agg + one |C|-row join, ONE counting action (changed rows)
    decides the stop.
    """
    comp = strongly_connected_components(edges).localCheckpoint(eager=True)
    e = edges.where(F.col("src") != F.col("dst")).select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    cmap_s = comp.select(
        F.col("id").alias("src"), F.col("component").alias("cs")
    )
    cmap_d = comp.select(
        F.col("id").alias("dst"), F.col("component").alias("cd")
    )
    ced = (
        e.join(cmap_s, "src")
        .join(cmap_d, "dst")
        .where(F.col("cs") != F.col("cd"))
        .select("cs", "cd")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("n_nodes"))
    depth = sizes.select(
        "component", F.lit(0).cast("int").alias("depth")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        relaxed = (
            ced.join(
                depth.select(
                    F.col("component").alias("cs"),
                    F.col("depth").alias("d_src"),
                ),
                "cs",
            )
            .groupBy(F.col("cd").alias("component"))
            .agg((F.max("d_src") + F.lit(1)).alias("d_in"))
        )
        nxt = (
            depth.join(relaxed, "component", "left")
            .select(
                "component",
                F.greatest(
                    "depth", F.coalesce("d_in", F.lit(0))
                ).cast("int").alias("depth"),
                (F.coalesce("d_in", F.lit(0)) > F.col("depth")).alias(
                    "_chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.where("_chg").count()
        depth.unpersist()
        depth = nxt.select("component", "depth")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"condensation_depth: no fixpoint in {max_rounds} rounds — "
            "the condensation is not a DAG (SCC collapse is broken)"
        )
    out = sizes.join(depth, "component").select(
        "component", "n_nodes", "depth"
    ).localCheckpoint(eager=True)
    for df in (comp, ced):
        df.unpersist()
    return out


def scc_ctes_sql(edges_sql: str) -> str:
    """Shared CTE prefix for the SCC-family twins: directed reachability
    closure (recursive UNION keeps it a set), mutual pairs, and the
    min-id-per-SCC labeling — the closed-form contract the iterative Spark
    trim+forward/backward algorithm must land on."""
    return (
        f"WITH RECURSIVE raw AS ({edges_sql}), "
        "e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst), "
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM raw "
        "UNION ALL SELECT dst AS id FROM raw)), "
        "reach(s, d) AS (SELECT src, dst FROM e "
        "UNION SELECT r.s, e.dst FROM reach r JOIN e ON e.src = r.d), "
        "mutual AS (SELECT r1.s AS v, r1.d AS u FROM reach r1 "
        "JOIN reach r2 ON r2.s = r1.d AND r2.d = r1.s), "
        "scc AS (SELECT n.id, least(n.id, coalesce(min(m.u), n.id)) "
        "AS component FROM nodes n LEFT JOIN mutual m ON m.v = n.id "
        "GROUP BY n.id)"
    )


def condensation_depth_sql(edges_sql: str) -> str:
    """DuckDB twin of condensation_depth: the shared SCC closure CTEs
    plus a recursive longest-path walk over the condensed DAG (the
    recursion terminates because the condensation is acyclic)."""
    return (
        f"{scc_ctes_sql(edges_sql)}, "
        "ced AS (SELECT DISTINCT s1.component AS cs, s2.component AS cd "
        "FROM e JOIN scc s1 ON s1.id = e.src "
        "JOIN scc s2 ON s2.id = e.dst "
        "WHERE s1.component <> s2.component), "
        "sizes AS (SELECT component, count(*) AS n_nodes FROM scc "
        "GROUP BY component), "
        "paths(c, d) AS (SELECT component, 0 FROM sizes "
        "UNION SELECT ced.cd, p.d + 1 FROM paths p "
        "JOIN ced ON ced.cs = p.c) "
        "SELECT s.component, s.n_nodes, "
        "CAST(max(p.d) AS INT) AS depth FROM sizes s "
        "JOIN paths p ON p.c = s.component GROUP BY s.component, s.n_nodes"
    )
