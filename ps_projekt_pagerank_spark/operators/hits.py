"""HITS (hubs & authorities) — link-analysis sibling of PageRank
(north-rule extension; no reference counterpart — the reference computes
PageRank only, Graph.cpp:118-173 — but any link-graph engine user asks for
HITS next; Kleinberg, "Authoritative Sources in a Hyperlinked
Environment", JACM 1999).

Fixed synchronous iterations on the weighted multigraph adjacency
(duplicate links add weight, consistent with the PageRank scatter):

    auth(v) ← Σ_{u→v} w(u,v)·hub(u)      then auth ← auth / max(auth)
    hub(u)  ← Σ_{u→v} w(u,v)·auth(v)     then hub  ← hub  / max(hub)

Normalization is by MAX, not L2: max of per-node sums is reproducible
across engines regardless of float summation order (an L2 norm is a
global sum whose order differs between Spark partitions and any other
engine), which is what makes the DuckDB oracle twin hash-stable. Exactly
``iterations`` rounds, unrollable as ANSI SQL CTEs.

Scale shape: identical to the PageRank sweep — the |E|-row weighted
adjacency is built once, src-partitioned and persisted (build_graph);
each half-round shuffles only the |V|-row score state, gathers via a
two-phase hash agg (map-side combine), and the max is a scalar agg
piggybacked on the same pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .graph import GraphTables, build_graph


def hits(
    edges: DataFrame,
    iterations: int = 4,
    graph: GraphTables | None = None,
) -> DataFrame:
    """(id LONG, auth DOUBLE, hub DOUBLE) after ``iterations`` rounds,
    max-normalized each half-round; nodes with no in-links (out-links)
    hold auth=0 (hub=0)."""
    if iterations < 1:
        raise ValueError(f"hits needs iterations >= 1, got {iterations}")
    own_graph = graph is None
    g = graph or build_graph(edges)
    adj = g.adj.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("w").cast("double").alias("w"),
    )
    nodes = g.nodes.select(F.col("id").cast("long").alias("id"))

    hub = nodes.select("id", F.lit(1.0).alias("hub"))
    auth = prev_a = prev_h = None
    for k in range(iterations):
        # ONE action per half-round: the max scalar rides the eager
        # localCheckpoint of the RAW gather as an Observation (the
        # observed frame IS the checkpointed one — a metric attached to a
        # frame behind the checkpoint's RDD boundary would never publish);
        # the normalized frame stays lazy (a cheap |V|-row join off the
        # cache) and the checkpoint doubles as the per-half-round lineage
        # cut. Spent half-rounds are unpersisted one round later, once
        # nothing lazy can still reference them.
        obs_a = Observation(f"hits_a_{k}")
        raw_a = (
            adj.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("hub")).alias("a"))
            .observe(obs_a, F.max("a").alias("m"))
            .localCheckpoint(eager=True)
        )
        if prev_a is not None:
            prev_a.unpersist()
            prev_h.unpersist()
        amax = float(obs_a.get["m"] or 1.0)
        auth = nodes.join(raw_a, "id", "left").select(
            "id",
            (F.coalesce("a", F.lit(0.0)) / F.lit(amax)).alias("auth"),
        )
        obs_h = Observation(f"hits_h_{k}")
        raw_h = (
            adj.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("w") * F.col("auth")).alias("h"))
            .observe(obs_h, F.max("h").alias("m"))
            .localCheckpoint(eager=True)
        )
        hmax = float(obs_h.get["m"] or 1.0)
        hub = nodes.join(raw_h, "id", "left").select(
            "id",
            (F.coalesce("h", F.lit(0.0)) / F.lit(hmax)).alias("hub"),
        )
        prev_a, prev_h = raw_a, raw_h
    out = auth.join(hub, "id")
    if own_graph:
        g.unpersist()
    return out


def hits_sql(edges_sql: str, iterations: int = 4) -> str:
    """The exact ANSI-SQL twin of ``hits`` (DuckDB oracle): same weighted
    adjacency, same max normalization (incl. the empty/zero-max → 1.0
    fallback), unrolled CTE chain. Final scores rounded to 6 dp (matching
    the gate query's projection)."""
    if iterations < 1:
        raise ValueError(f"hits_sql needs iterations >= 1, got {iterations}")
    # every CTE is MATERIALIZED: each round references the previous one
    # from several places, and DuckDB's default inlining would otherwise
    # re-expand the chain exponentially across rounds
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "w AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w "
        "FROM e GROUP BY src, dst)",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id "
        "FROM e UNION ALL SELECT dst AS id FROM e))",
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM nodes)",
    ]
    for k in range(iterations):
        parts += [
            f"ar{k} AS MATERIALIZED (SELECT w.dst AS id, sum(w.w * h.hub) "
            f"AS a FROM w JOIN h{k} h ON w.src = h.id GROUP BY w.dst)",
            f"am{k} AS MATERIALIZED (SELECT max(a) AS m FROM ar{k})",
            f"a{k + 1} AS MATERIALIZED (SELECT n.id, coalesce(ar.a, 0) / "
            f"coalesce(nullif((SELECT m FROM am{k}), 0), 1.0) AS auth "
            f"FROM nodes n LEFT JOIN ar{k} ar ON ar.id = n.id)",
            f"hr{k} AS MATERIALIZED (SELECT w.src AS id, sum(w.w * a.auth) "
            f"AS h FROM w JOIN a{k + 1} a ON w.dst = a.id GROUP BY w.src)",
            f"hm{k} AS MATERIALIZED (SELECT max(h) AS m FROM hr{k})",
            f"h{k + 1} AS MATERIALIZED (SELECT n.id, coalesce(hr.h, 0) / "
            f"coalesce(nullif((SELECT m FROM hm{k}), 0), 1.0) AS hub "
            f"FROM nodes n LEFT JOIN hr{k} hr ON hr.id = n.id)",
        ]
    return ",\n".join(parts) + (
        f"\nSELECT a.id, round(a.auth, 6) AS auth, round(h.hub, 6) AS hub "
        f"FROM a{iterations} a JOIN h{iterations} h ON a.id = h.id"
    )
