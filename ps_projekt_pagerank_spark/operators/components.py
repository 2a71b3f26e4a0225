"""Connected components — iterative min-label propagation (north-rule
extension; no reference counterpart, contract = oracle.graph_algos.
connected_components: component id = min node id reachable undirected).

Same gather/scatter skeleton as PageRank with the aggregate swapped for
``min`` (SURVEY.md §2.5): per round every node takes the minimum of its own
label and its undirected neighbors' labels; converged when a round changes
no label. Label values only decrease and the minimum propagates one hop per
round, so rounds ≤ graph diameter. The symmetrized adjacency is built once,
partitioned by src and persisted; each round shuffles only the |V|-row
label state (broadcast at small |V|).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    max_rounds: int = 200,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """(id LONG, component LONG) — min reachable id, undirected.

    Min-label propagation: one round moves the minimum one hop, so rounds
    ≤ graph diameter. One Spark action per round — the changed-count is
    computed in-plan (new vs old label in the commit projection) and
    collected via an Observation on the same localCheckpoint job, exactly
    like the PageRank loop. For diameter-unbounded web graphs prefer
    ``connected_components_star`` (O(log n) rounds).

    ``init_labels`` (id, component) warm-starts from a previous run's
    output — the crawl-loop amortization (same contract as PageRank's
    ``init_ranks``): labels only decrease, so a prior min-id labeling is
    a valid upper bound; unchanged components converge in ZERO productive
    rounds (round 1 is the counted no-op sweep). Merges are NOT
    shortcut — the winning min still propagates hop-by-hop, so a batch
    that merges two components costs up to the merged diameter in rounds
    (use ``connected_components_star`` when deltas routinely merge large
    components). ADDITIONS-ONLY: a removed edge can split a component,
    and min-label can never raise a label — rebuild cold after
    deletions. Nodes absent from ``init_labels`` (newly discovered)
    start at their own id.
    """
    sym = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionAll(
            edges.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    if init_labels is not None:
        labels = (
            nodes.join(
                init_labels.select("id", F.col("component").alias("_w")),
                "id",
                "left",
            )
            .select(
                "id", F.coalesce("_w", F.col("id")).alias("component")
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    else:
        labels = nodes.select("id", F.col("id").alias("component")).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    for rnd in range(max_rounds):
        neigh_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy(F.col("src").alias("nid"))
            .agg(F.min("component").alias("nmin"))
        )
        stepped = (
            labels.join(neigh_min, labels["id"] == neigh_min["nid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("new_component"),
                F.col("component").alias("old_component"),
            )
        )
        obs = Observation(f"cc_round_{rnd}")
        # lineage truncation + changed-count in ONE action
        new_labels = (
            stepped.observe(
                obs,
                F.sum(
                    (F.col("new_component") != F.col("old_component")).cast(
                        "long"
                    )
                ).alias("changed"),
            )
            .select("id", F.col("new_component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def connected_components_star(
    edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """(id LONG, component LONG) — alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    converges in O(log n) rounds independent of graph diameter — the scale
    path for web graphs where min-label propagation's O(diameter) rounds
    are unbounded. Output contract identical to connected_components
    (component id = min reachable id), verified against the same oracle.

    Each round rewrites the edge set:
    - large-star: for every neighbor v of u with v > min-neighborhood m(u)
      (including u itself), emit (v, m(u)) — hangs big nodes under the min;
    - small-star: for every neighbor v ≤ u, emit (v, m(u)).
    Fixed point: a forest of depth-1 stars = (node, component) pairs.
    """
    # undirected simple edge set, no self-loops
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    cur = e
    prev_n = e.count()  # carried across rounds; each round's Observation
    converged = False   # supplies the next comparison — no re-count action
    for rnd in range(max_rounds):
        # large-star: group by u over BOTH orientations; m = min(neighbors+u)
        both = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = both.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            both.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star on the large-star output
        both2 = large.select(
            F.col("b").alias("u"), F.col("a").alias("v")
        ).unionAll(large.select(F.col("a").alias("u"), F.col("b").alias("v")))
        m2 = both2.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        small_pairs = both2.join(m2, "u").where(F.col("v") <= F.col("u"))
        small = (
            small_pairs.select(F.col("m").alias("a"), F.col("v").alias("b"))
            .unionAll(
                small_pairs.select(
                    F.col("m").alias("a"), F.col("u").alias("b")
                )
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        obs = Observation(f"star_round_{rnd}")
        new_cur = small.observe(
            obs, F.count("*").alias("n")
        ).localCheckpoint(eager=True)
        n_edges = int(obs.get["n"] or 0)
        # converged when the edge set is stable (star fixed point): compare
        # via anti-join only when sizes already match
        if n_edges == prev_n:
            diff = new_cur.join(cur, ["a", "b"], "left_anti").limit(1).count()
            if diff == 0:
                cur = new_cur
                converged = True
                break
        cur = new_cur
        prev_n = n_edges
    if not converged:
        warnings.warn(
            f"connected_components_star: no fixed point within {max_rounds} "
            "rounds — components may be non-minimal; raise max_rounds",
            stacklevel=2,
        )

    # cur is now (component_min, member) star edges; isolated nodes and the
    # component roots themselves map to their own id
    comp = cur.select(F.col("b").alias("id"), F.col("a").alias("component"))
    out = (
        nodes.join(comp, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
        # materialize (|V| rows) so both persisted inputs release eagerly
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    nodes.unpersist()
    return out


def component_size_histogram(
    labels: DataFrame, label_col: str = "component"
) -> DataFrame:
    """(size BIGINT, n_components BIGINT) — how many components have each
    member count. The power-law sanity report any web-graph pipeline runs
    right after CC (Broder et al., WWW'00 report exactly this table).

    Scale: two hash aggregations — |V| rows → |C| rows → |distinct size|
    rows, both map-side combinable; no joins, no windows.
    """
    return (
        labels.groupBy(F.col(label_col).alias("_c"))
        .agg(F.count("*").alias("size"))
        .groupBy("size")
        .agg(F.count("*").alias("n_components"))
    )


def component_summary(
    labels: DataFrame, label_col: str = "component"
) -> DataFrame:
    """One row (n_nodes, n_components, giant_size, giant_fraction) — the
    giant-component headline number (fraction of nodes in the largest
    component). giant_fraction is one IEEE int64/int64 division, so any
    engine reproduces it bit-for-bit.

    Scale: one |V|-row hash agg to |C| rows, then a single-row global agg.
    """
    sizes = labels.groupBy(F.col(label_col).alias("_c")).agg(
        F.count("*").alias("size")
    )
    return sizes.agg(
        F.sum("size").alias("n_nodes"),
        F.count("*").alias("n_components"),
        F.max("size").alias("giant_size"),
    ).select(
        "n_nodes",
        "n_components",
        "giant_size",
        (
            F.col("giant_size").cast("double")
            / F.col("n_nodes").cast("double")
        ).alias("giant_fraction"),
    )
