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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(edges: DataFrame, max_rounds: int = 200) -> DataFrame:
    """(id LONG, component LONG) — min reachable id, undirected."""
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
    labels = nodes.select("id", F.col("id").alias("component")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    for _ in range(max_rounds):
        neigh_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy(F.col("src").alias("nid"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels["id"] == neigh_min["nid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
            )
        )
        # truncate lineage every round — the plan references `labels` twice
        # (propagate + commit join) and would otherwise double per round
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
