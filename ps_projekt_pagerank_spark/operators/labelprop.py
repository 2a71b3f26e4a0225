"""Label propagation — synchronous, deterministic (north-rule extension;
contract = oracle.graph_algos.label_propagation).

init label(v)=v; each round every node simultaneously takes the most
frequent label among its deduplicated undirected neighbors, count-ties
broken by the SMALLEST label; isolated nodes keep theirs. Exactly
``rounds`` synchronous rounds (early exit when a round is a no-op).

The mode-of-neighbor-labels is the two-stage shape from SURVEY.md §2.5:
groupBy(node, label).count() then max_by — expressed with a single
max(struct(count, -label)) aggregation so ties resolve to the smallest
label without a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def label_propagation(edges: DataFrame, rounds: int = 5) -> DataFrame:
    """(id LONG, label LONG) after ``rounds`` synchronous rounds."""
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
    labels = nodes.select("id", F.col("id").alias("label")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    for rnd in range(rounds):
        votes = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy(F.col("src").alias("nid"), "label")
            .agg(F.count("*").alias("n"))
        )
        # argmax by (count asc, label desc) under max() = most frequent,
        # smallest label on ties
        winner = votes.groupBy("nid").agg(
            F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias("w")
        ).select("nid", (-F.col("w.neg")).alias("new_label"))

        stepped = (
            labels.join(winner, labels["id"] == winner["nid"], "left")
            .select(
                "id",
                F.coalesce("new_label", F.col("label")).alias("new_label"),
                F.col("label").alias("old_label"),
            )
        )
        # lineage truncation + changed-count in ONE action (the plan
        # references `labels` twice, so it must be cut every round)
        obs = Observation(f"lp_round_{rnd}")
        new_labels = (
            stepped.observe(
                obs,
                F.sum(
                    (F.col("new_label") != F.col("old_label")).cast("long")
                ).alias("changed"),
            )
            .select("id", F.col("new_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
