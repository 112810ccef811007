"""Distributed connected components — the transitive-closure step
that turns PAIRWISE near-duplicate candidates (MinHash/SimHash/
embedding pairs) into true dedup GROUPS: if A~B and B~C, all three
are one cluster even though (A,C) was never emitted as a pair.

Algorithm: iterative minimum-label propagation (the standard
large-graph approach — e.g. GraphX/GraphFrames' connectedComponents;
"hash-to-min" in Rastogi et al., ICDE'13). Each node starts labeled
with itself; every round each node takes the min of its own label and
its neighbors' labels; fixpoint in O(diameter) rounds. Near-dup
graphs are unions of small dense clusters, so the diameter — and the
round count — is tiny in practice.

Scale shape per round: one keyed shuffle (edge⋈label join + groupBy
min). Labels are (node, long) pairs — the payload never travels.
``localCheckpoint`` truncates the plan each round: without it the
lineage doubles per iteration and the job eventually dies in the
optimizer, the classic iterative-DataFrame trap. Convergence is
detected by counting changed labels (one scalar action per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Compute components of the undirected graph given by ``edges``
    (two columns: src, dst — any orientation, duplicates fine).
    Returns (node, component) where component is the smallest node id
    in the node's component.

    Raises if the propagation hasn't converged after ``max_iter``
    rounds (diameter > max_iter — not a near-dup-cluster shape)."""
    src, dst = edges.columns[0], edges.columns[1]
    # symmetrize once; propagation then only needs one direction
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds"
    )


def neardup_groups(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Transitive near-dup grouping: pairwise candidates → components
    → every document labeled with its group representative (itself if
    it has no near-dup). Returns (doc_id, group_id, is_representative)
    — filter ``is_representative`` to keep one doc per group, the
    transitive completion of the pairwise keep-lowest rule."""
    comp = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("group_id"),
        )
        .withColumn("is_representative", F.col("doc_id") == F.col("group_id"))
    )
