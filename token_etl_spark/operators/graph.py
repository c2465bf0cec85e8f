"""Distributed connected components — clusters near-duplicate pairs into
groups (the step after MinHash/SimHash pair generation: "keep one doc
per duplicate cluster").

Algorithm: min-label propagation with pointer doubling (each round every
node takes the min of its neighbors' labels AND its label's label) —
O(log diameter) rounds, each one join + one aggregation hash-partitioned
on the node id. Near-dup clusters have tiny diameters (pairs/triangles),
so 2-3 rounds close a real dedup graph. Lineage is truncated with
localCheckpoint every round — iterative Spark algorithms otherwise nest
plans until planning time dominates.

This is the standard Spark-native CC shape (GraphFrames implements the
same idea with large-star/small-star optimizations for long chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """(id_a, id_b) edges → (id, component) with component = min node id
    in the component. Converges in O(diameter) rounds (capped)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("component"))
        .select(F.col("u").alias("id"), F.least("component", F.col("u")).alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # hop: min label among neighbors
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("neighbor_min"))
        )
        hopped = labels.join(neighbor_min, labels.id == neighbor_min.u, "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("neighbor_min"), F.col("component"))
            ).alias("component"),
        )
        # pointer doubling: component ← component's component (turns
        # O(diameter) rounds into O(log diameter))
        parent = labels.select(
            F.col("id").alias("cid"), F.col("component").alias("cc")
        )
        doubled = hopped.join(parent, hopped.component == parent.cid, "left").select(
            "id",
            F.least(F.col("component"), F.coalesce(F.col("cc"), F.col("component"))).alias(
                "component"
            ),
        )
        # localCheckpoint truncates lineage — without it each round's plan
        # nests the previous one and planning time grows without bound.
        new_labels = doubled.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_list(pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full-dataset dedup decision: every id → (id, keep) where keep is
    true for the representative (min id) of its duplicate cluster and for
    all singletons (ids appearing in no pair)."""
    comps = connected_components(pairs)
    reps = comps.groupBy("component").agg(F.min("id").alias("rep"))
    decided = comps.join(reps, "component").select(
        F.col("id").alias(id_col), (F.col("id") == F.col("rep")).alias("keep")
    )
    singletons = all_ids.select(id_col).join(decided.select(id_col), id_col, "left_anti")
    return decided.unionByName(singletons.withColumn("keep", F.lit(True)))


def keep_list_from_components(
    comps: DataFrame, all_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """``dedup_keep_list`` for a precomputed (id, component) frame (e.g.
    ``minhash_dedup_clusters`` output) — skips the redundant component
    pass: keep = (id == component, the cluster min) plus all singletons."""
    decided = comps.select(
        F.col("id").alias(id_col), (F.col("id") == F.col("component")).alias("keep")
    )
    singletons = all_ids.select(id_col).join(decided.select(id_col), id_col, "left_anti")
    return decided.unionByName(singletons.withColumn("keep", F.lit(True)))
