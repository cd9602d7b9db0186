"""Connected components by iterative min-label propagation — the cluster
step of every near-duplicate pipeline (MinHash/SimHash/embedding pair sets
→ duplicate CLUSTERS → keep one survivor per cluster).

Spark has no native iterative-fixpoint operator; the idiomatic shape is a
DRIVER loop where each iteration is fully distributed DataFrame algebra
(join + min-aggregate) and the only driver-side value is the converged?
scalar. Two scale guards that matter at 10^9-edge graphs:

- lineage must be CUT periodically (localCheckpoint; a reliable
  checkpoint dir on a real cluster): without it the plan tree doubles per
  iteration and Catalyst analysis itself becomes the bottleneck;
- each iteration's shuffle is keyed by node id (bounded width), and the
  label can only DECREASE, so convergence needs at most
  diameter(component) rounds — near-dup clusters are shallow (pairs share
  a bucket), typically 2-5 rounds.

The min-reachable-id label is engine-independent, so a DuckDB recursive
CTE over the same edge set is a FULL value oracle (see
queries_r3.q_near_dup_components).

Reference analog: none (inspectEHR flags duplicates pairwise only); part
of the beyond-reference training-data operator set (SURVEY §8)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Components of the undirected graph given by `edges`: returns
    (node, component) for every node incident to an edge, where
    `component` = the smallest node id reachable from it.

    Raises RuntimeError if `max_iter` rounds don't converge (pathological
    diameter — raise the cap or pre-bucket the graph)."""
    bidir = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        bidir.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    try:
        for it in range(max_iter):
            neigh_min = (
                bidir.join(labels, bidir["b"] == labels["node"])
                .groupBy(F.col("a").alias("node2"))
                .agg(F.min("label").alias("_nmin"))
            )
            stepped = (
                labels.join(neigh_min, labels["node"] == F.col("node2"), "left")
                .select(
                    "node",
                    F.least("label", F.coalesce("_nmin", "label")).alias("label"),
                    (F.coalesce("_nmin", "label") < F.col("label")).alias("_chg"),
                )
            )
            if (it + 1) % checkpoint_every == 0:
                stepped = stepped.localCheckpoint(eager=False)
            stepped = stepped.persist()
            changed = stepped.agg(
                F.sum(F.col("_chg").cast("long")).alias("n")
            ).first()["n"]
            # unpersist the frame that was ACTUALLY persisted last round —
            # unpersisting a projection of it would leak the parent cache
            labels.unpersist()
            labels = stepped  # extra _chg column is ignored by the joins
            if not changed:
                return labels.select("node", F.col("label").alias("component"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    finally:
        bidir.unpersist()
