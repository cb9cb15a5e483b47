"""Distributed connected components — duplicate-cluster resolution.

Near-dedup candidate generation (minhash / simhash / jaccard /
embedding LSH in :mod:`.dedup` and :mod:`.similarity`) yields *pairs*;
turning pairs into clusters (so one canonical survivor is kept per
group, even when A~B and B~C but A!~C) is a connected-components
problem.  At corpus scale the edge set does not fit one machine, so
this is the classic iterative min-label propagation on DataFrames:

  label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint.  Each iteration is one shuffle (groupBy dst);
iteration count is the graph diameter, which for near-dup graphs is
tiny (duplicate clusters are dense, diameters of 2-4).  Lineage is
truncated every iteration with ``localCheckpoint`` — without it the
plan doubles per round and the driver dies at iteration ~15 long
before the cluster does.

Spark has no built-in CC (GraphX is RDD/Scala-only, GraphFrames is an
external package); this is the DataFrame-native equivalent of the
GraphFrames/Pregel formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "assign_components"]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list to (node, component) where
    ``component`` is the minimum node id reachable from ``node``.

    Converges in O(diameter) rounds; raises if ``max_iterations`` is
    hit with labels still moving (a near-dup graph that deep means the
    threshold is catastrophically loose — fail loudly, not wrong).
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component"))
                .alias("__moved"),
            )
            .localCheckpoint(eager=True)
        )
        moved = updated.filter(F.col("__moved")).limit(1).count()
        labels = updated.drop("__moved")
        if moved == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def assign_components(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_col: str = "component",
) -> DataFrame:
    """Attach a duplicate-cluster id to every row of ``df``: members of
    a near-dup cluster share the minimum id in the cluster, untouched
    rows are their own singleton component.  Keeping
    ``filter(col(id) == col(out_col))`` afterwards is exact canonical
    dedup over transitive duplicate relations.
    """
    comp = connected_components(pairs, src, dst)
    return (
        df.join(comp, df[id_col] == comp.node, "left")
        .drop("node")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col(id_col)))
    )
