"""Connected components — transitive closure of candidate-pair edges.

Near-dup candidate pairs (MinHash/SimHash/embedding) form a graph;
the true dedup clusters are its connected components (pairwise greedy
drops under-merge: a~b, b~c must collapse all three). This is the
engine's one genuinely *iterative* operator: min-label propagation
(each node repeatedly takes the minimum label in its closed
neighborhood) — the dataframe-native form of union-find, converging
in O(graph diameter) rounds.

Scale notes, per round:
* one shuffle to join labels to the bidirectional edge list, one
  partial-aggregating groupBy for the neighborhood minimum — labels
  and edges are narrow (two longs);
* ``localCheckpoint`` after every round truncates lineage — without
  it the plan doubles per iteration and the driver dies planning
  round ~20 long before the data is the problem;
* convergence is an aggregate (count of changed labels), so each
  round is exactly one job. Diameter of near-dup graphs is tiny
  (dup clusters are cliques-ish); ``max_iter`` guards pathological
  chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """DF[node, component] — component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough);
    isolated nodes don't appear (callers union them back if needed).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    bidir = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    bidir = bidir.localCheckpoint(eager=True)

    labels = (
        bidir.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            bidir.join(labels, bidir.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left_outer")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        ).localCheckpoint(eager=True)
        changed = updated.where(F.col("new_component") != F.col("component")).count()
        labels = updated.select("node", F.col("new_component").alias("component"))
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    return labels
