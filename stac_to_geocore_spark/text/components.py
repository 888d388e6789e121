"""Connected components over near-duplicate pair sets — dedup clustering.

Pairwise near-dup detection (MinHash/LSH, embedding LSH) yields edges; the
training-data pipeline needs CLUSTERS (keep one canonical doc per
component). This is iterative min-label propagation expressed entirely in
DataFrame ops — the standard Spark shape for connected components at scale
(GraphFrames uses the same alternating propagation):

  labels(node) = node                                   # init
  repeat: labels(node) = min(labels(node), min over neighbors labels(nb))
  until no label changes.

Each round is one shuffle on node id (join + groupBy share the key, AQE
reuses the exchange); rounds needed = graph diameter, and near-dup
components are tiny (pairs/cliques), so 2-4 rounds in practice. Labels are
persisted per round and the previous round unpersisted — the lineage stays
flat no matter how many rounds run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id_a, id_b) undirected edges -> (node, comp) where comp is the
    minimum node id reachable from `node`. Nodes are everything appearing
    in the pair set (isolated docs are not emitted — they are their own
    singleton component by definition)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    try:
        converged = False
        for _ in range(max_iter):
            # each node pulls the smallest label among itself + neighbors
            nb = (
                edges.join(labels, edges.dst == labels.node)
                .select(F.col("src").alias("node"), "comp")
            )
            new_labels = (
                labels.unionByName(nb)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
                .persist()
            )
            # full count (not limit-1) so new_labels is completely
            # materialized into its cache before the old cache is dropped
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            # a silently-split component would leak duplicates downstream
            # (multiple 'keepers' in one true cluster) — fail loudly instead
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds: "
                "a component's diameter exceeds max_iter — raise max_iter"
            )
        return labels.select("node", "comp")
    finally:
        edges.unpersist()


def dedup_keepers(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Canonical-doc selection: every near-dup component keeps its minimum
    id; returns (node, comp, keep) for all clustered docs."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.withColumn("keep", F.col("node") == F.col("comp"))
