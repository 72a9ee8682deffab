"""Connected components over near-duplicate pair sets — transitive dedup.

Pairwise near-dup operators (`jaccard_pairs_prefix`, `minhash_near_dups`,
`simhash_candidates`, `neardup_pairs_blas`) emit edges; keeping one doc
per *connected component* is the correct retention rule (dropping `d2` of
every pair over-deletes chains: A–B, B–C must keep exactly one of
{A,B,C}, and deletion decisions must agree across partitions).

Algorithm: iterative min-label propagation (the DataFrame form of
hash-to-min, cf. Kiveris et al. "Connected Components in MapReduce",
SoCC'14) with a POINTER-JUMPING hop each round (comp ← comp's own comp),
which squares the propagation distance per round — convergence in
O(log diameter) rounds, so ``max_iter=20`` covers diameters up to ~2^20
(plain neighbor propagation needs O(diameter) rounds and would silently
mislabel chains longer than max_iter).  The loop exits early on fixpoint
via a count of changed labels and RAISES if the budget is exhausted
before the fixpoint — wrong component labels must never be returned
silently.  Each round is two joins + one groupBy-min (all map-side
combinable); lineage is truncated with ``localCheckpoint`` so the plan
doesn't grow with iterations.

Scale: the edge relation is the operator's input size (candidate pairs,
already pruned by LSH/prefix filtering — orders of magnitude below the
corpus); labels are (node, long).  No driver-side state beyond the
per-round changed-count scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(node, component) for every node appearing in *pairs* (columns
    ``d1``, ``d2``); component = the minimum node id reachable."""
    edges = (pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
             .union(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
             .distinct()
             .localCheckpoint(eager=True))
    # size the per-round shuffles to the EDGE set, not the session default:
    # post-LSH pair sets are orders of magnitude below the corpus, and a
    # tiny label relation spread over many partitions pays per-round
    # scheduling latency × iterations for nothing
    n_edges = edges.count()
    parts = max(1, min(edges.rdd.getNumPartitions(),
                       int(n_edges // 100_000) + 1))
    edges = edges.repartition(parts, "b").localCheckpoint(eager=True)
    labels = (edges.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("comp", F.col("node")))
    changed = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select("node",
                    F.least(F.col("comp"),
                            F.coalesce(F.col("nbr_comp"), F.col("comp")))
                    .alias("comp"))
        )
        # pointer jump: comp ← label(comp).  comp is always a node id in the
        # labels relation (labels only ever shrink toward reachable minima),
        # so the hop is label-preserving and squares propagation distance.
        jump = stepped.select(F.col("node").alias("jn"),
                              F.col("comp").alias("jc"))
        new_labels = (
            stepped.join(jump, stepped["comp"] == jump["jn"], "left")
            .select("node",
                    F.least(F.col("comp"),
                            F.coalesce(F.col("jc"), F.col("comp")))
                    .alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        labels = new_labels
        if changed == 0:
            break
    if changed not in (0, None):
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter")
    return labels.select("node", "comp")


def cluster_representatives(pairs: DataFrame,
                            max_iter: int = 20) -> DataFrame:
    """(node, comp, keep): transitive dedup decision per clustered doc —
    ``keep`` is true only for the component's minimum id (the same
    min-id retention rule `exact_dedup` uses)."""
    cc = connected_components(pairs, max_iter)
    return cc.select("node", "comp", (F.col("node") == F.col("comp")).alias("keep"))
