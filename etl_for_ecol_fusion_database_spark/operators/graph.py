"""Connected components over near-duplicate pair graphs.

MinHash/SimHash/embedding dedup emits PAIRS (id_a, id_b, score); turning
pairs into duplicate CLUSTERS (one survivor per group of transitively-
linked documents) is a connected-components problem — the step every
production dedup pipeline needs between candidate scoring and row
deletion (a~b and b~c must collapse to ONE kept document even when a~c
was never scored).

Algorithm: iterative min-label propagation — every node repeatedly
adopts the smallest label in its closed neighborhood until a fixpoint.
Each round is one shuffle (groupBy node over the symmetric edge list);
rounds needed = graph diameter, and near-dup graphs are
small-diameter (clusters are near-cliques), so 3-5 rounds typically
suffice.  For adversarial long-chain graphs the same loop still
converges, just in O(diameter) rounds; the large-star/small-star
O(log n)-round variant can replace the body without changing the
interface if that regime ever matters.

Scale notes:
- the driver-side loop only inspects a single aggregated count per round
  (the convergence check) — labels never leave the cluster;
- lineage is truncated each round with ``localCheckpoint`` so the plan
  does not grow unboundedly (on a real cluster, a checkpoint dir makes
  this resilient as well as flat);
- edges are re-used as a cached symmetric relation — one materialization,
  ``diameter`` joins against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "id",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with the MIN node id reachable through ``pairs``
    (undirected); isolated nodes (in ``nodes`` but no pair) keep their own
    id.  Returns (``node_id``, cluster_id).

    Deterministic: the fixpoint is unique (min over a fixed reachable
    set), independent of partitioning and iteration order.

    Output is one row per DISTINCT node id: duplicate rows in ``nodes``
    are collapsed by the per-round ``groupBy`` (intentional since r13 —
    the pre-r13 implementation emitted one label row per duplicate input
    row; all in-repo callers pass distinct nodes, and the dedup is pinned
    by tests/test_round14_opt.py).

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds: min-label propagation needs ~diameter iterations,
    so a chain longer than ``max_iter`` hops would otherwise return
    silently WRONG labels (one logical component split into several
    cluster_ids — duplicates leaking through dedup with no signal).
    Raise ``max_iter`` for high-diameter graphs; near-dup graphs are
    normally shallow (dense cliques around each duplicate group).

    Round 13 (guide §2.4 — remove shuffles outright): the closed
    neighborhood is encoded as SELF-LOOP rows in the cached edge
    relation, so one round is ONE equi-join + ONE groupBy —
    ``min(label)`` over each node's closed neighborhood — instead of
    the earlier join → groupBy → second left-join back onto the label
    relation (5 exchanges/round → 3).  The self row also carries the
    node's round-start label out of the aggregation (``_old``), so the
    convergence check is a row-local comparison on the checkpointed
    round output — no extra join, and labels are monotone
    non-increasing, so ``new < old`` on some row is exactly the old
    ``neighbor_min < label`` condition.  Fixpoint, tie rules and the
    output relation are unchanged (min reachable id per node; nodes
    absent from ``nodes`` still never enter or relay labels — a pair
    endpoint without a self row is dropped by the ``_old`` filter, and
    its label never existed to be joined).
    """
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct()
    edges = (
        sym.select("src", "dst", F.lit(False).alias("is_self"))
        .unionByName(
            nodes.select(
                F.col(node_id).alias("src"),
                F.col(node_id).alias("dst"),
                F.lit(True).alias("is_self"),
            )
        )
        .cache()
    )
    # seed labels stay LAZY: round 1's localCheckpoint materializes the
    # whole chain anyway, so an eager seed checkpoint is one pure-overhead
    # job per call (round 13)
    labels = nodes.select(
        F.col(node_id).alias("node"), F.col(node_id).alias("cluster_id")
    )
    for _ in range(max_iter):
        # min label over each node's CLOSED neighborhood (self row included)
        grouped = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                F.min(F.when(F.col("is_self"), F.col("cluster_id"))).alias("_old"),
            )
            .filter(F.col("_old").isNotNull())
        ).localCheckpoint(eager=True)
        changed = grouped.filter(F.col("cluster_id") < F.col("_old")).limit(1).count()
        labels = grouped.drop("_old")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (labels still propagating — the graph has a component "
            "with diameter above max_iter); returning here would silently "
            "split one component into several clusters. Raise max_iter."
        )
    edges.unpersist()
    return labels.select(F.col("node"), F.col("cluster_id"))


def dup_clusters_summary(components: DataFrame) -> DataFrame:
    """Cluster rollup: (cluster_id, n_members, survivor) where the
    survivor is the min-id member — the row a dedup pass would KEEP.
    One shuffle on cluster_id."""
    return components.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("survivor"),
    )
