"""Connected components over a pair list (engine extension): the dedup
completion step that turns near-dup PAIRS into CLUSTERS with one kept
representative each.

Spark has no built-in CC (GraphX is Scala-only, GraphFrames is an external
package), so this is the classic min-label propagation expressed in
DataFrame ops: every node repeatedly adopts the smallest label among itself
and its neighbors until a fixpoint. Each round is one shuffle (join on node
+ groupBy min); rounds needed = graph diameter. Near-dup graphs are
clique-like (a duplicated document links to most of its cluster directly),
so the fixpoint lands in 2-3 rounds regardless of corpus size — the
pathological long-chain case that makes plain propagation O(diameter) calls
for the large-star/small-star contraction algorithm (Kiveris et al., "CC in
MapReduce and Beyond"), noted here as the upgrade path, not implemented.

Driver involvement is one ``count()`` per round (the convergence check) —
O(diameter) tiny jobs, never data through the driver. Each round's labels are
``localCheckpoint(eager=True)``-ed, not merely persisted: persist caches the
DATA but the logical plan keeps the full multi-round lineage, so analysis/
AQE planning cost grows per round (measured: 1.7 s → 3.3 s per round at two
rounds; checkpointing flattens both to ~0.5 s). The prior round's checkpoint
is freed immediately, so peak storage is 2×|nodes| regardless of round
count. On a real cluster, swap ``localCheckpoint`` (executor-local, lost on
executor failure) for ``checkpoint()`` against reliable storage if rounds
are expensive enough to be worth replaying.

Broadcast joins are disabled inside the loop: each round's label table is
small enough that AQE would rebuild and re-broadcast it every round — a
driver round-trip per round that costs more than the narrow shuffle it
avoids (measured 2.3 s → 1.0 s for the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .dedup import _scoped_persist


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_rounds: int = 50
) -> DataFrame:
    """Undirected connected components of the (``a``, ``b``) pair list.

    Returns (node, component) for every node that appears in at least one
    edge, where component = the smallest node id in its component (a
    deterministic representative). Isolated nodes never appear in ``edges``
    and so are absent here — callers attach them with a left join +
    coalesce(component, node).
    """
    # Persist the raw edge list FIRST: the undirected union reads it twice
    # (once per direction), and edges often arrive as an expensive upstream
    # pipeline (e.g. the full MinHash near-dup DAG) that must not run twice.
    e = _scoped_persist(edges.select(F.col(a).alias("ea"), F.col(b).alias("eb")))
    und = _scoped_persist(
        e.select(F.col("ea").alias("src"), F.col("eb").alias("dst")).union(
            e.select(F.col("eb").alias("src"), F.col("ea").alias("dst"))
        )
    )
    # Size the loop's shuffle width from the MEASURED edge count (cheap: e is
    # cached by the count): a near-dup edge list is usually orders smaller
    # than its corpus, and each propagation round is several shuffle stages —
    # at session-default width, tiny graphs pay pure task-scheduling
    # overhead per round. Same pattern as run_stream_to_table's
    # state_partitions; restored after the loop, so only the (cached-input)
    # round jobs run narrow.
    spark = edges.sparkSession
    n_edges = e.count()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    loop_parts = max(2, min(int(prev_parts), n_edges // 50_000 + 2))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        labels = (
            und.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        labels = _propagate(und, labels, max_rounds)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    return labels.select("node", F.col("label").alias("component"))


def _propagate(und: DataFrame, labels: DataFrame, max_rounds: int) -> DataFrame:
    for _ in range(max_rounds):
        nbr_min = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        # eager localCheckpoint materializes the round AND truncates lineage,
        # so round N+1 plans against a flat scan, not an N-round-deep DAG
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("new_label"),
                F.col("label").alias("old_label"),
            )
            .select(
                "node",
                F.col("new_label").alias("label"),
                (F.col("new_label") != F.col("old_label")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(
            F.sum(F.col("_changed").cast("int")).alias("n")
        ).collect()[0]["n"]
        # the old round's checkpoint blocks are no longer reachable from the
        # new (truncated) plan — free them now to keep peak storage at 2×|nodes|
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    return labels
