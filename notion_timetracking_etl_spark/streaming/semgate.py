"""Streaming SemDeDup ingest gate via ``foreachBatch`` (engine extension).

The batch gate (queries/kmeans.py::semdedup_incremental) flags an arriving
vector when a corpus vector in its refined quantizer cell is cosine-similar
above threshold. This module runs the same gate INCREMENTALLY: arriving
embeddings stream in micro-batches, each batch routes through the two-level
quantizer (broadcast k-means centroids + a fixed SRP refinement-bit count —
the ingest-time corpus scalar) and joins ONLY the refined-cell corpus
representatives, exactly like the batch plan.

Order independence is structural: each arrival's verdict depends on
(arrival, corpus routing table) alone, never on other arrivals, so ANY
split of the arrival set into micro-batches unions to the identical verdict
set — stream-merged == batch gate under forced splits (pinned in
tests/test_round9.py), and the batch query's oracle serves unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def semdedup_gate_drain(
    spark: SparkSession,
    stream: DataFrame,
    corpus: DataFrame,
    route_fn: Callable[[DataFrame], DataFrame],
    threshold: float,
    checkpoint_dir: str,
    timeout_s: int = 300,
) -> tuple[DataFrame | None, int]:
    """Drain arriving embeddings through the per-batch quantizer routing +
    refined-cell gate; returns (verdicts, n_micro_batches).

    ``stream``: streaming (vec_id, embedding) arrivals. ``corpus``: the
    (cell, matched_vec, vc, nc) routing table — the persisted state a
    production ingest holds between batches. ``route_fn(batch) -> (cell,
    vec_id, vb, nb)`` encapsulates the quantizer (broadcast centroids +
    SRP bits) so this drain stays model-agnostic.

    Per batch the gate emits each flagged arrival's best corpus match
    (highest cosine, tie to smallest corpus id — the comparison-struct MAX
    shared with the batch query). Arrivals are disjoint across batches, so
    the accumulator is a plain union; ``localCheckpoint`` per generation
    keeps plan depth O(1) like the CDC merge loop (streaming/cdc.py).
    """
    from ..operators.similarity import cosine_prenormed

    state: dict = {"acc": None, "batches": 0}

    def step(batch: DataFrame, _bid: int) -> None:
        state["batches"] += 1
        routed = route_fn(batch)
        pairs = routed.join(corpus, "cell").select(
            "cell",
            "vec_id",
            "matched_vec",
            cosine_prenormed(
                F.col("vb"), F.col("vc"), F.col("nb"), F.col("nc")
            ).alias("cos"),
        ).filter(F.col("cos") >= threshold)
        best = (
            pairs.groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("cos"),
                        (-F.col("matched_vec")).alias("nm"),
                        F.col("cell").alias("cell"),
                    )
                ).alias("m")
            )
            .select(
                "vec_id",
                F.col("m.cell").alias("cell"),
                (-F.col("m.nm")).alias("matched_vec"),
                F.col("m.cos").alias("cos"),
            )
        )
        acc = state["acc"]
        merged = best if acc is None else acc.unionByName(best)
        state["acc"] = merged.localCheckpoint()

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        # a timed-out drain must FAIL, not return a partial verdict set
        # (ADVICE r7 class — partial state is plausible-but-wrong)
        raise TimeoutError(
            f"semdedup gate drain did not finish within {timeout_s}s "
            f"({state['batches']} micro-batches applied); partial state "
            "discarded"
        )
    return state["acc"], state["batches"]
