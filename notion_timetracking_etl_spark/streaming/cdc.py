"""Streaming CDC upsert via ``foreachBatch`` (engine extension): the
incremental-merge sink pattern — each micro-batch of an I/U/D changelog
merges into the accumulated snapshot state with last-write-wins semantics,
the loop a production deployment runs with MERGE INTO against a Delta/
Iceberg table. Here the merge target is an in-session DataFrame advanced
per batch (localCheckpoint pins each generation); the MERGE itself is the
same comparison-struct MAX as the batch CDC apply
(queries/cdc.py::apply_changelog), so stream and batch provably share
semantics.

Order independence is the load-bearing property: the winner per key is the
max (seq, ...) struct and DELETE rows ride along as tombstones until the
final read, so ANY split of the changelog into micro-batches — file order,
batch boundaries, replays — converges to the identical final state. That
is what makes the pattern safe under AvailableNow catch-up drains and
at-least-once sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

_MERGE_COLS = ("seq", "op", "price_micros", "status")


def merge_upsert_batch(acc: DataFrame | None, batch: DataFrame) -> DataFrame:
    """One MERGE step: union the accumulated winners with the arriving
    batch and re-take the per-key (seq, op, payload) struct MAX. DELETEs
    stay as tombstones (consumers filter at read) so later micro-batches
    can never resurrect a key by arriving after its delete."""
    merged = batch if acc is None else acc.unionByName(batch)
    return (
        merged.groupBy("k")
        .agg(F.max(F.struct(*_MERGE_COLS)).alias("_w"))
        .select("k", *[F.col(f"_w.{c}").alias(c) for c in _MERGE_COLS])
    )


def upsert_drain(
    spark: SparkSession,
    changelog_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
) -> tuple[DataFrame, int]:
    """Drain a changelog directory as a file stream (one file per
    micro-batch) through a ``foreachBatch`` MERGE loop; returns the final
    tombstone-inclusive state and the number of micro-batches seen."""
    schema = spark.read.parquet(changelog_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changelog_dir)
    )
    state: dict = {"acc": None, "batches": 0}

    def step(batch: DataFrame, _bid: int) -> None:
        state["batches"] += 1
        # localCheckpoint materializes this generation so the next batch's
        # merge never re-executes prior lineage (O(1) plan depth per batch)
        state["acc"] = merge_upsert_batch(state["acc"], batch).localCheckpoint()

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if not finished:
        # ADVICE r7: a timed-out drain must FAIL, not hand back whatever
        # subset of batches happened to merge — a partial accumulator is a
        # plausible-but-wrong table, strictly worse than an error.
        q.stop()
        raise TimeoutError(
            f"CDC drain did not finish within {timeout_s}s "
            f"({state['batches']} micro-batches applied); partial state "
            "discarded"
        )
    return state["acc"], state["batches"]
