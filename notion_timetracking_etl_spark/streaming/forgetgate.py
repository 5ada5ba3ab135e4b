"""Streaming right-to-be-forgotten sweeps via ``foreachBatch`` (engine
extension, r11 verdict task #4).

Every batch forget sweep (queries/forget.py) has a production reality the
one-shot form hides: RTBF requests arrive CONTINUOUSLY, in waves, and the
persisted surfaces must converge to the same state a single batch sweep of
the full tombstone set would produce. This module runs that loop: tombstone
waves stage as files (one file per micro-batch), drain with
``Trigger.AvailableNow`` + ``maxFilesPerTrigger=1``, and each micro-batch
applies its deletions to the in-session persisted state — the stitched
post-stream state is then hash-compared against the one-shot sweep.

Order independence per surface:

- **Signature lake** (visual gate state): the sweep is a pure anti-join
  filter; the final state is the corpus minus the UNION of all waves —
  any wave split converges to the identical lake.
- **KMV sketch lake**: each wave rebuilds the partials of the date
  partitions ITS users appear in, excluding every tombstone seen SO FAR.
  A date's final version is written by the last wave touching it; users
  from later waves never appear in dates they do not touch, so each
  touched date's final partial excludes exactly the tombstoned users that
  appear in it — the stitched lake equals the one-shot sweep's for ANY
  wave split (pinned under a forced 1-user-per-batch split in tests).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def tombstone_drain(
    spark: SparkSession,
    waves_dir: str,
    checkpoint_dir: str,
    step_fn: Callable[[DataFrame], None],
    timeout_s: int = 300,
) -> int:
    """Drain a staged tombstone-wave directory (one file per micro-batch)
    through ``step_fn``; returns the number of micro-batches applied. The
    caller owns all state mutation inside ``step_fn`` (localCheckpoint per
    generation keeps plan depth O(1), the CDC-merge discipline). A timed-out
    drain FAILS — partial sweep state is a plausible-but-wrong lake."""
    schema = spark.read.parquet(waves_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(waves_dir)
    )
    state = {"batches": 0}

    def step(batch: DataFrame, _bid: int) -> None:
        state["batches"] += 1
        step_fn(batch)

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"tombstone drain did not finish within {timeout_s}s "
            f"({state['batches']} micro-batches applied); partial sweep "
            "state discarded"
        )
    return state["batches"]
