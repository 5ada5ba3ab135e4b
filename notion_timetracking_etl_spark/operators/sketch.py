"""Frequency-sketch operators (engine extension): Misra-Gries heavy hitters
with exact verification.

Finding all items with frequency > n/k by a full ``groupBy(item).count()``
shuffles the ENTIRE item stream — at 100 TB that is the dominant cost when the
item universe is huge (tokens, URLs, user agents) but the answer is tiny. The
two-phase sketch pattern here mirrors the dedup family's candidates-then-verify
shape:

1. **Candidate generation, map-side**: each partition runs the Misra-Gries
   summary (k counters) over its local stream inside one Arrow-batched
   ``mapInPandas`` stage and emits at most k candidate items — kilobytes per
   partition, no shuffle of the raw stream. MG guarantee (Misra & Gries 1982):
   any item with local frequency > n_p/k survives partition p's summary; since
   a globally-heavy item (count > n/k = sum_p n_p/k) must be locally heavy in
   at least one partition (pigeonhole), the union of partition candidates is a
   superset of the true heavy hitters.
2. **Exact verification**: semi-join the stream on the (tiny, broadcast)
   candidate set, count exactly, and keep items with ``count * k > n`` — an
   integer comparison, so the result is deterministic, partitioning-independent
   and cross-engine exact (no division).

Only phase 2 shuffles, and only the candidate-matching rows enter it.

Reference scope note: the reference engine has no sketch operators; this
module is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

CANDIDATE_SCHEMA = "item string"


def misra_gries_candidates(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``k`` candidate items per
    partition, produced map-side (no shuffle). ``items`` is a one-column-of-
    interest stream; rows with null items are ignored.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[item_col].dropna():
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters.keys())})

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        summarize, CANDIDATE_SCHEMA
    )


def heavy_hitters(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """All items with frequency strictly greater than n/k, with exact counts.

    Output: (item string, cnt bigint) — exact, deterministic, independent of
    partitioning (the MG phase only proposes candidates; membership is decided
    by the exact ``cnt * k > n`` integer comparison).
    """
    stream = items.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    candidates = misra_gries_candidates(stream, "item", k).distinct()
    exact = (
        stream.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = stream.select(F.count(F.lit(1)).alias("n"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("n"))
        .select("item", "cnt")
    )
