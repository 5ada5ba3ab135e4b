"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for semantics Spark's built-in windowed aggregations can't
express: arbitrary per-key state evolved across micro-batches. Here: running
per-user statistics (event count, value sum, last-seen timestamp) maintained
in a compact numeric state tuple. State is partitioned by user_id, so the
operator scales horizontally; Arrow batching keeps the Python boundary
vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value_micros", LongType(), True),
        StructField("last_ts_micros", LongType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total_micros", LongType(), True),
        StructField("last_micros", LongType(), True),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterator, state: GroupState
) -> Iterator:
    """Fold this batch's events into the persistent per-user state.

    Values accumulate in integer micros — exact, order-independent, and
    identical to what a batch groupBy computes, which is what makes the
    stream/batch equivalence testable bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    n, total_micros, last_micros = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += int(len(pdf))
        # per-ROW micro rounding, then integer sum: exact and order-independent
        # (a float total rounded once would drift with partition order).
        # floor(x*1e6 + 0.5) is HALF_UP — the same rule as F.floor(col*1e6+0.5)
        # in the batch twin; pandas .round() would be half-to-even.
        # NULL values are skipped like SQL SUM (NaN would poison the int
        # cast); NULL timestamps likewise drop out of the running max.
        vals = pdf["value"].dropna()
        if len(vals):
            total_micros += int(
                np.floor(vals * 1_000_000 + 0.5).astype("int64").sum()
            )
        ts_vals = pdf["ts"].dropna()
        if len(ts_vals):
            last_micros = max(last_micros, int(ts_vals.max().value // 1_000))
    state.update((n, total_micros, last_micros))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_micros": [total_micros],
            "last_ts_micros": [last_micros],
        }
    )


def user_stats_stateful(events: DataFrame) -> DataFrame:
    """Per-user running stats as a custom stateful operator."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
