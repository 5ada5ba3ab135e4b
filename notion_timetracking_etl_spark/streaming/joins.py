"""Stream-stream interval join (engine extension, SURVEY §2.9 family).

The batch engine's banded range join (operators/rangejoin.py) answers
"activity within N minutes" over a lake; this is the streaming counterpart:
two event streams joined on key + a bounded event-time interval. Spark's
stream-stream join machinery keeps BOTH sides in state, and the interval
bound + watermark is what makes that state finite: a buffered view row can
be evicted once the watermark passes ``view.ts + max_gap`` because no future
purchase can match it. Without the time bound the state grows without limit
— the join condition IS the retention policy.

On finite input drained with ``Trigger.AvailableNow`` the inner join emits
exactly the batch-equivalent pair set, so the registered query is fully
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def view_purchase_interval_join(
    events: DataFrame, max_gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Pairs of (view, purchase) by the same user with the purchase strictly
    inside ``(view.ts, view.ts + max_gap]`` — streaming conversion
    attribution within a bounded window.

    Both sides carry watermarks; the interval condition bounds the join
    state (views evictable past ``ts + max_gap + watermark``, purchases past
    ``ts + watermark``).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        )
    )
    return views.join(purchases, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )
