"""Streaming exact deduplication — first-seen-wins per key with bounded
state.

``dropDuplicatesWithinWatermark`` keeps one state entry per key and EVICTS
it once the watermark passes the key's last-seen event time + delay: at
100 TB/day the state store holds only the active-key working set, not the
full key history (plain ``dropDuplicates`` on a stream never evicts). A key
recurring after eviction is re-emitted — the documented semantics of
watermarked dedup; choose the delay to cover the duplication window (for a
crawl ingest: the re-crawl period).

On a finite drain whose delay spans the whole input, every key is emitted
exactly once, so projecting the key columns yields the exact DISTINCT key
set — the oracle-checkable contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_keys_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "90 days",
) -> DataFrame:
    """First-seen-wins streaming dedup on ``keys``; emits the key columns of
    each first occurrence. State per key is evicted ``delay`` past the
    watermark."""
    return (
        events.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
