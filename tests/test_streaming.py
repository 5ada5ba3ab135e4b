"""Structured Streaming extension tests: stream == batch, bit-for-bit.

Finite input drained with Trigger.AvailableNow must produce exactly what the
equivalent batch query produces — that invariant is what makes the streaming
surface oracle-checkable in the driver's correctness gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_timetracking_etl_spark.sources.tpch import load_table
from notion_timetracking_etl_spark.streaming import (
    hourly_rollup,
    read_events_stream,
    run_stream_to_table,
    session_window_rollup,
    user_stats_stateful,
)

SF = "/root/testdata/sf0.001"


def _sorted_tuples(df, *keys):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_hourly_rollup_equals_batch(spark):
    stream_out = run_stream_to_table(hourly_rollup(read_events_stream(spark, SF)))
    batch = (
        load_table(spark, SF, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "total_value"
            ),
        )
    )
    assert _sorted_tuples(stream_out) == _sorted_tuples(batch)


def test_session_window_merges_exact_gap_tie(spark):
    """Pin the tie semantics the streaming_session_window oracle relies on:
    two events EXACTLY 30 min apart merge into ONE session (Spark extends the
    window to last_event + gap and merges overlapping-or-touching windows),
    matching the gaps-and-islands oracle's strict `> INTERVAL 30 MINUTE`
    new-session predicate. If Spark were end-exclusive on ties the oracle
    would need `>=`."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (1, dt.datetime(2026, 1, 1, 10, 0, 0)),
            (1, dt.datetime(2026, 1, 1, 10, 30, 0)),  # tie: gap == 30 min
            (1, dt.datetime(2026, 1, 1, 11, 0, 1)),  # gap > 30 min → new
        ],
        "user_id long, ts timestamp",
    )
    sessions = sorted(
        (r["s"], r["e"], r["n"])
        for r in (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").cast("string").alias("s"),
                F.col("w.end").cast("string").alias("e"),
                F.col("n"),
            )
            .collect()
        )
    )
    assert sessions == [
        ("2026-01-01 10:00:00", "2026-01-01 11:00:00", 2),
        ("2026-01-01 11:00:01", "2026-01-01 11:30:01", 1),
    ]


def test_streaming_session_window_equals_batch_session_window(spark):
    stream_out = run_stream_to_table(
        session_window_rollup(read_events_stream(spark, SF))
    )
    # session_window works identically as a batch aggregation
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )
    assert _sorted_tuples(stream_out) == _sorted_tuples(batch)


def test_stateful_user_stats_equals_batch(spark):
    stream_out = run_stream_to_table(
        user_stats_stateful(read_events_stream(spark, SF)), output_mode="update"
    )
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # HALF_UP via floor(x+0.5) — the exact rule the stateful fold uses
            # (F.round is HALF_UP too, but pin the shared formula explicitly)
            F.sum(F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")).alias(
                "total_value_micros"
            ),
            F.max(F.unix_micros("ts")).alias("last_ts_micros"),
        )
    )
    assert _sorted_tuples(stream_out) == _sorted_tuples(batch)
