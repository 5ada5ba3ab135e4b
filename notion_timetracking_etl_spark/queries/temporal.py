"""Temporal-join queries (engine extension): as-of join and banded range join
over the ``events`` stream.

Both operators exist because the naive Spark formulations (theta-join on a
range predicate) degenerate to per-key cross products at scale; see
``operators/asof.py`` and ``operators/rangejoin.py`` for the scalable shapes
and their cost models. The DuckDB oracles mirror the same semantics in plain
window/aggregate SQL so the driver hash-checks them end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import band_join
from ..sources.tpch import load_table
from .helpers import TS_FMT_DUCK, fmt_ts
from .registry import register


@register(
    "asof_purchase_attribution",
    "J4-analog,O3,F25",
    "As-of join: each purchase event matched to the same user's most recent "
    "strictly-earlier view event (classic last-touch attribution), with the "
    "seconds elapsed. Union-and-carry-forward plan: ONE shuffle of views + "
    "purchases on user_id, no range explosion (operators/asof.py).",
    oracle=f"""
        WITH u AS (
          SELECT user_id, ts AS _ts, 0 AS _side,
                 event_id AS purchase_id, ts AS p_ts,
                 CAST(-1 AS BIGINT) AS _tie,
                 CAST(NULL AS STRUCT(asof_ts TIMESTAMP, asof_id BIGINT)) AS _r
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 1, NULL, NULL, event_id,
                 {{'asof_ts': ts, 'asof_id': event_id}}
          FROM events WHERE event_type = 'view'
        ),
        c AS (
          SELECT *,
                 last_value(_r IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY _ts, _side, _tie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _m
          FROM u
        )
        SELECT purchase_id,
               user_id,
               strftime(p_ts, '{TS_FMT_DUCK}') AS purchase_ts,
               _m.asof_id AS view_id,
               strftime(_m.asof_ts, '{TS_FMT_DUCK}') AS view_ts,
               CAST((epoch_us(p_ts) - epoch_us(_m.asof_ts)) // 1000000
                    AS BIGINT) AS secs_since_view
        FROM c
        WHERE _side = 0
        ORDER BY purchase_id
    """,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    matched = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        tiebreak="event_id",
        strict=True,
    )
    # O(purchases) output — distributed orderBy, never a 1-partition funnel.
    return matched.select(
        "purchase_id",
        "user_id",
        fmt_ts(F.col("ts")).alias("purchase_ts"),
        F.col("asof_event_id").alias("view_id"),
        fmt_ts(F.col("asof_ts")).alias("view_ts"),
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts")))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("secs_since_view"),
    ).orderBy("purchase_id")


@register(
    "range_join_error_context",
    "J4-analog,A2",
    "Banded range join: for every error event, the count of same-user click/"
    "view activity in the preceding 10 minutes (half-open window). Bucketed "
    "equi-join plan — probe side explodes to <=2 width-sized time buckets, so "
    "the shuffled pair space is linear, never the per-key cross product "
    "(operators/rangejoin.py).",
    oracle=f"""
        SELECT e.event_id,
               e.user_id,
               strftime(e.ts, '{TS_FMT_DUCK}') AS error_ts,
               CAST(count(a.a_id) AS BIGINT) AS n_context
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
        LEFT JOIN (SELECT event_id AS a_id, user_id, ts AS a_ts FROM events
                   WHERE event_type IN ('click', 'view')) a
          ON a.user_id = e.user_id
         AND a.a_ts >= e.ts - INTERVAL 600 SECOND
         AND a.a_ts < e.ts
        GROUP BY e.event_id, e.user_id, e.ts
        ORDER BY e.event_id
    """,
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    activity = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("a_id"), "user_id", F.col("ts").alias("a_ts")
    )
    pairs = band_join(
        errors,
        activity,
        on=["user_id"],
        left_ts="ts",
        right_ts="a_ts",
        lower_s=-600,
        upper_s=0,
    )
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_context"))
    # Left join keeps zero-context errors; counts is O(errors-with-context),
    # errors is O(corpus) → distributed orderBy on the bounded-width result.
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            fmt_ts(F.col("ts")).alias("error_ts"),
            F.coalesce(F.col("n_context"), F.lit(0)).cast("long").alias("n_context"),
        )
        .orderBy("event_id")
    )
