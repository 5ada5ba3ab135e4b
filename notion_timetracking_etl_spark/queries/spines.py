"""Sequence-generator queries: date & hour spines (SURVEY §2.5 W1–W3).

The reference builds these with imperative loops (derive/index.ts:394-449);
Spark-first they are ``sequence()`` + ``posexplode`` — a generator expression
evaluated from a 1-row aggregate, so at 100 TB the only scan is the min/max
aggregate (column-pruned to one column, map-side combined).

Both spines clamp their upper bound (100 years of days / ~11 years of
hours) — the same defensive posture as operators/intervals.py: ONE corrupt
far-future timestamp in the source must cost a bounded spine, not a
70M-element sequence array materialized inside a single row. No-ops on
sane data; oracles clamp identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..sources.tpch import load_table
from .registry import register


@register(
    "dim_date_spine",
    "W3,A5,F32,F35",
    "DimDate: one row per day over the orders date range with date_key "
    "(yyyymmdd int), year/month/day parts, short month/day names "
    "(reference: derive/index.ts:394-413).",
    oracle="""
        WITH r AS (
          SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                 LEAST(CAST(max(o_orderdate) AS DATE),
                       CAST(min(o_orderdate) AS DATE) + 36500) AS hi
          FROM orders
        ),
        spine AS (
          SELECT CAST(g.d AS DATE) AS d
          FROM r, LATERAL (SELECT unnest(generate_series(r.lo::TIMESTAMP, r.hi::TIMESTAMP, INTERVAL 1 DAY)) AS d) g
        )
        SELECT
          CAST(strftime(d, '%Y%m%d') AS BIGINT) AS date_key,
          strftime(d, '%Y-%m-%d') AS date_iso,
          CAST(year(d) AS BIGINT) AS year,
          CAST(month(d) AS BIGINT) AS month_num,
          strftime(d, '%b') AS month_name,
          CAST(day(d) AS BIGINT) AS day_of_month,
          strftime(d, '%a') AS day_name
        FROM spine
        ORDER BY date_key
    """,
)
def dim_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    ).select(
        "lo",
        # 100-year clamp: a corrupt year-9999 date costs 36.5k rows, not 3M
        F.least(F.col("hi"), F.date_add(F.col("lo"), 36500)).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    return spine.select(
        F.date_format("d", "yyyyMMdd").cast("long").alias("date_key"),
        F.date_format("d", "yyyy-MM-dd").alias("date_iso"),
        F.year("d").cast("long").alias("year"),
        F.month("d").cast("long").alias("month_num"),
        F.date_format("d", "MMM").alias("month_name"),
        F.dayofmonth("d").cast("long").alias("day_of_month"),
        F.date_format("d", "EEE").alias("day_name"),
    ).orderBy("date_key")


@register(
    "playback_frame_spine",
    "W1,W2,A4,F34",
    "DimPlaybackFrame: hourly frames from floor(min ts) to floor(max ts) with "
    "monotonic frame_n (reference: derive/index.ts:416-450). frame_n is pure "
    "arithmetic off the hour delta — no window function, no extra shuffle.",
    oracle="""
        WITH r AS (
          SELECT date_trunc('hour', min(ts)) AS lo,
                 LEAST(date_trunc('hour', max(ts)),
                       date_trunc('hour', min(ts)) + INTERVAL 100000 HOUR) AS hi
          FROM events
        ),
        spine AS (
          SELECT g.h AS h, r.lo AS lo
          FROM r, LATERAL (SELECT unnest(generate_series(r.lo, r.hi, INTERVAL 1 HOUR)) AS h) g
        )
        SELECT
          CAST(date_diff('hour', lo, h) AS BIGINT) AS frame_n,
          strftime(h, '%Y-%m-%d %H:%M:%S') AS frame_ts,
          CAST(strftime(h, '%Y%m%d') AS BIGINT) AS frame_date_key,
          CAST(hour(h) AS BIGINT) AS frame_hour
        FROM spine
        ORDER BY frame_n
    """,
)
def playback_frame_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).select(
        "lo",
        # ~11-year clamp: a corrupt far-future ts costs 100k frames, not a
        # 70M-element array inside one row (intervals.py posture, W2 spine)
        F.least(
            F.col("hi"),
            F.timestamp_micros(
                F.unix_micros(F.col("lo")) + F.lit(100_000 * 3_600_000_000)
            ),
        ).alias("hi"),
    )
    spine = bounds.select(
        F.col("lo"),
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"),
    )
    return spine.select(
        ((F.unix_timestamp("h") - F.unix_timestamp("lo")) / 3600).cast("long").alias("frame_n"),
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("frame_ts"),
        F.date_format("h", "yyyyMMdd").cast("long").alias("frame_date_key"),
        F.hour("h").cast("long").alias("frame_hour"),
    ).orderBy("frame_n")
