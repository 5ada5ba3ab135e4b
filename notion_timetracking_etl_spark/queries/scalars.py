"""Scalar function library parity queries (SURVEY §2.8 F13–F36).

These exercise the engine's Column-builder library (functions/strings.py,
functions/datetime.py) over the testdata tables, with a DuckDB oracle twin for
every JS-ism the reference bakes in: half-up rounding (Math.round → explicit
floor(x+0.5)), ''→null normalization, sha256-derived ids/colors, OLE Automation
date serials, and America/Los_Angeles calendar rendering.

All expressions are built-in Column functions — JVM-side, whole-stage-codegen
friendly; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..functions.strings import (
    color_index,
    issue_id,
    sha256_hex,
    sort_key,
    stable_entity_id,
    stage_display_label,
    to_uuid_maybe,
)
from ..functions.datetimes import (
    date_key,
    duration_seconds,
    duration_minutes,
    iso_utc_millis,
    la_date_iso,
    la_snapshot_label,
    ole_serial,
)
from ..sources.tpch import load_table
from .registry import register


@register(
    "scalar_string_library",
    "F13,F16,F17,F18,F19,F20,F21,F23,O6",
    "String-function parity row per part: stable entity ids, sha256 digests, "
    "composite sort keys, zero-padded stage labels, sha-derived color index, "
    "UUID re-hyphenation (reference: canon/rules.ts, derive/index.ts:345-364,"
    "703-714, lib/hash.ts).",
    oracle="""
        SELECT
          p_partkey,
          concat('part_', lower(replace(COALESCE(p_brand, 'unknown'), '-', ''))) AS stable_id,
          sha256(p_name) AS name_sha,
          sha256(concat_ws('|', '2026-01-01', 'part', CAST(p_partkey AS VARCHAR), 'RULE')) AS issue_id,
          CAST(CAST(concat('0x', substr(sha256(p_type), 1, 8)) AS BIGINT) % 36 AS BIGINT) AS color_idx,
          lower(concat_ws('|',
            COALESCE(trim(p_brand), ''),
            COALESCE(trim(CAST(p_size AS VARCHAR)), ''),
            COALESCE(trim(p_type), ''))) AS sort_key,
          concat(lpad(CAST(CAST(p_size AS BIGINT) AS VARCHAR), 2, '0'), '. ', COALESCE(p_brand, 'key_unknown')) AS stage_label,
          CASE
            WHEN regexp_extract(lower(md5(p_name)),
                 '[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}', 0) <> ''
              THEN regexp_extract(lower(md5(p_name)),
                 '[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}', 0)
            WHEN regexp_extract(lower(md5(p_name)), '[0-9a-f]{32}', 0) <> ''
              THEN concat(
                substr(regexp_extract(lower(md5(p_name)), '[0-9a-f]{32}', 0), 1, 8), '-',
                substr(regexp_extract(lower(md5(p_name)), '[0-9a-f]{32}', 0), 9, 4), '-',
                substr(regexp_extract(lower(md5(p_name)), '[0-9a-f]{32}', 0), 13, 4), '-',
                substr(regexp_extract(lower(md5(p_name)), '[0-9a-f]{32}', 0), 17, 4), '-',
                substr(regexp_extract(lower(md5(p_name)), '[0-9a-f]{32}', 0), 21, 12))
            ELSE NULL
          END AS uuid_maybe
        FROM part
        ORDER BY p_partkey
    """,
)
def scalar_string_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        stable_entity_id("part", F.col("p_brand")).alias("stable_id"),
        sha256_hex(F.col("p_name")).alias("name_sha"),
        issue_id(
            F.lit("2026-01-01"), F.lit("part"), F.col("p_partkey").cast("string"), F.lit("RULE")
        ).alias("issue_id"),
        color_index(F.col("p_type"), 36).cast("long").alias("color_idx"),
        sort_key(F.col("p_brand"), F.col("p_size").cast("string"), F.col("p_type")).alias(
            "sort_key"
        ),
        stage_display_label(F.col("p_size").cast("long"), F.col("p_brand")).alias("stage_label"),
        to_uuid_maybe(F.md5(F.col("p_name"))).alias("uuid_maybe"),
    ).orderBy("p_partkey")


@register(
    "scalar_datetime_library",
    "F24,F25,F26,F27,F28,F29,F33,F34,F35",
    "Datetime-function parity row per event: OLE Automation serial, UTC ISO "
    "millis rendering, LA-local day bucketing and snapshot labels, hour floor, "
    "yyyymmdd date_key, clamped half-up duration seconds/minutes "
    "(reference: derive/index.ts:305-376,645-689, canon/timeslice.ts:219-229).",
    oracle="""
        WITH iv AS (
          SELECT event_id, ts AS start_ts,
                 ts + INTERVAL 1 MINUTE * CAST(5 + event_id % 240 AS BIGINT) AS end_ts,
                 -- a deliberately-negative interval for the clamp path
                 ts - INTERVAL 90 SECOND AS neg_end_ts
          FROM events
        )
        SELECT
          event_id,
          CAST(epoch_ms(start_ts) + 2209161600000 AS DOUBLE) / 86400000.0 AS ole_serial,
          concat(strftime(start_ts, '%Y-%m-%dT%H:%M:%S'), '.',
                 lpad(CAST(epoch_ms(start_ts) % 1000 AS VARCHAR), 3, '0'), 'Z') AS iso_millis,
          concat(strftime(timezone('America/Los_Angeles', timezone('UTC', start_ts)),
                          '%Y-%m-%d'), 'T00:00:00.000Z') AS la_day_iso,
          strftime(timezone('America/Los_Angeles', timezone('UTC', start_ts)),
                   '%Y-%m-%d %H:%M') AS la_snapshot,
          strftime(date_trunc('hour', start_ts), '%Y-%m-%d %H:%M:%S') AS hour_floor,
          CAST(strftime(timezone('America/Los_Angeles', timezone('UTC', start_ts)),
                        '%Y%m%d') AS BIGINT) AS la_date_key,
          CAST(floor((CAST(epoch_ms(end_ts) AS DOUBLE) - epoch_ms(start_ts)) / 1000.0 + 0.5)
               AS BIGINT) AS dur_seconds,
          CAST(greatest(0, floor((CAST(epoch_ms(neg_end_ts) AS DOUBLE) - epoch_ms(start_ts))
               / 1000.0 + 0.5)) AS BIGINT) AS dur_seconds_clamped,
          CAST(floor(CAST(floor((CAST(epoch_ms(end_ts) AS DOUBLE) - epoch_ms(start_ts))
               / 1000.0 + 0.5) AS DOUBLE) / 60.0 + 0.5) AS BIGINT) AS dur_minutes
        FROM iv
        ORDER BY event_id
    """,
)
def scalar_datetime_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dur_min = (F.lit(5) + F.col("event_id") % 240).cast("long")
    iv = ev.select(
        "event_id",
        F.col("ts").alias("start_ts"),
        F.timestamp_micros(F.unix_micros("ts") + dur_min * 60_000_000).alias("end_ts"),
        F.timestamp_micros(F.unix_micros("ts") - 90_000_000).alias("neg_end_ts"),
    )
    return iv.select(
        "event_id",
        ole_serial(F.col("start_ts")).alias("ole_serial"),
        iso_utc_millis(F.col("start_ts")).alias("iso_millis"),
        la_date_iso(F.col("start_ts")).alias("la_day_iso"),
        la_snapshot_label(F.col("start_ts")).alias("la_snapshot"),
        F.date_format(F.date_trunc("hour", "start_ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_floor"
        ),
        date_key(F.col("start_ts"), tz="America/Los_Angeles").cast("long").alias("la_date_key"),
        duration_seconds(F.col("start_ts"), F.col("end_ts"), clamp=False)
        .cast("long")
        .alias("dur_seconds"),
        duration_seconds(F.col("start_ts"), F.col("neg_end_ts"), clamp=True)
        .cast("long")
        .alias("dur_seconds_clamped"),
        duration_minutes(F.col("start_ts"), F.col("end_ts")).cast("long").alias("dur_minutes"),
    ).orderBy("event_id")
