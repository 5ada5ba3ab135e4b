"""Robust anomaly detection and gap repair over the events fact (engine
extension): the two time-series data-quality passes a monitoring pipeline
runs after ingest — absent from the reference (its quality engine is
row-shape rules, `src/normalize/quality.ts`), mandatory for any metrics
table feeding alerts or training labels.

- **Median/MAD outliers** (`robust_outliers_mad`): per event_type, the
  exact median and median-absolute-deviation of the value column, plus how
  many events sit more than K·MAD from the median. Unlike mean/stddev
  z-scores (`events_daily_outliers`), the median/MAD pair has a 50%
  breakdown point — the outliers themselves cannot drag the threshold.
  Medians are EXACT order statistics from the distributed global rank
  (operators/rank.py: range partition + per-partition row numbers + driver
  offsets — never a single-partition window); per-group medians fall out of
  ONE global rank over (group, value, id) because each group occupies a
  contiguous rank interval whose start/width one tiny aggregate provides.
  All values are floor-micro BIGINTs, so medians, deviations, and the K·MAD
  threshold compare exact integers — bit-identical on both engines.
- **Linear gap interpolation** (`events_gap_interpolation`): the daily
  per-type value series with missing days filled by linear interpolation
  between the nearest present neighbors — the gap-repair primitive for
  metric series (complementing `events_forward_fill`, which carries the
  last value flat). Interpolation is integer arithmetic over floor-micro
  sums and day distances: prev + floor((next-prev)·run/span) — one double
  divide of exact integers under 2^53, floored, identical on both engines.

Scale shape at 100 TB: the rank passes are the distributed-exact-rank
machinery (one range shuffle each); per-type medians/MADs join back as
broadcast scalars (|types| rows); the daily grain is O(days×types) — window
frames run over the GRAIN, never the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..operators.rank import with_global_ranks
from ..sources.tpch import load_table
from .helpers import (
    DATE_FMT_DUCK,
    DATE_FMT_SPARK,
    _finite,
    _finite_sql,
    ordered_small,
)
from .registry import register

_MAD_K = 5  # outlier threshold: |v - median| > K * MAD

# finite floor-micro values keyed for tie-free ordering
_VALS_SQL = f"""
  vals AS (
    SELECT event_type AS g,
           CAST(floor(value * 1000000.0) AS BIGINT) AS v,
           event_id AS id
    FROM events
    WHERE {_finite_sql("value")} IS NOT NULL
  )
"""


def _events_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("g"),
            F.floor(_finite(F.col("value")) * F.lit(1000000.0))
            .cast("bigint")
            .alias("v"),
            F.col("event_id").alias("id"),
        )
        .filter(F.col("v").isNotNull())
    )


def _group_lower_medians(df: DataFrame, med_alias: str) -> DataFrame:
    """Exact per-group lower median of ``v`` for a (g, v, id) DataFrame.

    One GLOBAL distributed rank over (g, v, id): because the order sorts by
    group first, each group's rows occupy a contiguous rank interval, so a
    tiny per-group aggregate (min rank + count — |groups| rows, broadcast)
    converts the global rank into the per-group order statistic. The lower
    median is the rank-⌈n/2⌉ element — an exact integer pick, no averaging,
    so even-count groups stay integral and cross-engine exact."""
    ranked, _ = with_global_ranks(
        df, [F.col("g").asc(), F.col("v").asc(), F.col("id").asc()]
    )
    target = (
        ranked.groupBy("g")
        .agg(F.min("rn").alias("_start"), F.count(F.lit(1)).alias("_cnt"))
        .select(
            "g",
            (
                F.col("_start") - 1 + F.floor((F.col("_cnt") + 1) / 2)
            ).cast("bigint").alias("_med_rn"),
        )
    )
    return (
        ranked.join(F.broadcast(target), "g")
        .filter(F.col("rn") == F.col("_med_rn"))
        .select("g", F.col("v").alias(med_alias))
    )


# DuckDB twin of _group_lower_medians over a (g, v, id) CTE
def _median_sql(src: str, out: str, med_alias: str) -> str:
    return f"""
  {out} AS (
    SELECT g, v AS {med_alias}
    FROM (SELECT g, v,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id) AS rn,
                 COUNT(*) OVER (PARTITION BY g) AS cnt
          FROM {src})
    WHERE rn = (cnt + 1) // 2
  )
"""


@register(
    "robust_outliers_mad",
    "ext:anomaly,A3-ext,O1-analog",
    "Median/MAD robust outlier report per event_type: exact lower median "
    "and median-absolute-deviation of the floor-micro value (two passes of "
    "the distributed exact rank — per-group order statistics from ONE "
    f"global rank each), then events with |v - median| > {_MAD_K}·MAD "
    "counted against the broadcast (median, MAD) scalars. 50% breakdown "
    "point: unlike the z-score twin, outliers cannot inflate their own "
    "threshold. Every comparison is exact-integer; the rate is one IEEE "
    "divide.",
    oracle=f"""
        WITH {_VALS_SQL},
        {_median_sql("vals", "med", "med_v")},
        dev AS (
          SELECT vals.g, abs(v - med_v) AS v, id
          FROM vals JOIN med USING (g)
        ),
        {_median_sql("dev", "mad", "mad_v")}
        SELECT vals.g AS event_type,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(MAX(med_v) AS BIGINT) AS median_micros,
               CAST(MAX(mad_v) AS BIGINT) AS mad_micros,
               CAST(SUM(CASE WHEN abs(v - med_v) > {_MAD_K} * mad_v
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(SUM(CASE WHEN abs(v - med_v) > {_MAD_K} * mad_v
                        THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                 AS outlier_rate
        FROM vals JOIN med USING (g) JOIN mad USING (g)
        GROUP BY 1
        ORDER BY event_type
    """,
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = _events_micros(spark, sf_dir)
    med = _group_lower_medians(vals, "med_v")
    dev = vals.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("med_v")).alias("v"), "id"
    )
    mad = _group_lower_medians(dev, "mad_v")
    is_out = F.abs(F.col("v") - F.col("med_v")) > F.lit(_MAD_K) * F.col(
        "mad_v"
    )
    return (
        vals.join(F.broadcast(med), "g")
        .join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.max("med_v").cast("bigint").alias("median_micros"),
            F.max("mad_v").cast("bigint").alias("mad_micros"),
            F.sum(F.when(is_out, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            (
                F.sum(F.when(is_out, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("outlier_rate"),
        )
        .select(
            F.col("g").alias("event_type"),
            "n_values",
            "median_micros",
            "mad_micros",
            "n_outliers",
            "outlier_rate",
        )
        .orderBy("event_type")
    )


@register(
    "events_gap_interpolation",
    "ext:anomaly,W-ext-fill",
    "Daily per-type value series with missing days LINEARLY interpolated "
    "between the nearest present neighbors (the gap-repair complement of "
    "events_forward_fill's flat carry): day spine × type grid left-joins "
    "the daily floor-micro sums; prev/next neighbors come from IGNORE-NULLS "
    "window frames over the O(days×types) GRAIN (never the event stream); "
    "filled = prev + floor((next-prev)·run/span) — exact integers under "
    "2^53 through one shared-semantics double divide. Edge days with only "
    "one neighbor stay NULL and are flagged 'edge'.",
    oracle=f"""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
                      AS BIGINT) AS actual
          FROM events
          WHERE {_finite_sql("value")} IS NOT NULL
          GROUP BY 1, 2
        ),
        span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        grid AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
                   AS day, event_type
          FROM span, (SELECT DISTINCT event_type FROM daily)
        ),
        joined AS (
          SELECT g.day, g.event_type, d.actual
          FROM grid g LEFT JOIN daily d USING (day, event_type)
        ),
        nb AS (
          SELECT day, event_type, actual,
                 last_value(actual IGNORE NULLS) OVER wp AS prev_v,
                 last_value(CASE WHEN actual IS NOT NULL THEN day END
                            IGNORE NULLS) OVER wp AS prev_d,
                 first_value(actual IGNORE NULLS) OVER wn AS next_v,
                 first_value(CASE WHEN actual IS NOT NULL THEN day END
                             IGNORE NULLS) OVER wn AS next_d
          FROM joined
          WINDOW
            wp AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            wn AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        )
        SELECT strftime(day, '{DATE_FMT_DUCK}') AS day, event_type,
               actual AS actual_micros,
               CASE WHEN actual IS NOT NULL THEN actual
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                    THEN prev_v + CAST(floor(
                           (next_v - prev_v)
                           * date_diff('day', prev_d, day)
                           / date_diff('day', prev_d, next_d)) AS BIGINT)
               END AS filled_micros,
               CASE WHEN actual IS NOT NULL THEN 'actual'
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                    THEN 'interp' ELSE 'edge' END AS fill_kind
        FROM nb
        ORDER BY day, event_type
    """,
)
def events_gap_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.floor(_finite(F.col("value")) * F.lit(1000000.0))
            .cast("bigint")
            .alias("vm"),
        )
        .filter(F.col("vm").isNotNull())
        .groupBy("day", "event_type")
        .agg(F.sum("vm").cast("bigint").alias("actual"))
    )
    span = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    types = daily.select("event_type").distinct()
    grid = (
        span.select(
            F.explode(F.sequence("lo", "hi")).alias("day")
        )
        .crossJoin(F.broadcast(types))
    )
    joined = grid.join(daily, ["day", "event_type"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    present_day = F.when(F.col("actual").isNotNull(), F.col("day"))
    nb = joined.select(
        "day",
        "event_type",
        "actual",
        F.last("actual", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(present_day, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("actual", ignorenulls=True).over(wn).alias("next_v"),
        F.first(present_day, ignorenulls=True).over(wn).alias("next_d"),
    )
    interp = F.col("prev_v") + F.floor(
        (F.col("next_v") - F.col("prev_v"))
        * F.datediff(F.col("day"), F.col("prev_d"))
        / F.datediff(F.col("next_d"), F.col("prev_d"))
    ).cast("bigint")
    has_both = F.col("prev_v").isNotNull() & F.col("next_v").isNotNull()
    return nb.select(
        F.date_format("day", DATE_FMT_SPARK).alias("day"),
        "event_type",
        F.col("actual").alias("actual_micros"),
        F.when(F.col("actual").isNotNull(), F.col("actual"))
        .when(has_both, interp)
        .alias("filled_micros"),
        F.when(F.col("actual").isNotNull(), F.lit("actual"))
        .when(has_both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("fill_kind"),
    ).orderBy("day", "event_type")


@register(
    "changepoint_cusum_daily",
    "ext:anomaly,A3-ext,W-ext",
    "CUSUM change-point detection per event_type over the daily value "
    "series: S_k = D·prefix_k - k·T (the cumulative deviation from the "
    "series mean, scaled by the day count D so every term stays an exact "
    "BIGINT — no float crosses the argmax), change point = the day "
    "maximizing |S_k| (ties -> earliest), picked by ONE comparison-struct "
    "MIN per type — never a global sort. Window frames run over the "
    "O(days×types) grain; before/after means are exact integer sums with "
    "one display divide each.",
    oracle="""
        WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
                      AS BIGINT) AS v
          FROM events
          WHERE CASE WHEN isfinite(CAST(value AS DOUBLE))
                THEN value END IS NOT NULL
          GROUP BY 1, 2
        ),
        seq AS (
          SELECT g, day, v,
                 ROW_NUMBER() OVER w AS k,
                 SUM(v) OVER (PARTITION BY g ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS pref,
                 COUNT(*) OVER (PARTITION BY g) AS d,
                 SUM(v) OVER (PARTITION BY g) AS t
          FROM daily
          WINDOW w AS (PARTITION BY g ORDER BY day)
        ),
        scored AS (
          SELECT g, day, k, d, t, pref,
                 abs(d * pref - k * t) AS s_abs
          FROM seq
          WHERE k < d  -- S_D = 0 by construction; a cut needs both sides
        ),
        best AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY g ORDER BY s_abs DESC, day) AS rn
            FROM scored
          ) WHERE rn = 1
        )
        SELECT g AS event_type,
               CAST(d AS BIGINT) AS n_days,
               strftime(day, '%Y-%m-%d') AS cp_day,
               CAST(s_abs AS BIGINT) AS cusum_abs_max,
               CAST(k AS BIGINT) AS n_before,
               CAST(pref AS BIGINT) AS sum_before_micros,
               CAST(t - pref AS BIGINT) AS sum_after_micros,
               CAST(pref AS DOUBLE) / k AS mean_before_micros,
               CAST(t - pref AS DOUBLE) / (d - k) AS mean_after_micros
        FROM best
        ORDER BY event_type
    """,
)
def changepoint_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.col("event_type").alias("g"),
            F.to_date("ts").alias("day"),
            F.floor(_finite(F.col("value")) * F.lit(1000000.0))
            .cast("bigint")
            .alias("vm"),
        )
        .filter(F.col("vm").isNotNull())
        .groupBy("g", "day")
        .agg(F.sum("vm").cast("bigint").alias("v"))
    )
    w_ord = Window.partitionBy("g").orderBy("day")
    w_all = Window.partitionBy("g")
    seq = daily.select(
        "g",
        "day",
        F.row_number().over(w_ord).cast("bigint").alias("k"),
        F.sum("v")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pref"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("d"),
        F.sum("v").over(w_all).alias("t"),
    )
    scored = seq.filter(F.col("k") < F.col("d")).select(
        "g",
        "day",
        "k",
        "d",
        "t",
        "pref",
        F.abs(F.col("d") * F.col("pref") - F.col("k") * F.col("t")).alias(
            "s_abs"
        ),
    )
    # min over (-s_abs, day, ...) == max s_abs with earliest-day tie-break
    best = (
        scored.groupBy("g")
        .agg(
            F.min(
                F.struct(
                    (-F.col("s_abs")).alias("_neg"),
                    "day",
                    "k",
                    "d",
                    "t",
                    "pref",
                )
            ).alias("_b")
        )
        .select(
            "g",
            F.col("_b.day").alias("day"),
            F.col("_b.k").alias("k"),
            F.col("_b.d").alias("d"),
            F.col("_b.t").alias("t"),
            F.col("_b.pref").alias("pref"),
            (-F.col("_b._neg")).alias("s_abs"),
        )
    )
    after = F.col("t") - F.col("pref")
    return ordered_small(
        best.select(
            F.col("g").alias("event_type"),
            F.col("d").cast("bigint").alias("n_days"),
            F.date_format("day", DATE_FMT_SPARK).alias("cp_day"),
            F.col("s_abs").cast("bigint").alias("cusum_abs_max"),
            F.col("k").cast("bigint").alias("n_before"),
            F.col("pref").cast("bigint").alias("sum_before_micros"),
            after.cast("bigint").alias("sum_after_micros"),
            (F.col("pref").cast("double") / F.col("k")).alias(
                "mean_before_micros"
            ),
            (after.cast("double") / (F.col("d") - F.col("k"))).alias(
                "mean_after_micros"
            ),
        ),
        "event_type",
    )
