"""Warehouse-maintenance queries (engine extension): planned skew-salted
joins and SCD2 dimension merges — the two operations a wipe-and-reload
pipeline (the reference's model, SURVEY §2.1 S8) grows into at lake scale.

Both are oracle-checked: the salted join must be result-identical to the
plain join it replaces (the salt is pure physical-plan treatment), and the
SCD2 merge's four row classes (closed history pass-through, kept-open,
closed-now, newly-opened) are restated by the oracle as explicit UNION ALL
branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.scd import scd2_merge
from ..operators.skewjoin import salted_join
from ..sources.tpch import load_table
from .helpers import dsum, dsum_sql, ordered_small
from .registry import register


@register(
    "skewjoin_user_cohorts",
    "J-ext-skew,A3",
    "Planned skew-salted join: events (fact) joined to the per-user "
    "first-month dimension via operators/skewjoin.salted_join — fact rows "
    "spread across 8 deterministic sub-keys (hash of event_id), the dim "
    "replicated 8 ways, shuffle_hash-hinted so the optimizer cannot "
    "broadcast the demo away. A hot user key lands on 8 reducers instead "
    "of 1; results are bit-identical to the plain join the oracle runs.",
    oracle=f"""
        WITH dim AS (
          SELECT user_id,
                 strftime(date_trunc('month', min(ts)), '%Y-%m') AS first_month
          FROM events GROUP BY user_id
        )
        SELECT d.first_month,
               CAST(count(*) AS BIGINT) AS n_events,
               {dsum_sql("e.value", "total_value")}
        FROM events e JOIN dim d USING (user_id)
        GROUP BY d.first_month
        ORDER BY first_month
    """,
)
def skewjoin_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        F.date_format(F.date_trunc("month", F.min("ts")), "yyyy-MM").alias(
            "first_month"
        )
    )
    joined = salted_join(
        ev.select("user_id", "event_id", "value"),
        dim,
        on="user_id",
        tiebreaker="event_id",
        salt=8,
    )
    return ordered_small(
        joined.groupBy("first_month").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        ),
        "first_month",
    )


_T0, _T1, _T2 = (
    "2024-01-01T00:00:00Z",
    "2025-01-01T00:00:00Z",
    "2026-01-01T00:00:00Z",
)


@register(
    "scd2_definition_merge",
    "S-ext-scd2,J5,U1",
    "SCD2 dimension merge (operators/scd.py): a definition dimension with "
    "closed history and open rows receives an update batch — differing "
    "updates (odd-length types) close the open row and insert a v2 row, "
    "a no-op update (same title) passes through, a brand-new key opens. "
    "One keyed full-outer join on the OPEN slice only; closed history "
    "never shuffles. The oracle restates the four row classes explicitly.",
    oracle=f"""
        WITH types AS (SELECT DISTINCT event_type AS t FROM events),
        merged AS (
          -- closed history: pass-through
          SELECT concat('wd_', md5(t)) AS def_key,
                 concat(upper(t), '_V0') AS title,
                 '{_T0}' AS valid_from, '{_T1}' AS valid_to
          FROM types
          UNION ALL
          -- kept open: even-length types (no update or no-op update)
          SELECT concat('wd_', md5(t)), upper(t), '{_T1}', NULL
          FROM types WHERE len(t) % 2 = 0
          UNION ALL
          -- closed by the differing update
          SELECT concat('wd_', md5(t)), upper(t), '{_T1}', '{_T2}'
          FROM types WHERE len(t) % 2 = 1
          UNION ALL
          -- newly opened v2 rows
          SELECT concat('wd_', md5(t)), concat(upper(t), '_V2'), '{_T2}', NULL
          FROM types WHERE len(t) % 2 = 1
          UNION ALL
          -- brand-new key from the update batch
          SELECT 'wd_stream', 'STREAM', '{_T2}', NULL
        )
        SELECT def_key, title, valid_from, valid_to
        FROM merged
        ORDER BY def_key, valid_from
    """,
)
def scd2_definition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct()
    )
    key = F.concat(F.lit("wd_"), F.md5("event_type")).alias("def_key")
    current = types.select(
        key,
        F.concat(F.upper("event_type"), F.lit("_V0")).alias("title"),
        F.lit(_T0).alias("valid_from"),
        F.lit(_T1).alias("valid_to"),
    ).unionByName(
        types.select(
            key,
            F.upper("event_type").alias("title"),
            F.lit(_T1).alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
        )
    )
    odd = F.length("event_type") % 2 == 1
    updates = (
        types.select(
            key,
            # odd-length types change title; even-length 'view'-style rows
            # are a no-op update (same title) exercising the kept branch
            F.when(odd, F.concat(F.upper("event_type"), F.lit("_V2")))
            .otherwise(F.upper("event_type"))
            .alias("title"),
            F.lit(_T2).alias("effective_ts"),
        )
        .unionByName(
            types.sparkSession.createDataFrame(
                [("wd_stream", "STREAM", _T2)],
                "def_key string, title string, effective_ts string",
            )
        )
    )
    merged = scd2_merge(
        current, updates, key="def_key", attrs=["title"]
    )
    return ordered_small(
        merged.select("def_key", "title", "valid_from", "valid_to"),
        "def_key",
        "valid_from",
    )


@register(
    "acctbal_histogram",
    "A7-ext,A8",
    "Equi-WIDTH histogram (the complement of the equi-depth deciles): "
    "customer account balances bucketed into 10 fixed-width bins between "
    "the global min/max — bounds come from one 1-row aggregate broadcast "
    "back over the scan, bin assignment is pure arithmetic, the rollup "
    "partial-aggregates map-side. The bin edges divide once in double on "
    "both engines, so boundary membership cannot flip.",
    oracle="""
        WITH bounds AS (
          SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi FROM customer
        )
        SELECT CAST(least(floor((c.c_acctbal - b.lo) * 10.0
                                 / (b.hi - b.lo)), 9) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 AS total_balance
        FROM customer c, bounds b
        GROUP BY bin
        ORDER BY bin
    """,
)
def acctbal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .helpers import dsum

    cust = load_table(spark, sf_dir, "customer")
    bounds = cust.agg(
        F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi")
    )
    binned = cust.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("c_acctbal") - F.col("lo")) * 10.0
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(9),
        ).cast("bigint").alias("bin"),
        "c_acctbal",
    )
    return ordered_small(
        binned.groupBy("bin").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_balance"),
        ),
        "bin",
    )


@register(
    "revenue_pareto_curve",
    "W-ext-rank,W-ext-scan",
    "Pareto (cumulative-share) curve: customers ranked by total spend "
    "descending, the running spend total computed by the exact distributed "
    "prefix sum over that rank order, grouped into 10 rank-percentile "
    "buckets with each bucket's cumulative share of all revenue — the "
    "80/20 report. Combines both scale primitives (global rank + prefix "
    "sum from operators/rank.py, neither a single-partition window); "
    "spend quantizes to exact micro-units so the running totals are "
    "order-independent BIGINTs.",
    oracle="""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(floor(o_totalprice * 1000000.0) AS BIGINT))
                      AS BIGINT) AS micros
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT o_custkey, micros,
                 row_number() OVER (ORDER BY micros DESC, o_custkey) AS rn,
                 SUM(micros) OVER (ORDER BY micros DESC, o_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running,
                 COUNT(*) OVER () AS n,
                 SUM(micros) OVER () AS total
          FROM spend
        )
        SELECT CAST(floor((rn - 1) * 10 / n) AS BIGINT) AS rank_decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(MAX(running) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
                 AS cum_revenue_share
        FROM ranked
        GROUP BY rank_decile
        ORDER BY rank_decile
    """,
)
def revenue_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_prefix_sum, with_global_ranks

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * F.lit(1000000.0)))
        .cast("bigint")
        .alias("micros")
    )
    sort = [F.col("micros").desc(), F.col("o_custkey")]
    ranked, n = with_global_ranks(spend, sort, rank_col="rn")
    run = with_global_prefix_sum(
        ranked, sort, "micros", out_col="running"
    )
    # max over zero rows is NULL; 1 keeps the (never-evaluated-on-empty)
    # share divide well-defined
    total = int(
        run.agg(F.max("running").alias("t")).collect()[0]["t"] or 1
    )
    return ordered_small(
        run.select(
            F.floor((F.col("rn") - 1) * 10 / F.lit(max(n, 1))).cast("bigint")
            .alias("rank_decile"),
            "running",
        )
        .groupBy("rank_decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (F.max("running").cast("double") / F.lit(float(total)))
            .alias("cum_revenue_share"),
        ),
        "rank_decile",
    )


@register(
    "ols_price_vs_quantity",
    "A3-ext,A8",
    "Closed-form simple linear regression per l_returnflag: slope, "
    "intercept, Pearson r and R^2 of extendedprice vs quantity, all "
    "derived from six order-independent fixed-point sums (n, Sx, Sy, "
    "Sxy, Sxx, Syy — floor-to-micros in DECIMAL(38,0), the convention for "
    "full-mantissa computed doubles) in "
    "ONE aggregation pass — the deterministic alternative to "
    "regr_slope/corr, whose streaming updates make the result double "
    "partition-order-dependent. Every derived double follows the same "
    "IEEE op sequence on both engines.",
    oracle="""
        WITH s AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(floor(l_quantity * 1000000.0)
                      AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sx,
                 CAST(SUM(CAST(floor(l_extendedprice * 1000000.0)
                      AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sy,
                 CAST(SUM(CAST(floor(l_quantity * l_extendedprice * 1000000.0)
                      AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sxy,
                 CAST(SUM(CAST(floor(l_quantity * l_quantity * 1000000.0)
                      AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sxx,
                 CAST(SUM(CAST(floor(l_extendedprice * l_extendedprice
                      * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0
                   AS syy
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
               sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n)
                 AS intercept,
               (sxy - sx * sy / n)
               / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS pearson_r,
               ((sxy - sx * sy / n)
                / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)))
               * ((sxy - sx * sy / n)
                  / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)))
                 AS r_squared
        FROM s
        ORDER BY l_returnflag
    """,
)
def ols_price_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(F.floor(x * F.lit(1000000.0)).cast("decimal(38,0)")).cast("double") / F.lit(1000000.0)).alias("sx"),
        (F.sum(F.floor(y * F.lit(1000000.0)).cast("decimal(38,0)")).cast("double") / F.lit(1000000.0)).alias("sy"),
        (F.sum(F.floor((x * y) * F.lit(1000000.0)).cast("decimal(38,0)")).cast("double") / F.lit(1000000.0)).alias("sxy"),
        (F.sum(F.floor((x * x) * F.lit(1000000.0)).cast("decimal(38,0)")).cast("double") / F.lit(1000000.0)).alias("sxx"),
        (F.sum(F.floor((y * y) * F.lit(1000000.0)).cast("decimal(38,0)")).cast("double") / F.lit(1000000.0)).alias("syy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vary = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    slope = cov / varx
    r = cov / F.sqrt(varx * vary)
    return ordered_small(
        s.select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n_rows"),
            slope.alias("slope"),
            (F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n")))
            .alias("intercept"),
            r.alias("pearson_r"),
            (r * r).alias("r_squared"),
        ),
        "l_returnflag",
    )
