"""Sketch & distribution-summary queries (engine extension).

``heavy_hitter_tokens`` exercises the Misra-Gries candidates-then-verify
pattern (``operators/sketch.py``): the answer is defined by the exact integer
predicate ``count * k > n``, so it is deterministic and oracle-checkable even
though the candidate phase is an approximate map-side sketch.

``quantile_summary`` pins the cross-engine float convention for order
statistics: exact interpolated percentiles (Spark ``percentile`` == DuckDB
``quantile_cont``, both p*(n-1) linear interpolation) rounded to 6 decimals on
both sides, plus the decimal-exact mean from queries/helpers.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.dedup import words
from ..operators.sketch import heavy_hitters
from ..sources.tpch import load_table
from .helpers import davg, davg_sql, ordered_small
from .registry import register

HH_K = 100  # heavy-hitter threshold: tokens with count > n/100


@register(
    "heavy_hitter_tokens",
    "A7-analog,F20",
    "Misra-Gries heavy hitters over the document token stream: all tokens "
    "with frequency > n/100 and their exact counts. Map-side MG summaries "
    "(<=k candidate rows per partition, no raw-stream shuffle) + exact "
    "verification via integer cross-multiplication — deterministic under any "
    "partitioning.",
    oracle=f"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS item
          FROM documents
        ),
        tot AS (SELECT count(*) AS n FROM toks)
        SELECT item, CAST(count(*) AS BIGINT) AS cnt
        FROM toks, tot
        GROUP BY item, n
        HAVING count(*) * {HH_K} > n
        ORDER BY item
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stream = docs.select(F.explode(words(F.col("text"))).alias("item"))
    # Result is bounded by construction: at most k-1 items can exceed n/k.
    return ordered_small(heavy_hitters(stream, "item", HH_K), "item")


@register(
    "quantile_summary",
    "A3-analog",
    "Per-event-type value distribution: count, decimal-exact mean, and exact "
    "interpolated p50/p90/p99 (Spark percentile == DuckDB quantile_cont, "
    "rounded to 6dp both sides). One shuffle on the 5-value type key with "
    "map-side partial aggregation.",
    oracle=f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               {davg_sql("value", "avg_value")},
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale note: exact percentile is HOLISTIC — the aggregation buffer
    # accumulates every value of the group, so each of the (few) group keys
    # funnels through one reducer. Correct here and cross-engine checkable,
    # but at 100 TB the real plan is quantile_summary_approx below.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg(F.col("value")).alias("avg_value"),
            F.round(F.percentile(F.col("value"), F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile(F.col("value"), F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile(F.col("value"), F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


APPROX_PCT_ACCURACY = 10000
_PCTS = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


def _quantile_rank_bound_check(s_rows, s_cols, con):
    """GK rank-error bound vs the exact distribution (ADVICE/verdict r3:
    give the approx sketch a failure mode).

    approx_percentile(…, accuracy) guarantees the returned value's RANK is
    within n/accuracy of the target rank. We widen by two rank slots
    (2/n per group) for quantile_disc's own rank rounding, so the window
    never collapses to zero width at small n: every reported pX must lie
    within [quantile_disc(p-eps), quantile_disc(p+eps)] of that group's
    exact value distribution. A broken sketch (shifted, swapped groups,
    garbage merge) lands outside and fails the parity harness."""
    idx = {c: i for i, c in enumerate(s_cols)}
    errs = []
    for row in s_rows:
        etype = row[idx["event_type"]]
        n = max(int(row[idx["n_events"]]), 1)
        eps = 2.0 / APPROX_PCT_ACCURACY + 2.0 / n
        for col, p in _PCTS.items():
            lo, hi = con.execute(
                f"""
                SELECT quantile_disc(value, {max(p - eps, 0.0)}),
                       quantile_disc(value, {min(p + eps, 1.0)})
                FROM events WHERE event_type = ?
                """,
                [etype],
            ).fetchone()
            v = row[idx[col]]
            if v is None or not (lo <= v <= hi):
                errs.append(f"{etype}.{col}={v} outside [{lo}, {hi}]")
    return "; ".join(errs) or None


@register(
    "quantile_summary_approx",
    "A3-analog",
    "The 100 TB path for quantile_summary: approx_percentile's mergeable "
    "sketch (Greenwald-Khanna) keeps the aggregation buffer bounded "
    "(~1/accuracy), so partial aggregation works map-side and no reducer "
    "ever holds a group's full value set. Sketch internals are engine-"
    "specific, so the driver records rows-only; the parity harness "
    "additionally asserts every estimate sits within the documented "
    "rank-error bound of the exact distribution (see "
    "_quantile_rank_bound_check).",
    oracle=None,
    check=_quantile_rank_bound_check,
)
def quantile_summary_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr(
        f"approx_percentile(value, array(0.5, 0.9, 0.99), {APPROX_PCT_ACCURACY})"
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pct.getItem(0).alias("p50"),
            pct.getItem(1).alias("p90"),
            pct.getItem(2).alias("p99"),
        )
        .orderBy("event_type")
    )


CM_TOPN = 20  # probe the top-N exact tokens against the sketch


@register(
    "countmin_token_frequency",
    "A7-analog,F20-analog",
    "Count-Min sketch audit over the document token stream: build the "
    "mergeable depth=4 x width=1024 counter table in ONE scan (each "
    "occurrence fans out to 4 cells map-side; the shuffle moves counter "
    "cells, never the stream), then probe the top-20 exact tokens — "
    "estimate = min over rows of the salted-sha256 bucket counters. "
    "Deterministic end-to-end (integer counters, hash64 bucket convention) "
    "and structurally an OVERestimate: overcount = est - exact >= 0 for "
    "every probe, the CMS one-sided error invariant the oracle re-proves "
    "cell by cell.",
    oracle=f"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
            AS item
          FROM documents
        ),
        rows_ AS (SELECT unnest(generate_series(0, 3)) AS row),
        counters AS (
          SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS counter
          FROM (
            SELECT r.row,
                   CAST(concat('0x', substr(sha256(
                        concat('cm', r.row, ':', item)), 1, 8)) AS BIGINT)
                     % 1024 AS bucket
            FROM toks, rows_ r
          )
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_cnt
          FROM toks GROUP BY 1
        ),
        top_n AS (
          SELECT item, exact_cnt
          FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, item)
                  AS rn FROM exact)
          WHERE rn <= {CM_TOPN}
        ),
        probes AS (
          SELECT t.item, t.exact_cnt, r.row,
                 CAST(concat('0x', substr(sha256(
                      concat('cm', r.row, ':', t.item)), 1, 8)) AS BIGINT)
                   % 1024 AS bucket
          FROM top_n t, rows_ r
        )
        SELECT p.item,
               CAST(MAX(p.exact_cnt) AS BIGINT) AS exact_cnt,
               CAST(MIN(c.counter) AS BIGINT) AS cms_est,
               CAST(MIN(c.counter) - MAX(p.exact_cnt) AS BIGINT)
                 AS overcount
        FROM probes p JOIN counters c USING (row, bucket)
        GROUP BY p.item
        ORDER BY item
    """,
)
def countmin_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import countmin_counters, countmin_estimate

    docs = load_table(spark, sf_dir, "documents")
    stream = docs.select(F.explode(words(F.col("text"))).alias("item"))
    counters = countmin_counters(stream, "item")
    exact = (
        stream.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
    )
    top_n = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("item").asc()
    ).limit(CM_TOPN)
    est = countmin_estimate(top_n.select("item"), counters)
    return ordered_small(
        top_n.join(est, "item").select(
            "item",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overcount"),
        ),
        "item",
    )
