"""Table-profiling query (engine extension): the per-column statistics pass
every large-scale data pipeline runs before training — null counts, distinct
cardinalities, ranges — computed for all columns in ONE scan.

Scale design: a single global Aggregate computes every per-column statistic
in one pass (Catalyst's Expand handles the multiple COUNT(DISTINCT)s — one
scan, expand factor = number of distinct-counted columns, all partial-
aggregated map-side). The wide 1-row result is then stacked to long form
with a pure projection. The DuckDB oracle states the same statistics as a
UNION ALL of per-column aggregates (the oracle may scan N times; the engine
under test must not).

At 100 TB the COUNT(DISTINCT) columns would switch to approx_count_distinct
(same shape as occupancy_hourly_approx); exact distincts keep this query
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..sources.tpch import load_table
from .helpers import ordered_small
from .registry import register

PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS DOUBLE) AS min_val,
               CAST(max({c}) AS DOUBLE) AS max_val
        FROM lineitem
        """
        for c in PROFILE_COLS
    ]
    return (
        "SELECT * FROM (" + " UNION ALL ".join(parts) + ") ORDER BY column_name"
    )


@register(
    "profile_lineitem_measures",
    "A-ext-profile,A1,A4",
    "One-pass column profiler over the four lineitem measures: row/null/"
    "distinct counts and min/max per column from a SINGLE scan (Expand-"
    "based multi-distinct, map-side partials), stacked to long form by a "
    "projection. The oracle restates each column's stats independently.",
    oracle=_profile_oracle(),
)
def profile_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in PROFILE_COLS
    )
    long = wide.select(
        "n_rows",
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, nn, n_distinct, min_val, max_val)"
        ),
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("nn")).cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val",
        "max_val",
    )
    return ordered_small(long, "column_name")
