"""Banded range join (engine extension): pair rows whose timestamps fall
within a bounded offset window of each other, per key.

Spark's native answer to ``l.key = r.key AND r.ts BETWEEN l.ts+lo AND l.ts+hi``
is a broadcast-nested-loop or a sort-merge join with the range as a residual
filter — per key that is O(|l| x |r|) comparisons, which dies on hot keys at
scale. The standard fix (used by Databricks' range-join optimization and
interval libraries generally) is BUCKETING: quantize time into buckets of
exactly the window width, explode the probe side into the <=2 buckets its
window can touch, equi-join on (key, bucket), then apply the exact predicate
as a filter. Each qualifying pair is produced exactly once (the build-side row
lives in exactly one bucket), so no dedup pass is needed.

Cost: one shuffle of |l| * 2 + |r| rows on (key, bucket) — the pair space
explored is linear in the true matches plus same-bucket near-misses, never the
per-key cross product. Bucket width == window width is the sweet spot: wider
buckets admit more false candidates, narrower ones explode the probe side
further.

Reference scope note: the reference engine has no range-join operator; this
module is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` x ``right`` on equal ``on`` keys where
    ``left_ts + lower_s <= right_ts < left_ts + upper_s`` (seconds, half-open).

    Right columns that collide with left names must be renamed by the caller
    (standard Spark join hygiene). ``how`` supports ``inner`` and
    ``left_outer`` (unmatched left rows padded with nulls, emitted once).
    """
    if upper_s <= lower_s:
        raise ValueError("empty band: upper_s must exceed lower_s")
    width_us = (upper_s - lower_s) * 1_000_000
    lo_us = lower_s * 1_000_000
    hi_us = upper_s * 1_000_000

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    def floor_div(x, w: int):
        # Exact floor division on long micros: pmod is non-negative, so the
        # numerator is exactly divisible and the double divide is exact (both
        # operands and the integral quotient are < 2^53). A bare
        # ``(x / w).cast(long)`` would truncate toward zero (wrong for
        # pre-epoch timestamps) and round through an inexact double.
        return ((x - F.pmod(x, F.lit(w))) / F.lit(w)).cast("long")

    # Probe side: the window [ts+lo, ts+hi) spans at most two width-sized
    # buckets; array_distinct collapses the aligned case.
    l_exploded = left.withColumn(
        "_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    floor_div(l_us + lo_us, width_us),
                    floor_div(l_us + hi_us - 1, width_us),
                )
            )
        ),
    )
    r_bucketed = right.withColumn("_bucket", floor_div(r_us, width_us))

    joined = l_exploded.join(r_bucketed, on=[*on, "_bucket"], how="inner").filter(
        (r_us >= l_us + lo_us) & (r_us < l_us + hi_us)
    )
    if how == "inner":
        return joined.drop("_bucket")
    if how != "left_outer":
        raise ValueError(f"unsupported how: {how}")
    # Left-outer: re-attach unmatched left rows once (not once per bucket).
    matched_keys = joined.select(*left.columns).distinct()
    unmatched = left.join(matched_keys, on=left.columns, how="left_anti")
    pad = unmatched.select(
        *left.columns,
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(c)
            for c in right.columns
            if c not in on
        ],
    )
    return joined.drop("_bucket").unionByName(pad)
