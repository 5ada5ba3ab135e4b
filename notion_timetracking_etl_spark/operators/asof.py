"""As-of join (engine extension): match each left row to the latest right row
at or before its timestamp, per key.

Spark has no native as-of join (pandas ``merge_asof`` is single-node; Flink and
kdb ship it as a primitive). The scalable formulation used here is the classic
union-and-carry-forward:

1. tag both inputs and union them into one (key, ts)-stream,
2. one shuffle: partition by key, sort by (ts, side, tiebreak),
3. carry the most recent right-side payload forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding row frame,
4. keep only left rows and unpack the carried struct.

Cost: ONE shuffle of |left| + |right| rows on the join keys — no range
explosion, no per-row binary search, no broadcast requirement on either side.
At 100 TB both sides stream through the same hash partitioning, partial sort
spills via the standard shuffle machinery, and AQE handles skewed keys. This
beats the naive alternatives: a theta-join (``l.ts >= r.ts``) degenerates to a
per-key cross product, and a windowed self-join needs a bound on how far back
the match can be.

Determinism: ties on (key, ts) between multiple right rows are broken by an
explicit monotone ``tiebreak`` column (largest wins), so the result is
independent of partitioning and input order.

Reference scope note: the reference engine (theHaruspex/notion-timetracking-etl)
has no as-of operator; this module is part of the training-data-pipeline
extension surface (BASELINE.json extension list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str,
    strict: bool = True,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the matching
    ``right`` row (latest ``right_ts`` <= / < ``left_ts`` per ``on`` key), or
    nulls when no right row precedes it.

    ``right_cols`` are the right-side payload columns to carry (exposed with an
    ``asof_`` prefix, plus ``asof_ts`` for the matched timestamp). ``tiebreak``
    is a right-side column breaking (key, ts) ties deterministically — the row
    with the LARGEST value wins.

    ``strict=True`` matches strictly-earlier right rows (``right_ts <
    left_ts``); ``False`` allows equal timestamps. Implemented by the side tag
    in the sort: at equal ts the right row sorts after the left row iff strict,
    so the unbounded-preceding frame excludes it.
    """
    payload = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
    )
    # Side tags order equal-ts rows: strict → right AFTER left (invisible to
    # the left row's frame); inclusive → right before left.
    left_side, right_side = (0, 1) if strict else (1, 0)

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        # -1, not NULL: engines disagree on null-ordering defaults (Spark asc
        # = nulls first, DuckDB = nulls last); a concrete sentinel below any
        # real id keeps the sort cross-engine identical.
        F.lit(-1).cast("long").alias("_tie"),
        F.lit(None).cast(_struct_type_of(right, payload)).alias("_r"),
    )
    # Right rows keep the join-key columns (they drive the partitionBy); every
    # other left-schema column is a typed null placeholder.
    r_tagged = right.select(
        *[
            (F.col(c) if c in on else F.lit(None).cast(dict(left.dtypes)[c])).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tie"),
        payload.alias("_r"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == left_side).select(
        *[F.col(c) for c in left.columns],
        F.col("_match.asof_ts").alias("asof_ts"),
        *[F.col(f"_match.asof_{c}").alias(f"asof_{c}") for c in right_cols],
    )


def _struct_type_of(df: DataFrame, col: Column) -> str:
    """DDL type of ``col`` evaluated against ``df`` (for a typed null)."""
    return df.select(col.alias("_probe")).schema["_probe"].dataType.simpleString()
