"""Slowly-changing-dimension type-2 merge.

The reference's Power BI sink wipes and reloads its dimensions each run
(SURVEY §2.1 S8); a 100 TB lakehouse cannot — it merges. ``scd2_merge`` is
the standard type-2 upsert as a pure DataFrame computation: one outer join
of the open slice against the update batch plus unions, no iterative logic,
deterministic for a deterministic input batch.

Contract (per key):
- at most one OPEN row in ``current`` (``valid_to IS NULL``); closed rows
  pass through untouched,
- ``updates`` carries at most one row per key (pre-deduplicate a raw feed
  with a latest-per-key top-1 first),
- an update whose tracked attributes equal the open row's is a no-op;
  a differing update CLOSES the open row at ``effective_ts`` and inserts a
  new open row valid from it; a new key inserts an open row.

Scale: one keyed shuffle (open ⟗ updates full-outer) sized by the dimension,
not the fact; closed history is a pass-through union branch that never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one SCD2 update batch; returns the merged dimension with the
    same columns as ``current`` (= key, attrs, valid_from, valid_to)."""
    closed = current.filter(F.col(valid_to).isNotNull())
    open_ = current.filter(F.col(valid_to).isNull())

    upd = updates.select(
        F.col(key),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(effective_col).alias("__eff"),
    )
    j = open_.join(upd, key, "full_outer")

    same = F.lit(True)
    for a in attrs:
        same = same & (
            F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        )
    has_open = F.col(valid_from).isNotNull()
    has_upd = F.col("__eff").isNotNull()

    # open rows kept open: no update, or update equal to current attrs
    kept = j.filter(has_open & (~has_upd | same)).select(
        key, *attrs, valid_from, valid_to
    )
    # open rows closed by a differing update
    closed_now = j.filter(has_open & has_upd & ~same).select(
        key,
        *attrs,
        valid_from,
        F.col("__eff").alias(valid_to),
    )
    # new open rows: differing update on an existing key, or a brand-new key
    opened = j.filter(has_upd & (~has_open | ~same)).select(
        key,
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast("string").alias(valid_to),
    )
    return closed.unionByName(kept).unionByName(closed_now).unionByName(opened)
