"""Deterministic corpus sampling (engine extension): the selection ops a
training-data pipeline runs after dedup/quality — class-balanced stratified
capping and weighted multi-source mixing.

Both are built on **hash ordering**, not ``rand()``: ``md5(doc_id)`` gives
every row a uniform, engine-independent draw, so the sample is (a) exactly
reproducible run-to-run and cluster-to-cluster, (b) stable under
repartitioning (no dependence on partition iteration order, unlike
``rand(seed)`` whose stream is per-partition), and (c) cross-engine
checkable — DuckDB's ``md5`` produces the identical lowercase hex, so the
oracle can replay the exact selection. This is the Spark-native analogue of
the hash-mod sharding every large corpus pipeline uses for held-out splits.

Reference scope note: the reference engine has no sampling operators; this
module is part of the training-data-pipeline extension surface.

Scale design:

- ``topk_per_group`` is the skew-proof exact top-k-per-key: a single
  ``row_number`` window puts an entire group in ONE task, and corpus strata
  are maximally skewed (90% of a crawl is one language). Phase 1 salts each
  group into ``salt_buckets`` sub-groups hashed off the ORDER columns and
  takes a local top-k (any global top-k row is top-k within its bucket, so
  no candidate is lost); phase 2 re-ranks the ≤ k×buckets survivors per
  group — bounded input, safe in one task per group. Two narrow window
  shuffles, no single-partition funnel, largest task ≤ max(|stratum|/buckets,
  k×buckets).
- ``weighted_keep`` is a pure map-side filter (one hex-string compare per
  row, no shuffle at all): keep a row iff the first 8 md5 hex chars —
  a uniform draw in [0, 2^32) — fall below ``floor(weight × 2^32)``
  rendered as 8-digit hex. Fixed-width lowercase hex compares
  lexicographically as the integer compare, JVM-side, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def hash_draw(col: Column) -> Column:
    """Deterministic uniform draw for a row: md5 hex of the key's string
    form. Total-ordered, engine-independent, repartition-stable."""
    return F.md5(col.cast("string"))


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_buckets: int = 32,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact ascending top-``k`` rows per group, skew-proof.

    ``order_cols`` must define a TOTAL order (append a unique id as the last
    key) or ties make the result nondeterministic. When ``rank_col`` is
    given, the final 1-based rank is attached under that name.
    """
    asc = [c.asc() for c in order_cols]
    salt = F.pmod(F.xxhash64(*order_cols), F.lit(salt_buckets))
    local = (
        df.withColumn("_salt", salt)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*group_cols, "_salt").orderBy(*asc)
            ),
        )
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    ranked = local.withColumn(
        rank_col or "_rn",
        F.row_number().over(Window.partitionBy(*group_cols).orderBy(*asc)),
    )
    out = ranked.filter(F.col(rank_col or "_rn") <= k)
    return out if rank_col else out.drop("_rn")


def weight_threshold_hex(weight: float) -> str | None:
    """``floor(weight × 2^32)`` as 8-digit lowercase hex, or None for
    keep-everything (weight ≥ 1 would need 9 digits and always-true is
    cheaper and exact)."""
    if weight >= 1.0:
        return None
    if weight <= 0.0:
        return "00000000"
    return format(int(weight * 2**32), "08x")


def weighted_keep(draw: Column, weight: float) -> Column:
    """Boolean keep-predicate: the row's draw falls in [0, weight)."""
    thresh = weight_threshold_hex(weight)
    if thresh is None:
        return F.lit(True)
    return F.substring(draw, 1, 8) < F.lit(thresh)


def weighted_mix(
    df: DataFrame, source_col: str, id_col: str, weights: dict[str, float]
) -> DataFrame:
    """Filter a multi-source corpus to the per-source sampling weights.

    Sources absent from ``weights`` are dropped (weight 0) — the explicit
    contract of a mixing recipe. Pure map-side: no shuffle, no driver data.
    """
    draw = hash_draw(F.col(id_col))
    keep = F.lit(False)
    for source, weight in weights.items():
        keep = F.when(
            F.col(source_col) == source, weighted_keep(draw, weight)
        ).otherwise(keep)
    return df.filter(keep)


def ares_key(id_col: Column, weight: Column) -> Column:
    """A-Res (Efraimidis–Spirakis) priority for weighted sampling WITHOUT
    replacement: key = ln(u) / w with u a deterministic uniform draw in
    (0, 1] from the row's md5 — the k largest keys form an exact weighted
    sample. Everything is engine-replayable: the 52-bit hex prefix converts
    exactly to a double, and ln on these inputs is bit-identical across the
    JVM, DuckDB and glibc (verified empirically; the parity hash gate would
    catch any platform where it is not). Map-side only — sampling becomes
    a global top-k on the key, no shuffle beyond TakeOrdered."""
    bits = F.conv(F.substring(hash_draw(id_col), 1, 13), 16, 10).cast("bigint")
    u = (bits.cast("double") + F.lit(1.0)) / F.lit(4503599627370496.0)  # 2^52
    return F.log(u) / weight.cast("double")
