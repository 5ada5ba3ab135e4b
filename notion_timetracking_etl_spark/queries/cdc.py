"""Change-data-capture apply (engine extension): MERGE-style application of
an insert/update/delete changelog to produce the current snapshot — the
incremental-ingest primitive the reference's wipe+reload sink sidesteps
(`src/pbi/refresh.ts` recomputes everything) but any 100 TB deployment
needs: a day's CDC stream is many orders of magnitude smaller than the
table it mutates.

The changelog here is derived DETERMINISTICALLY from the orders table (the
testdata carries no change stream): every order INSERTs at seq 1; orders
with o_orderkey % 3 == 0 get a seq-2 UPDATE (+1.0 to the price, exact in
micro units, status flipped to 'U'); orders with o_orderkey % 7 == 0 get a
seq-3 DELETE. The derivation is one map-side explode of a per-row change
array — a fixture-generation seam; in production the changelog is the
input.

Apply = last-write-wins per key: ONE groupBy(key) taking MAX over a
(seq, op, payload) comparison struct — seq is the leading field, so the
struct max IS the latest change, with no per-key window sort and full
map-side combine. Keys whose winner is a DELETE drop out. The oracle
replays the same changelog and picks the winner via ROW_NUMBER, so the hash
match proves struct-max apply == windowed MERGE semantics. Cost at scale:
one keyed shuffle of the CHANGELOG (not the table), output ordered by a
distributed range sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..sources.tpch import load_table
from .registry import register

# price in exact micro units; the update adds exactly 1.0
_PRICE_MICROS_SQL = "CAST(floor(o_totalprice * 1000000.0) AS BIGINT)"
_UPDATE_DELTA_MICROS = 1_000_000

_CHANGELOG_SQL = f"""
  changelog AS (
    SELECT o_orderkey AS k, 1 AS seq, 'I' AS op,
           {_PRICE_MICROS_SQL} AS price_micros,
           o_orderstatus AS status
    FROM orders
    UNION ALL
    SELECT o_orderkey, 2, 'U',
           {_PRICE_MICROS_SQL} + {_UPDATE_DELTA_MICROS}, 'U'
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, 3, 'D', NULL, NULL
    FROM orders WHERE o_orderkey % 7 = 0
  )
"""


def changelog_from_orders(orders: DataFrame) -> DataFrame:
    """Deterministic (k, seq, op, price_micros, status) change stream —
    one map-side explode per order row, no shuffle."""
    price = F.floor(F.col("o_totalprice") * F.lit(1000000.0)).cast("bigint")
    changes = F.array(
        F.struct(
            F.lit(1).alias("seq"),
            F.lit("I").alias("op"),
            price.alias("price_micros"),
            F.col("o_orderstatus").alias("status"),
        ),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.struct(
                F.lit(2).alias("seq"),
                F.lit("U").alias("op"),
                (price + F.lit(_UPDATE_DELTA_MICROS)).alias("price_micros"),
                F.lit("U").alias("status"),
            ),
        ),
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.struct(
                F.lit(3).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("bigint").alias("price_micros"),
                F.lit(None).cast("string").alias("status"),
            ),
        ),
    )
    return orders.select(
        F.col("o_orderkey").alias("k"),
        F.explode(F.filter(changes, lambda c: c.isNotNull())).alias("c"),
    ).select("k", "c.seq", "c.op", "c.price_micros", "c.status")


def apply_changelog(changelog: DataFrame) -> DataFrame:
    """Last-write-wins MERGE apply: max comparison struct per key, DELETE
    winners dropped. One keyed shuffle with map-side combine."""
    winner = F.max(
        F.struct("seq", "op", "price_micros", "status")
    ).alias("_w")
    return (
        changelog.groupBy("k")
        .agg(winner)
        .filter(F.col("_w.op") != "D")
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("_w.seq").cast("bigint").alias("last_seq"),
            F.col("_w.op").alias("last_op"),
            F.col("_w.price_micros").alias("price_micros"),
            F.col("_w.status").alias("status"),
        )
    )


@register(
    "cdc_apply_changelog",
    "ext:cdc,A6-analog,S8-analog",
    "MERGE-style CDC apply: a deterministic I/U/D changelog derived from "
    "orders (seq-1 INSERT for all; seq-2 UPDATE price+1.0 for keys % 3; "
    "seq-3 DELETE for keys % 7) collapses to the current snapshot via ONE "
    "groupBy(key) MAX over a (seq, op, payload) comparison struct — "
    "last-write-wins with full map-side combine, never a per-key window — "
    "then DELETE winners drop. The oracle replays the changelog and picks "
    "winners with ROW_NUMBER, proving struct-max apply == MERGE semantics. "
    "Scale: one keyed shuffle of the changelog, distributed output sort.",
    oracle=f"""
        WITH {_CHANGELOG_SQL},
        ranked AS (
          SELECT k, seq, op, price_micros, status,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
          FROM changelog
        )
        SELECT k AS o_orderkey,
               CAST(seq AS BIGINT) AS last_seq,
               op AS last_op,
               price_micros,
               status
        FROM ranked
        WHERE rn = 1 AND op <> 'D'
        ORDER BY o_orderkey
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return apply_changelog(changelog_from_orders(orders)).orderBy(
        "o_orderkey"
    )
