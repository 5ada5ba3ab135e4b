"""Classic TPC-H-shape join queries over the testdata star schema (engine
extension): the multi-way join + aggregate + top-k patterns every warehouse
workload reduces to, exercising the customer/supplier/nation/region
dimensions the operator inventory otherwise touches lightly.

Scale design: Catalyst drives the physical strategy — the date/segment
filters push into the parquet scans, the small dimensions (region, nation,
supplier, customer at dim-scale) broadcast, and only lineitem⋈orders runs
as a shuffled join on the already-filtered fact rows; AQE reorders and
re-sizes at runtime. Revenue uses the decimal-exact dsum convention over
the per-row ``l_extendedprice * (1 - l_discount)`` double product (one IEEE
multiply/subtract per row — identical on both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..sources.tpch import load_table
from .helpers import dsum, dsum_sql, ordered_small
from .registry import register

_REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_shipping_priority",
    "J1,A3,O3",
    "TPC-H Q3 shape: BUILDING-segment orders placed before 1998-07-01 with "
    "lineitems shipped after it — 3-way join, decimal-exact revenue "
    "aggregation per (order, date, priority), top-10 by revenue. The "
    "filters reach the scans; customer broadcasts; lineitem⋈orders is the "
    "only shuffled join.",
    oracle=f"""
        SELECT l.l_orderkey,
               {dsum_sql(_REVENUE.replace("l_", "l.l_"), "revenue")},
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-07-01'
          AND l.l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
)
def tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    joined = li.join(
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
        ),
        li.l_orderkey == orders.o_orderkey,
    )
    top = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.expr(_REVENUE)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )
    return ordered_small(top, "revenue", "o_orderdate", "l_orderkey")


@register(
    "tpch_local_supplier_volume",
    "J1,J2,A3,O2",
    "TPC-H Q5 shape: revenue from ASIA-region orders in 1997 where the "
    "supplier and customer share a nation — a 6-way join whose dimension "
    "chain (region→nation→supplier/customer) broadcasts end-to-end, "
    "leaving one shuffled fact join. Decimal-exact revenue per nation.",
    oracle=f"""
        SELECT n.n_name,
               {dsum_sql(_REVENUE.replace("l_", "l.l_"), "revenue")}
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
             AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n_name
    """,
)
def tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == cust.c_custkey)
            & (cust.c_nationkey == F.col("s_nationkey")),
        )
    )
    return ordered_small(
        joined.groupBy("n_name").agg(dsum(F.expr(_REVENUE)).alias("revenue")),
        "revenue",
        "n_name",
    )


@register(
    "unpivot_lineitem_measures",
    "U-ext-unpivot",
    "Wide-to-long unpivot (melt) of the four lineitem measures into "
    "(measure, val) pairs — the inverse of pivot, the normalization step "
    "before generic per-measure aggregation/quality profiling. Pure "
    "Expand-node projection: no shuffle except the output ordering, and "
    "the O(4·rows) result uses a distributed orderBy per the corpus-sized "
    "output rule.",
    oracle="""
        SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val
        FROM (
          UNPIVOT lineitem
          ON l_quantity, l_extendedprice, l_discount, l_tax
          INTO NAME measure VALUE val
        )
        ORDER BY l_orderkey, l_linenumber, measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    ).orderBy("l_orderkey", "l_linenumber", "measure")


_ABOVE_AVG_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(o2.o_totalprice)
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey
"""


@register(
    "orders_above_customer_avg",
    "P-ext,A3,J1",
    "Correlated scalar subquery: orders priced above 1.5x their own "
    "customer's average — written as the correlated ANSI form and left to "
    "Catalyst, which DECORRELATES it into one per-customer aggregate plus "
    "a broadcast hash join (verified on the physical plan: no re-executed "
    "per-row subquery, one aggregate pass). The threshold average uses the "
    "decimal-exact davg convention, so the boundary comparison cannot flip "
    "on partial-sum order. Identical SQL runs on both engines.",
    oracle=_ABOVE_AVG_SQL,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # O(orders) output -> the ORDER BY is a distributed range sort
    return spark.sql(_ABOVE_AVG_SQL)


@register(
    "tpch_returned_top_customers",
    "J1,A3,O3",
    "TPC-H Q10 shape: customers ranked by revenue lost to returned lineitems "
    "(l_returnflag = 'R') in 1997H2, with their nation — lineitem filter "
    "pushed to the scan, orders date-filtered at its scan, customer/nation "
    "broadcast onto the aggregated fact, top-20 by revenue. Decimal-exact "
    "revenue; only lineitem-orders shuffles.",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {dsum_sql(_REVENUE.replace("l_", "l.l_"), "revenue")}
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-07-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def tpch_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    top = (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.expr(_REVENUE)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )
    return ordered_small(top, "revenue", "c_custkey")


@register(
    "tpch_priority_linestatus_counts",
    "A2,J1",
    "TPC-H Q12 shape: per l_linestatus, how many 1997-shipped lineitems "
    "belong to high-priority (1-URGENT/2-HIGH) vs lower-priority orders — "
    "the conditional-count (A2) pattern at fact scale. One shuffled "
    "fact-fact join on orderkey; the CASE counts partial-aggregate "
    "map-side, so the shuffle after the join carries one row per "
    "(status, partial) pair.",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_linestatus
        ORDER BY l_linestatus
    """,
)
def tpch_priority_linestatus_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return ordered_small(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        ),
        "l_linestatus",
    )


@register(
    "tpch_supplier_breadth",
    "A1,J7,J1",
    "TPC-H Q16 shape: supplier breadth — distinct suppliers serving each "
    "(p_brand, size bucket) outside one excluded brand, minus suppliers "
    "with negative account balance (the complaints anti-join stand-in). "
    "Broadcast anti-join prunes the fact rows BEFORE the distinct, the "
    "part dim broadcasts, and COUNT(DISTINCT suppkey) partial-aggregates "
    "on (brand, bucket, suppkey) first — no row-stream funnel.",
    oracle="""
        SELECT p.p_brand,
               CAST(floor(p.p_size / 10) AS BIGINT) AS size_bucket,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#45'
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, size_bucket
        ORDER BY supplier_cnt DESC, p_brand, size_bucket
    """,
)
def tpch_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#45")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pruned = li.join(
        F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti"
    ).join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
           F.col("l_partkey") == F.col("p_partkey"))
    return ordered_small(
        pruned.groupBy(
            "p_brand",
            F.floor(F.col("p_size") / 10).cast("bigint").alias("size_bucket"),
        )
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")),
        "supplier_cnt",
        "p_brand",
        "size_bucket",
    )
