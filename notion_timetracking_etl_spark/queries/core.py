"""Core relational queries over the TPC-H-ish testdata.

Covers SURVEY §2 families: projections/filters (P), equi-joins incl. broadcast
dim lookups and semi/anti (J), grouped aggregations (A), dedup-to-dimension
(A6), ordering/top-k (O), set ops (U).

Scale notes (100 TB posture):
- Dim joins (region/nation/customer/supplier/part) are explicitly
  ``F.broadcast``-hinted: they are the small side by construction, so the fact
  table never shuffles for them.
- Aggregations are expressed as single groupBy chains → Catalyst plans partial
  (map-side) aggregation before the exchange.
- All filters sit directly on the scan columns → parquet predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..sources.tpch import load_table
from .helpers import davg, davg_sql, dsum, dsum_sql
from .registry import register


@register(
    "pricing_summary",
    "P2,A3,A8,O2",
    "TPC-H Q1-style pricing summary: filtered scan, grouped exact sums/avgs/"
    "counts, deterministic ordering. The flagship query (entry()).",
    oracle=f"""
        SELECT
          l_returnflag,
          l_linestatus,
          {dsum_sql("l_quantity", "sum_qty")},
          {dsum_sql("l_extendedprice", "sum_base_price")},
          {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
          {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
          {davg_sql("l_quantity", "avg_qty")},
          {davg_sql("l_extendedprice", "avg_price")},
          {davg_sql("l_discount", "avg_disc")},
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "filter_project",
    "P1,P2,F15,F36",
    "Canonicalizing projection with null-normalization and coalesce fallback "
    "chain (reference: RawRecord→Timeslice projection, timeslice.ts:231-320).",
    oracle="""
        SELECT
          o_orderkey,
          lower(o_orderstatus) AS status_norm,
          COALESCE(NULLIF(trim(o_orderpriority), ''), 'priority_unknown') AS priority_label,
          CAST(o_totalprice AS DOUBLE) AS total_price,
          CASE WHEN o_totalprice >= 200000 THEN 'large'
               WHEN o_totalprice >= 50000 THEN 'medium'
               ELSE 'small' END AS size_band
        FROM orders
        WHERE o_orderstatus <> 'F' AND o_custkey IS NOT NULL
        ORDER BY o_orderkey
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") != "F") & F.col("o_custkey").isNotNull())
        .select(
            "o_orderkey",
            F.lower("o_orderstatus").alias("status_norm"),
            F.coalesce(
                F.nullif(F.trim("o_orderpriority"), F.lit("")),
                F.lit("priority_unknown"),
            ).alias("priority_label"),
            F.col("o_totalprice").cast("double").alias("total_price"),
            F.when(F.col("o_totalprice") >= 200000, "large")
            .when(F.col("o_totalprice") >= 50000, "medium")
            .otherwise("small")
            .alias("size_band"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fact_dim_enrichment",
    "J1,J2,J3,A3",
    "Fact→dim broadcast lookup chain with label fallback on miss "
    "(reference: derive/index.ts:104-150 map probes + 'unknown' fallbacks): "
    "lineitem → orders → customer → nation → region, revenue per region/nation.",
    oracle=f"""
        SELECT
          COALESCE(r.r_name, 'region_unknown') AS region_name,
          COALESCE(n.n_name, 'nation_unknown') AS nation_name,
          {dsum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
          COUNT(*) AS line_count,
          COUNT(DISTINCT o.o_custkey) AS customer_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def fact_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
    )
    return (
        joined.groupBy(
            F.coalesce("r_name", F.lit("region_unknown")).alias("region_name"),
            F.coalesce("n_name", F.lit("nation_unknown")).alias("nation_name"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
            F.countDistinct("o_custkey").alias("customer_count"),
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "anti_join_integrity",
    "J7,O4",
    "Referential-integrity anti-join with offender sample "
    "(reference: derive/index.ts:220-232 assertNoMissing + ≤10 sample): "
    "customers with no orders.",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        ANTI JOIN orders o ON c.c_custkey = o.o_custkey
        ORDER BY c.c_custkey
    """,
)
def anti_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "semi_join_diagnostics",
    "J8,A10",
    "Semi-join set diagnostics (reference: diagnose-stage-relations.ts:62-96 "
    "resolved/unresolved counts): parts referenced by lineitem, per brand.",
    oracle="""
        SELECT p.p_brand, COUNT(*) AS part_count
        FROM part p
        SEMI JOIN lineitem l ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
        ORDER BY p.p_brand
    """,
)
def semi_join_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("part_count"))
        .orderBy("p_brand")
    )


@register(
    "dedup_dimension",
    "A6,O1,F19",
    "Distinct/dedup-to-dimension with composite formatted label "
    "(reference: derive/index.ts:196-218 DimStage build + 'NN. label'): "
    "distinct (returnflag, linestatus) dim rows, key-ordered.",
    oracle="""
        SELECT DISTINCT
          l_returnflag,
          l_linestatus,
          concat(l_returnflag, '|', l_linestatus) AS dim_key,
          concat(lpad(CAST(l_linenumber AS VARCHAR), 2, '0'), '. ', l_returnflag) AS stage_label
        FROM lineitem
        ORDER BY dim_key, stage_label
    """,
)
def dedup_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.concat_ws("|", "l_returnflag", "l_linestatus").alias("dim_key"),
            F.concat(
                F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
                F.lit(". "),
                F.col("l_returnflag"),
            ).alias("stage_label"),
        )
        .dropDuplicates()
        .orderBy("dim_key", "stage_label")
    )


@register(
    "topk_by_recency",
    "O3,O4",
    "Top-k by composite recency ordering (reference: datasetRegistry.ts:82-114 "
    "most-recent-entry sort): top 15 orders by orderdate desc, totalprice desc, "
    "orderkey asc.",
    oracle="""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
               CAST(o_totalprice AS DOUBLE) AS total_price
        FROM orders
        ORDER BY o_orderdate DESC, o_totalprice DESC, o_orderkey ASC
        LIMIT 15
    """,
)
def topk_by_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(
            F.col("o_orderdate").desc(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        .limit(15)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
            F.col("o_totalprice").cast("double").alias("total_price"),
        )
    )


@register(
    "set_operations",
    "U1,U2,U3",
    "Union / intersect / except over key sets (reference: "
    "diagnose-stage-relations.ts:145-164 resolved-vs-unresolved id sets): "
    "customers split by order-status presence.",
    oracle="""
        WITH open_c AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
             done_c AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        SELECT 'both' AS bucket, COUNT(*) AS n FROM (SELECT k FROM open_c INTERSECT SELECT k FROM done_c) t
        UNION ALL
        SELECT 'open_only' AS bucket, COUNT(*) AS n FROM (SELECT k FROM open_c EXCEPT SELECT k FROM done_c) t
        UNION ALL
        SELECT 'done_only' AS bucket, COUNT(*) AS n FROM (SELECT k FROM done_c EXCEPT SELECT k FROM open_c) t
        ORDER BY bucket
    """,
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    done_c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    both = open_c.intersect(done_c).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    open_only = open_c.exceptAll(done_c).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("open_only").alias("bucket"), "n"
    )
    done_only = done_c.exceptAll(open_c).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("done_only").alias("bucket"), "n"
    )
    return both.unionByName(open_only).unionByName(done_only).orderBy("bucket")


@register(
    "coverage_ratio",
    "P9,A9",
    "Non-null/non-empty coverage percentage (reference: "
    "validate-workflow-instance-page-name.ts:49-54): props coverage on events.",
    oracle="""
        SELECT
          event_type,
          COUNT(*) AS total_rows,
          CAST(SUM(CASE WHEN COALESCE(NULLIF(trim(props), ''), NULL) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS covered_rows,
          CAST(SUM(CASE WHEN COALESCE(NULLIF(trim(props), ''), NULL) IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) AS coverage
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def coverage_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    covered = F.when(F.nullif(F.trim("props"), F.lit("")).isNotNull(), 1).otherwise(0)
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(covered).alias("covered_rows"),
            (F.sum(covered).cast("double") / F.count(F.lit(1))).alias("coverage"),
        )
        .orderBy("event_type")
    )


@register(
    "conditional_flags",
    "A8,A7",
    "Scalar counts + boolean flag aggregate (reference: quality/index.ts:36-44 "
    "report totals + no_to_step_in_run flag).",
    oracle="""
        SELECT
          COUNT(*) AS total_orders,
          CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
            AS open_orders,
          CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS negative_price_orders,
          (SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) = 0) AS no_negative_prices
        FROM orders
    """,
)
def conditional_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    neg = F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
    return orders.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("open_orders"),
        neg.alias("negative_price_orders"),
        (neg == 0).alias("no_negative_prices"),
    )
