"""Interleaved A/B for the round-13 CC conf-isolation + leg-overlap change.

tools/ab.py shadows QUERY modules from a git rev, but this change lives in
operators/cluster.py (plus the forget.py overlap helper), and a shadow of an
operators module cannot re-register queries. Instead this script holds a
verbatim copy of the ROUND-12 connected_components (session-conf set/restore,
persisted undirected edges) and monkeypatches it — together with a sequential
_cluster_assign_overlapped — into every consumer module for the OLD runs,
restoring the working-tree implementations for the NEW runs. One session,
alternating OLD, NEW, OLD, NEW per query (the round-12 measurement caveat:
cross-session comparisons drown in JVM warm-up drift).

Usage: python tools/ab_cc_r13.py [--runs N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from notion_timetracking_etl_spark.operators import cluster as cluster_mod  # noqa: E402
from notion_timetracking_etl_spark.operators.dedup import (  # noqa: E402
    _flat_checkpoint,
    _scoped_persist,
    _SCOPED_CACHES,
    release_scoped_caches,
)
from notion_timetracking_etl_spark.queries import REGISTRY  # noqa: E402
from notion_timetracking_etl_spark.queries import clusters as clusters_mod  # noqa: E402
from notion_timetracking_etl_spark.queries import forget as forget_mod  # noqa: E402
from notion_timetracking_etl_spark.session import build_session  # noqa: E402


def legacy_connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Verbatim round-12 implementation (rev d26e445): loop conf as a
    set/restore of the CALLER's session, undirected edges persisted."""
    e = _scoped_persist(edges.select(F.col(a).alias("ea"), F.col(b).alias("eb")))
    und = _scoped_persist(
        e.select(F.col("ea").alias("src"), F.col("eb").alias("dst")).union(
            e.select(F.col("eb").alias("src"), F.col("ea").alias("dst"))
        )
    )
    spark = edges.sparkSession
    n_edges = e.count()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    loop_parts = max(2, min(int(prev_parts), n_edges // 50_000 + 2))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        labels = (
            und.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
        labels = _flat_checkpoint(labels)
        labels = cluster_mod._propagate(und, labels, max_rounds, stats)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    _SCOPED_CACHES.append(labels)
    return labels.select("node", F.col("label").alias("component"))


def legacy_overlapped(before, after):
    """Round-12 shape: the two CC loops run sequentially."""
    b = forget_mod._cluster_assign(*before)
    a = forget_mod._cluster_assign(*after)
    return b, a


NEW_CC = cluster_mod.connected_components
NEW_OVL = forget_mod._cluster_assign_overlapped


def apply(variant: str) -> None:
    cc = legacy_connected_components if variant == "old" else NEW_CC
    ovl = legacy_overlapped if variant == "old" else NEW_OVL
    cluster_mod.connected_components = cc
    forget_mod.connected_components = cc
    clusters_mod.connected_components = cc
    forget_mod._cluster_assign_overlapped = ovl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = build_session(app_name="ab-cc")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    def settle() -> None:
        release_scoped_caches()
        spark.sparkContext._jvm.System.gc()
        spark.range(1000).count()

    def run_once(variant: str, name: str, label: str) -> float:
        apply(variant)
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        (REGISTRY[name].spark(spark, args.sf_dir)
         .write.format("noop").mode("overwrite").save())
        dt = time.perf_counter() - t0
        settle()
        return dt

    for name in args.queries:
        run_once("old", name, f"{name} warmup-old")
        run_once("new", name, f"{name} warmup-new")
        olds, news = [], []
        for i in range(args.runs):
            olds.append(run_once("old", name, f"{name} old#{i}"))
            news.append(run_once("new", name, f"{name} new#{i}"))
        print(json.dumps({
            "query": name,
            "old_runs": [round(r, 3) for r in olds],
            "new_runs": [round(r, 3) for r in news],
            "old_min": round(min(olds), 3),
            "new_min": round(min(news), 3),
            "adjacent_wins_new": sum(n < o for o, n in zip(olds, news)),
        }), flush=True)

    apply("new")
    spark.stop()


if __name__ == "__main__":
    main()
