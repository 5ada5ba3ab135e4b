"""Tests: distributed Lloyd's k-means operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_timetracking_etl_spark.operators.dedup import release_scoped_caches
from notion_timetracking_etl_spark.operators.kmeans import kmeans
from notion_timetracking_etl_spark.queries import REGISTRY
from notion_timetracking_etl_spark.sources.tpch import load_table


def _inertia(asg) -> float:
    return asg.agg((F.sum("dist").cast("double") / F.lit(1e12)).alias("i")).collect()[0]["i"]


def test_kmeans_partitions_corpus_and_inertia_decreases(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    prev = None
    for iters in (1, 2, 4):
        asg = kmeans(emb, k=4, iters=iters)
        rows = asg.collect()
        release_scoped_caches()
        assert len(rows) == n  # every vector assigned exactly once
        assert len({r.cid for r in rows}) <= 4
        inertia = sum(float(r.dist) for r in rows) / 1e12
        if prev is not None:
            # Lloyd's is monotone non-increasing in within-cluster SS
            assert inertia <= prev + 1e-9, (iters, inertia, prev)
        prev = inertia


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = {(r.vec_id, r.cid) for r in kmeans(emb, k=8, iters=3).collect()}
    release_scoped_caches()
    b = {(r.vec_id, r.cid) for r in kmeans(emb, k=8, iters=3).collect()}
    release_scoped_caches()
    assert a == b


def test_kmeans_checkpoints_released(spark, sf_dir):
    def persistent_ids():
        return set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )

    emb = load_table(spark, sf_dir, "embeddings")
    REGISTRY["kmeans_embeddings"].spark(spark, sf_dir).collect()
    release_scoped_caches()
    first = persistent_ids()
    REGISTRY["kmeans_embeddings"].spark(spark, sf_dir).collect()
    release_scoped_caches()
    second = persistent_ids()
    assert len(second - first) == 0, sorted(second - first)
