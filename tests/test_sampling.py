"""Tests: deterministic sampling operators (stratified top-k, weighted mix,
streaming dedup)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from notion_timetracking_etl_spark.operators.sampling import (
    hash_draw,
    topk_per_group,
    weight_threshold_hex,
    weighted_mix,
)
from notion_timetracking_etl_spark.queries import REGISTRY
from notion_timetracking_etl_spark.sources.tpch import load_table


def _plain_window_topk(docs, k):
    w = Window.partitionBy("lang").orderBy(F.col("_draw").asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("doc_id", "lang")
    )


def test_topk_per_group_equals_plain_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", hash_draw(F.col("doc_id")).alias("_draw")
    )
    for k, buckets in [(1, 4), (7, 3), (25, 32)]:
        salted = topk_per_group(
            docs, ["lang"], [F.col("_draw"), F.col("doc_id")], k, salt_buckets=buckets
        ).select("doc_id", "lang")
        expected = {tuple(r) for r in _plain_window_topk(docs, k).collect()}
        got = {tuple(r) for r in salted.collect()}
        assert got == expected, (k, buckets)


def test_topk_per_group_rank_matches_global_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", hash_draw(F.col("doc_id")).alias("_draw")
    )
    ranked = topk_per_group(
        docs, ["lang"], [F.col("_draw"), F.col("doc_id")], 10, rank_col="rk"
    )
    rows = ranked.orderBy("lang", "rk").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, members in by_lang.items():
        assert [m.rk for m in members] == list(range(1, len(members) + 1)), lang
        draws = [m._draw for m in members]
        assert draws == sorted(draws), lang  # rank follows the hash order


def test_weight_threshold_hex_edges():
    assert weight_threshold_hex(1.0) is None  # keep-all
    assert weight_threshold_hex(0.0) == "00000000"
    assert weight_threshold_hex(0.5) == "80000000"
    assert len(weight_threshold_hex(0.1)) == 8


def test_weighted_mix_monotone_and_exact_at_edges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_src0 = docs.filter(F.col("source") == "src0").count()
    full = weighted_mix(docs, "source", "doc_id", {"src0": 1.0})
    assert full.count() == n_src0  # weight 1.0 keeps every row
    assert weighted_mix(docs, "source", "doc_id", {"src0": 0.0}).count() == 0
    # unlisted sources are dropped entirely
    assert full.filter(F.col("source") != "src0").count() == 0
    # monotone: the kept set at w is a subset of the kept set at w' > w
    kept_25 = {r.doc_id for r in weighted_mix(docs, "source", "doc_id", {"src0": 0.25}).collect()}
    kept_50 = {r.doc_id for r in weighted_mix(docs, "source", "doc_id", {"src0": 0.5}).collect()}
    assert kept_25 <= kept_50
    # deterministic across runs
    again = {r.doc_id for r in weighted_mix(docs, "source", "doc_id", {"src0": 0.25}).collect()}
    assert again == kept_25


def test_streaming_dedup_keys_equals_batch_distinct(spark, sf_dir):
    got = {
        (r.user_id, r.event_type)
        for r in REGISTRY["streaming_dedup_keys"].spark(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    expected = {
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert got == expected


def test_ares_priority_gaps_dwarf_libm_ulp_drift(spark):
    # ln differs by <=1 ulp between JVM and DuckDB libms on rare inputs;
    # the A-Res ordering is safe because adjacent priorities are separated
    # by many orders of magnitude more than an ulp. Pin that margin.
    import math

    import pyspark.sql.functions as F

    from notion_timetracking_etl_spark.operators.sampling import ares_key
    from notion_timetracking_etl_spark.sources.tpch import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").filter(
        F.col("n_chars") > 0
    )
    keys = sorted(
        r["k"]
        for r in docs.select(
            ares_key(F.col("doc_id"), F.col("n_chars")).alias("k")
        ).collect()
    )
    min_rel_gap = min(
        (b - a) / max(abs(a), abs(b))
        for a, b in zip(keys, keys[1:])
        if b != a
    )
    # 1 ulp of a double is ~2.2e-16 relative; require >= 1e6 ulps of margin
    assert min_rel_gap > 1e-10, min_rel_gap
    assert len(set(keys)) == len(keys)  # priorities are distinct
    assert math.isfinite(keys[0])
