"""Tests for the parquet lake sinks: partition pruning actually prunes, and
bucketed joins actually skip the shuffle — asserted on physical plans, not
just trusted."""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_timetracking_etl_spark.sinks.parquet import (
    write_bucketed_table,
    write_partitioned_lake,
)
from notion_timetracking_etl_spark.sources.tpch import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_lake_prunes_partitions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    out = str(tmp_path / "lake")
    write_partitioned_lake(ev, out, ["day"], sort_cols=["user_id"])
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == "2024-01-03")
    plan = _plan(one_day)
    # the partition predicate must land in PartitionFilters (metadata-only
    # pruning), not in the data filter
    assert "PartitionFilters" in plan and "2024-01-03" in plan
    # pruned read touches strictly fewer files than the full scan
    n_all = back.select(F.input_file_name()).distinct().count()
    n_day = one_day.select(F.input_file_name()).distinct().count()
    assert 0 < n_day < n_all
    # round-trip row fidelity on the pruned slice
    want = ev.filter(F.to_date(F.col("ts")) == "2024-01-03").count()
    assert one_day.count() == want


def test_partitioned_lake_one_file_per_partition(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    out = str(tmp_path / "lake1f")
    write_partitioned_lake(ev, out, ["day"])
    files = spark.read.parquet(out).inputFiles()
    days = ev.select("day").distinct().count()
    # one writer task per partition directory → no small-file explosion
    assert len(files) == days


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed_table(
        li, "t_li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        path=str(tmp_path / "li"),
    )
    write_bucketed_table(
        orders, "t_ord_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
        path=str(tmp_path / "ord"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast: at test scale AQE would broadcast the tiny
        # orders side and hide the property under test (at lake scale both
        # sides are far past any broadcast threshold — SMJ is the real plan)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_li_b").join(
            spark.table("t_ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        # the whole point of bucketing: equi-join with ZERO exchanges
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it still computes the right thing
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_bucketed_aggregation_is_exchange_free(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(
        li, "t_li_agg", ["l_orderkey"], 8, path=str(tmp_path / "liagg")
    )
    try:
        agg = (
            spark.table("t_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = _plan(agg)
        assert "Exchange" not in plan
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_agg")


def test_stream_to_parquet_lake_exactly_once(spark, sf_dir, tmp_path):
    from notion_timetracking_etl_spark.sinks.parquet import stream_to_parquet_lake
    from notion_timetracking_etl_spark.streaming import read_events_stream

    path, ckpt = str(tmp_path / "lake"), str(tmp_path / "ckpt")
    stream_to_parquet_lake(
        read_events_stream(spark, sf_dir), path, ckpt, ["event_type"]
    )
    out = spark.read.parquet(path)
    n_expected = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_expected
    # hive partition layout on the partition column
    assert out.select("event_type").distinct().count() >= 2
    import os

    assert any(d.startswith("event_type=") for d in os.listdir(path))
    # restart over an unchanged source with the same checkpoint: the sink
    # log + offsets make the drain a no-op — exactly-once, no duplicates
    stream_to_parquet_lake(
        read_events_stream(spark, sf_dir), path, ckpt, ["event_type"]
    )
    assert spark.read.parquet(path).count() == n_expected


def test_sharded_corpus_write_roundtrip_and_balance(spark, tmp_path):
    """write_sharded_corpus materializes the shard plan: one directory per
    shard, sizes differ by <=1, membership matches the manifest query's
    NTILE plan, nothing lost or duplicated, and each shard file is ordered
    by the permutation key (a shard IS a contiguous ordered hash range)."""
    import hashlib
    import os

    import pyspark.sql.functions as F

    from notion_timetracking_etl_spark.sinks.shards import (
        read_shard,
        write_sharded_corpus,
    )
    from notion_timetracking_etl_spark.sources.tpch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "n_chars"
    )
    out = str(tmp_path / "shards")
    n = write_sharded_corpus(docs, out, "doc_id", 16)
    assert n == 500
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == 16

    back = spark.read.parquet(out)
    sizes = {
        r.shard: r.c
        for r in back.groupBy("shard").agg(F.count("*").alias("c")).collect()
    }
    assert sum(sizes.values()) == 500
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert set(
        r.doc_id for r in back.select("doc_id").collect()
    ) == set(r.doc_id for r in docs.collect())

    # membership matches the independently computed boundary plan
    perm = lambda d: hashlib.sha256(str(d).encode()).hexdigest()
    ids = sorted((perm(r.doc_id), r.doc_id) for r in docs.collect())
    q, rem = divmod(len(ids), 16)
    expected, pos = {}, 0
    for s in range(16):
        take = q + (1 if s < rem else 0)
        for p, d in ids[pos : pos + take]:
            expected[d] = s
        pos += take
    got = {r.doc_id: r.shard for r in back.collect()}
    assert got == expected

    # single-shard read prunes to one directory and comes back key-ordered
    one = read_shard(spark, out, 3)
    rows = [r.doc_id for r in one.collect()]
    assert sorted(rows, key=perm) == rows
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
