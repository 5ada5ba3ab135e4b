"""Ground-truth tests for the maintenance family (queries/maintenance.py):
incremental rollup refresh merge semantics and the skew report profile."""

from __future__ import annotations

import datetime as dt

from notion_timetracking_etl_spark.queries import REGISTRY


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (i, ts, uid, et, val, "{}")
            for i, (ts, uid, et, val) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_incremental_refresh_merges_base_delta_and_straddling_groups(
    spark, tmp_path
):
    # cutover is 2024-01-25: 'click' exists only before, 'error' only after,
    # 'view' straddles — the merged count/sum must equal a full recompute
    t = dt.datetime
    rows = [
        (t(2024, 1, 10, 5), 1, "click", 1.5),
        (t(2024, 1, 10, 6), 2, "click", 2.25),
        (t(2024, 1, 26, 7), 3, "error", 4.0),
        (t(2024, 1, 10, 8), 4, "view", 10.0),
        (t(2024, 1, 26, 9), 5, "view", 20.5),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in REGISTRY["rollup_incremental_refresh"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == {
        ("2024-01-10", "click"): (2, 3.75),
        ("2024-01-26", "error"): (1, 4.0),
        ("2024-01-10", "view"): (1, 10.0),
        ("2024-01-26", "view"): (1, 20.5),
    }


def _write_min_tpch(spark, tmp_path):
    # join_skew_report profiles lineitem and orders too — one row each
    spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    spark.createDataFrame(
        [(1, 1, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )


def test_skew_report_counts_nulls_and_heaviest_key(spark, tmp_path):
    _write_min_tpch(spark, tmp_path)
    # user_id 7 appears 4x of 8 non-null rows over 3 distinct keys
    # -> skew_factor = 4 * 3 / 8 = 1.5; two NULL keys counted separately
    t = dt.datetime
    rows = (
        [(t(2024, 1, 1, h), 7, "click", 1.0) for h in range(4)]
        + [(t(2024, 1, 1, 10), 8, "click", 1.0)] * 1
        + [(t(2024, 1, 1, 11), 9, "click", 1.0)] * 3
        + [(t(2024, 1, 1, 12), None, "click", 1.0)] * 2
    )
    sf_dir = _write_events(spark, tmp_path, rows)
    row = [
        r
        for r in REGISTRY["join_skew_report"].spark(spark, sf_dir).collect()
        if r["rel"] == "events.user_id"
    ][0]
    assert row["n_rows"] == 10
    assert row["n_null_keys"] == 2
    assert row["n_keys"] == 3
    assert row["max_key_rows"] == 4
    assert row["skew_factor"] == 4 * 3 / 8
