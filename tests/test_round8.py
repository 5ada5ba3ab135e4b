"""Round-8 additions: domain capping (corpus_source_cap) and the KMV
set-intersection estimate (kmv_set_intersection).

Exactness vs DuckDB is pinned registry-wide by tests/test_query_parity.py;
these tests pin the SEMANTICS on controlled fixtures — the cap's ordering
and threshold contract, and the sketch's exact-mode guarantee — so a future
edit that stays hash-consistent with its own oracle but changes the
documented behavior still fails.
"""

from __future__ import annotations

import pyarrow.parquet as pq

import pyspark.sql.functions as F

from notion_timetracking_etl_spark.queries import REGISTRY
from notion_timetracking_etl_spark.queries.corpus import SOURCE_CAP
from notion_timetracking_etl_spark.queries.sketches import KMV_K


def test_source_cap_audit_invariants(spark, sf_dir):
    # structural contract against the fixture, derived from the parquet
    # itself (survives testdata regen): per-source totals match, the cap
    # binds exactly at min(cap, n_docs), and byte accounting balances.
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    ).to_pylist()
    totals: dict[str, tuple[int, int]] = {}
    for r in tbl:
        n, b = totals.get(r["source"], (0, 0))
        totals[r["source"]] = (n + 1, b + r["n_chars"])
    rows = REGISTRY["corpus_source_cap"].spark(spark, sf_dir).collect()
    assert {r["source"] for r in rows} == set(totals)
    for r in rows:
        n_docs, total_bytes = totals[r["source"]]
        assert r["n_docs"] == n_docs
        assert r["n_kept"] == min(SOURCE_CAP, n_docs)
        assert r["n_dropped"] == n_docs - r["n_kept"]
        assert r["kept_bytes"] + r["dropped_bytes"] == total_bytes


def test_source_cap_keeps_highest_quality_docs(spark, tmp_path):
    # controlled lake: quality_score is monotonic in length below 200 chars
    # for all-lowercase no-punct text, so doc quality order == length order.
    # One skewed source (cap binds), one small source (cap dormant).
    rows = []
    for i in range(SOURCE_CAP + 10):
        # lengths 20, 24, 28, ... — strictly increasing quality
        rows.append((i, "word " * (5 + i), "en", "big", 4 * (5 + i)))
    for i in range(3):
        rows.append((100 + i, "word " * 10, "en", "small", 40))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["source"]: r
        for r in REGISTRY["corpus_source_cap"].spark(spark, str(tmp_path)).collect()
    }
    big, small = got["big"], got["small"]
    assert big["n_kept"] == SOURCE_CAP
    assert big["n_dropped"] == 10
    # the 10 SHORTEST (lowest-quality) docs are the dropped ones: kept bytes
    # are the top SOURCE_CAP lengths 4*(15..29)
    assert big["kept_bytes"] == sum(4 * (5 + i) for i in range(10, SOURCE_CAP + 10))
    # the threshold is the worst RETAINED doc's quality — strictly above the
    # best dropped doc's quality on this strictly-ordered fixture
    assert small["n_kept"] == 3 and small["n_dropped"] == 0
    # equal-quality tie in 'small': all three identical docs kept, threshold
    # equals their shared quality
    assert small["kept_bytes"] == 120


def test_kmv_intersection_invariants(spark, sf_dir):
    rows = REGISTRY["kmv_set_intersection"].spark(spark, sf_dir).collect()
    types = {r["type_a"] for r in rows} | {r["type_b"] for r in rows}
    # all unordered pairs present exactly once
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["n_inter_sketch"] <= min(KMV_K, r["n_union_sketch"])
        assert r["kmv_inter_est"] >= 0.0
        if r["n_union_sketch"] < KMV_K:
            # exact mode: both sketches complete -> estimate IS the truth
            assert r["kmv_inter_est"] == float(r["n_exact"])
            assert r["n_inter_sketch"] == r["n_exact"]


def test_kmv_intersection_exact_mode_synthetic(spark, tmp_path):
    # < KMV_K distinct user-days per type -> every pair's union sketch is
    # unsaturated and the estimator must return exact intersections.
    # users 0..19 do 'a'; 10..29 do 'b'; 20..39 do 'c' — all on one day.
    import datetime

    rows = []
    eid = 0
    for t, lo in (("a", 0), ("b", 10), ("c", 20)):
        for u in range(lo, lo + 20):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, 12, 0, 0), u, t, 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["kmv_set_intersection"].spark(spark, str(tmp_path)).collect()
    }
    assert got[("a", "b")]["n_exact"] == 10
    assert got[("b", "c")]["n_exact"] == 10
    assert got[("a", "c")]["n_exact"] == 0
    for r in got.values():
        assert r["n_union_sketch"] < KMV_K
        assert r["kmv_inter_est"] == float(r["n_exact"])
        assert r["rel_err"] == (0.0 if r["n_exact"] else None)


def test_quantile_hash_sample_membership_and_bounds(spark, sf_dir):
    # pins the sample-membership convention (sha256 'qs:' hash, bottom-k by
    # the 56-bit prefix) against an independent Python recomputation, plus
    # the estimator's structural bounds. The bottom-k-by-global-hash sample
    # is union-mergeable by construction (min-k is a monoid); what needs
    # pinning is that Spark's window picks EXACTLY the k smallest hashes.
    import hashlib

    import pyarrow.parquet as pq

    from notion_timetracking_etl_spark.queries.sketches import QS_K

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).to_pylist()
    by_type: dict[str, list[tuple[int, float]]] = {}
    for r in ev:
        if r["value"] is None:
            continue
        h = int(
            hashlib.sha256(f"qs:{r['event_id']}".encode()).hexdigest()[:14], 16
        )
        by_type.setdefault(r["event_type"], []).append((h, r["value"]))
    rows = REGISTRY["quantile_hash_sample"].spark(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == set(by_type)
    for r in rows:
        pool = sorted(by_type[r["event_type"]])
        assert r["n_total"] == len(pool)
        assert r["n_sample"] == min(QS_K, len(pool))
        sample_vals = [v for _, v in pool[: QS_K]]
        lo, hi = min(sample_vals), max(sample_vals)
        for c in ("est_p50", "est_p90", "est_p99"):
            assert lo <= r[c] <= hi
        # exact percentiles bound by the full pool
        all_vals = [v for _, v in pool]
        assert min(all_vals) <= r["exact_p50"] <= max(all_vals)


def test_streaming_sample_multi_batch_equals_batch_sample(spark, sf_dir, tmp_path):
    # the monoid claim, exercised for real: 3 files -> 3 micro-batches with
    # maxFilesPerTrigger=1, so the bottom-k state MERGES across batches;
    # the drained union re-bottom-k'd must equal the batch sample EXACTLY
    # (recomputed independently in Python from the raw parquet).
    import hashlib

    import pyarrow.parquet as pq

    from pyspark.sql import Window

    from notion_timetracking_etl_spark.queries.sketches import QS_K
    from notion_timetracking_etl_spark.sources.tpch import load_table
    from notion_timetracking_etl_spark.streaming import (
        bottomk_sample_stream,
        run_stream_to_table,
    )
    from notion_timetracking_etl_spark.queries.sketches import qs_keyed_values

    ev = load_table(spark, sf_dir, "events")
    split_dir = str(tmp_path / "ev_split")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(split_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    emissions = run_stream_to_table(
        bottomk_sample_stream(qs_keyed_values(stream), QS_K),
        output_mode="update",
    )
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    got = {
        (r["g"], r["h"]): r["value"]
        for r in emissions.dropDuplicates(["g", "h"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QS_K)
        .collect()
    }
    # independent truth from the raw parquet
    raw = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).to_pylist()
    by_type: dict[str, list[tuple[int, float]]] = {}
    for r in raw:
        if r["value"] is None or r["event_id"] is None:
            continue
        h = int(
            hashlib.sha256(f"qs:{r['event_id']}".encode()).hexdigest()[:14], 16
        )
        by_type.setdefault(r["event_type"], []).append((h, r["value"]))
    want = {}
    for g, pool in by_type.items():
        for h, v in sorted(pool)[:QS_K]:
            want[(g, h)] = v
    assert got == want


def test_streaming_source_cap_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    # 3 files -> 3 micro-batches: the per-source top-cap state merges
    # across batches; the full streaming query's audit must equal the
    # batch query's audit row-for-row on the same lake.
    import shutil

    from notion_timetracking_etl_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    lake = tmp_path / "lake"
    lake.mkdir()
    split_dir = str(lake / "documents.parquet")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(split_dir)
    got = sorted(
        tuple(r)
        for r in REGISTRY["streaming_source_cap"]
        .spark(spark, str(lake))
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in REGISTRY["corpus_source_cap"].spark(spark, str(lake)).collect()
    )
    assert got == want
    # and the state-merge itself under FORCED multi-batch (one file per
    # micro-batch): the drained kept membership re-top-k'd equals the
    # batch kept set
    from pyspark.sql import Window

    from notion_timetracking_etl_spark.operators.text import quality_score
    from notion_timetracking_etl_spark.queries.corpus import SOURCE_CAP
    from notion_timetracking_etl_spark.streaming import (
        run_stream_to_table,
        topk_quality_stream,
    )

    q_micro = (
        F.coalesce(F.floor(quality_score(F.col("text")) * 1000000.0), F.lit(0))
        .cast("bigint")
        .alias("q_micro")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    emissions = run_stream_to_table(
        topk_quality_stream(stream.select("source", "doc_id", q_micro), SOURCE_CAP),
        output_mode="update",
    )
    w = Window.partitionBy("source").orderBy(
        F.col("q_micro").desc(), F.col("doc_id").asc()
    )
    got_ids = {
        (r["source"], r["doc_id"])
        for r in emissions.dropDuplicates(["source", "doc_id"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOURCE_CAP)
        .collect()
    }
    want_ids = {
        (r["source"], r["doc_id"])
        for r in docs.select("source", "doc_id", q_micro)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOURCE_CAP)
        .collect()
    }
    assert got_ids == want_ids
    shutil.rmtree(str(lake), ignore_errors=True)


def test_kmv_difference_exact_mode_synthetic(spark, tmp_path):
    # same fixture as the intersection test: users 0..19 'a', 10..29 'b',
    # 20..39 'c' -> |a\b| = |b\a| = 10, |a\c| = |c\a| = 20, |b\c| = 10.
    # All sketches unsaturated -> estimates must be exact.
    import datetime

    rows = []
    eid = 0
    for t, lo in (("a", 0), ("b", 10), ("c", 20)):
        for u in range(lo, lo + 20):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, 12, 0, 0), u, t, 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["type_a"], r["type_b"]): r
        for r in REGISTRY["kmv_set_difference"].spark(spark, str(tmp_path)).collect()
    }
    want = {("a", "b"): (10, 10), ("a", "c"): (20, 20), ("b", "c"): (10, 10)}
    for pair, (ab, ba) in want.items():
        r = got[pair]
        assert r["n_exact_a_minus_b"] == ab and r["n_exact_b_minus_a"] == ba
        assert r["n_union_sketch"] < KMV_K
        assert r["est_a_minus_b"] == float(ab)
        assert r["est_b_minus_a"] == float(ba)
