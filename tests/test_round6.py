"""Ground-truth tests for the round-6 families: median/MAD outliers, gap
interpolation, CDC apply, blocked record linkage, Count-Min audit, binary
ANN, and the streaming trending report. Each is pinned against a pure-Python
model or hand-computed fixture — independent of the DuckDB oracle path."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from notion_timetracking_etl_spark.queries import REGISTRY


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, val, "{}") for i, (ts, uid, et, val) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_mad_outliers_lower_median_and_threshold(spark, tmp_path):
    t = dt.datetime
    rows = (
        # type a: values 1..4 and 100 -> median 3, deviations [2,1,0,1,97],
        # MAD (lower median of sorted [0,1,1,2,97]) = 1, outliers: 97 > 5*1
        [(t(2024, 1, 1, h), h, "a", float(v)) for h, v in enumerate([1, 2, 3, 4, 100])]
        # type b even count: [10, 20] -> lower median 10, devs [0,10],
        # MAD = lower median of [0,10] = 0, outlier: dev 10 > 0
        + [(t(2024, 1, 1, 10), 1, "b", 10.0), (t(2024, 1, 1, 11), 2, "b", 20.0)]
    )
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: (
            r["n_values"], r["median_micros"], r["mad_micros"], r["n_outliers"]
        )
        for r in REGISTRY["robust_outliers_mad"].spark(spark, sf_dir).collect()
    }
    assert got == {
        "a": (5, 3_000_000, 1_000_000, 1),
        "b": (2, 10_000_000, 0, 1),
    }


def test_gap_interpolation_linear_and_edges(spark, tmp_path):
    t = dt.datetime
    rows = [
        # type x present on days 1 and 4: days 2,3 interpolate linearly
        (t(2024, 1, 1), 1, "x", 10.0),
        (t(2024, 1, 4), 2, "x", 40.0),
        # type y present only on day 2: everything else is an edge
        (t(2024, 1, 2), 3, "y", 7.0),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        (r["day"], r["event_type"]): (r["filled_micros"], r["fill_kind"])
        for r in REGISTRY["events_gap_interpolation"].spark(spark, sf_dir).collect()
    }
    assert got[("2024-01-01", "x")] == (10_000_000, "actual")
    assert got[("2024-01-02", "x")] == (20_000_000, "interp")
    assert got[("2024-01-03", "x")] == (30_000_000, "interp")
    assert got[("2024-01-04", "x")] == (40_000_000, "actual")
    assert got[("2024-01-02", "y")] == (7_000_000, "actual")
    assert got[("2024-01-01", "y")] == (None, "edge")
    assert got[("2024-01-04", "y")] == (None, "edge")
    assert len(got) == 8  # 4-day spine x 2 types


def test_cdc_apply_insert_update_delete_paths(spark, tmp_path):
    # keys: 1 I-only; 3 I+U; 7 I+D (deleted); 21 I+U+D (delete wins)
    d = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, k, "O", 100.0, d, "1-URGENT") for k in (1, 3, 7, 21)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["o_orderkey"]: (r["last_seq"], r["last_op"], r["price_micros"], r["status"])
        for r in REGISTRY["cdc_apply_changelog"].spark(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (1, "I", 100_000_000, "O"),
        3: (2, "U", 101_000_000, "U"),
        # 7 and 21 deleted: absent from the snapshot
    }


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_record_linkage_matches_pure_python_model(spark, sf_dir):
    from notion_timetracking_etl_spark.queries.linkage import MAX_BLOCK

    cust = {
        r["c_custkey"]: r["c_name"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name")
        .collect()
    }

    def perturb(k: int, name: str) -> str:
        digits = list(name[9:18])
        m, p = k % 4, (k % 9) + 1
        if m == 1:
            digits[p - 1] = str((int(digits[p - 1]) + 5) % 10)
        elif m == 2:
            for pos, sh in ((8, 3), (9, 7)):
                digits[pos - 1] = str((int(digits[pos - 1]) + sh) % 10)
        elif m == 3:
            for pos in (2, 5, 8):
                digits[pos - 1] = str((int(digits[pos - 1]) + 1) % 10)
        return "Customer#" + "".join(digits)

    def keys(digits: str) -> list[str]:
        return [digits[3:9], digits[0:3] + digits[6:9], digits[0:6]]

    incoming = {k: perturb(k, n) for k, n in cust.items()}
    # master buckets per blocking key, with the saturation prune
    buckets: dict[tuple[int, str], list[int]] = {}
    for k, n in cust.items():
        for j, bk in enumerate(keys(n[9:18])):
            buckets.setdefault((j, bk), []).append(k)
    expected = {}
    for ik, iname in incoming.items():
        cands = set()
        for j, bk in enumerate(keys(iname[9:18])):
            members = buckets.get((j, bk), [])
            if len(members) <= MAX_BLOCK:
                cands.update(members)
        best = None
        for mk in cands:
            d = _lev(iname, cust[mk])
            if d <= 2 and (best is None or (d, mk) < best):
                best = (d, mk)
        expected[ik] = (
            (best[1], best[0], "exact" if best[0] == 0 else "fuzzy")
            if best
            else (None, None, "none")
        )
    got = {
        r["inc_id"]: (r["matched_custkey"], r["lev_distance"], r["match_kind"])
        for r in REGISTRY["record_linkage_blocking"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    # the designed paths actually occur: exacts, fuzzies, and blocking misses
    kinds = {v[2] for v in got.values()}
    assert kinds == {"exact", "fuzzy", "none"}


def test_countmin_overestimates_and_exact_counts_match_python(spark, sf_dir):
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    counts = Counter()
    for r in docs:
        if r["text"] is not None:
            counts.update(r["text"].strip().lower().split())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = REGISTRY["countmin_token_frequency"].spark(spark, sf_dir).collect()
    assert {(r["item"], r["exact_cnt"]) for r in rows} == set(top)
    for r in rows:
        # the CMS one-sided error invariant: never an underestimate
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_binary_ann_recall_vs_bruteforce(spark, sf_dir):
    brute = {
        (r["query_id"], r["vec_id"])
        for r in REGISTRY["similarity_topk_bruteforce"].spark(spark, sf_dir).collect()
    }
    binq = {
        (r["query_id"], r["vec_id"])
        for r in REGISTRY["similarity_topk_binary"].spark(spark, sf_dir).collect()
    }
    recall = len(brute & binq) / len(brute)
    # measured 0.80 at sf0.001 AND sf0.01 with the 64-deep shortlist
    assert recall >= 0.7, recall
    # rank-1 is always the query itself (cosine 1 with itself)
    for qid in {q for q, _ in binq}:
        assert (qid, qid) in binq


def test_streaming_trending_equals_batch_twin(spark, sf_dir):
    from notion_timetracking_etl_spark.sources.tpch import load_table

    got = REGISTRY["streaming_topk_trending"].spark(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.date_format(
                F.window("ts", "6 hours").getField("start"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .collect()
    )
    per_window: dict[str, list] = {}
    for r in batch:
        per_window.setdefault(r["window_start"], []).append(
            (-r["n_events"], r["event_type"], r["n_events"])
        )
    expected = set()
    for w, items in per_window.items():
        for rank, (_, et, n) in enumerate(sorted(items)[:3], 1):
            expected.add((w, rank, et, n))
    assert {
        (r["window_start"], r["rank"], r["event_type"], r["n_events"]) for r in got
    } == expected


def test_round6_hostile_inputs(spark, tmp_path):
    """NULL/empty hostile probes for the round-6 families (ROBUSTNESS.md
    protocol): NULL values, NULL names, and empty inputs must degrade to
    well-defined outputs, never engine-divergent crashes."""
    t = dt.datetime
    # events with NULL and non-finite values: both fall out of MAD/interp
    rows = [
        (0, t(2024, 1, 1, 5), 1, "a", 1.0, "{}"),
        (1, t(2024, 1, 1, 6), 2, "a", None, "{}"),
        (2, t(2024, 1, 1, 7), 3, "a", float("nan"), "{}"),
        (3, t(2024, 1, 3, 7), 4, "a", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    mad = {
        r["event_type"]: (r["n_values"], r["median_micros"])
        for r in REGISTRY["robust_outliers_mad"].spark(spark, sf).collect()
    }
    assert mad == {"a": (2, 1_000_000)}  # NULL/NaN excluded, lower median
    gap = {
        (r["day"], r["fill_kind"])
        for r in REGISTRY["events_gap_interpolation"].spark(spark, sf).collect()
    }
    assert gap == {
        ("2024-01-01", "actual"),
        ("2024-01-02", "interp"),
        ("2024-01-03", "actual"),
    }

    # customers with a NULL name: blocking keys go NULL, the record can
    # never match and must surface as kind 'none', not crash or vanish
    cust = spark.createDataFrame(
        [(1, "Customer#000000001", 0, 0.0, "BUILDING"), (2, None, 0, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    cust.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    link = {
        r["inc_id"]: r["match_kind"]
        for r in REGISTRY["record_linkage_blocking"].spark(spark, sf).collect()
    }
    assert link[2] == "none" and len(link) == 2

    # documents that are all NULL text: the CMS probe set is empty, not an error
    docs = spark.createDataFrame(
        [(1, None, "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    assert REGISTRY["countmin_token_frequency"].spark(spark, sf).count() == 0
