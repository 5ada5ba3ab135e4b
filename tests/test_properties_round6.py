"""Property-based tests for the round-6 operators: CDC last-write-wins
apply (and its batch-split order-independence — the streaming upsert's
load-bearing claim), and the daily-grain anomaly family (MAD medians, gap
interpolation, CUSUM) against pure-Python models over randomized inputs."""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings, strategies as st
import pyspark.sql.functions as F

from notion_timetracking_etl_spark.queries import REGISTRY
from notion_timetracking_etl_spark.queries.cdc import apply_changelog
from notion_timetracking_etl_spark.streaming.cdc import merge_upsert_batch

_SETTINGS = dict(max_examples=10, deadline=None)

_CHANGE_SCHEMA = (
    "k long, seq int, op string, price_micros long, status string"
)

# per key: which ops happened (always I; maybe U; maybe D), with payloads
_keys = st.integers(min_value=0, max_value=30)
_changelog = st.dictionaries(
    _keys,
    st.tuples(
        st.booleans(),  # has update
        st.booleans(),  # has delete
        st.integers(min_value=0, max_value=10**9),  # insert price
        st.integers(min_value=0, max_value=10**9),  # update price
    ),
    min_size=1,
    max_size=20,
)


def _rows_of(clog: dict) -> list[tuple]:
    rows = []
    for k, (has_u, has_d, p_i, p_u) in clog.items():
        rows.append((k, 1, "I", p_i, "O"))
        if has_u:
            rows.append((k, 2, "U", p_u, "U"))
        if has_d:
            rows.append((k, 3, "D", None, None))
    return rows


def _model_snapshot(clog: dict) -> dict:
    out = {}
    for k, (has_u, has_d, p_i, p_u) in clog.items():
        if has_d:
            continue  # delete always has the max seq when present
        if has_u:
            out[k] = (2, "U", p_u, "U")
        else:
            out[k] = (1, "I", p_i, "O")
    return out


@settings(**_SETTINGS)
@given(_changelog)
def test_cdc_apply_matches_last_write_wins_model(spark, clog):
    df = spark.createDataFrame(_rows_of(clog), _CHANGE_SCHEMA)
    got = {
        r["o_orderkey"]: (
            r["last_seq"], r["last_op"], r["price_micros"], r["status"]
        )
        for r in apply_changelog(df).collect()
    }
    assert got == _model_snapshot(clog)


@settings(**_SETTINGS)
@given(_changelog, st.randoms(use_true_random=False))
def test_upsert_merge_is_batch_split_order_independent(spark, clog, rnd):
    rows = _rows_of(clog)
    rnd.shuffle(rows)
    # two different random batchings of the same changelog
    finals = []
    for n_batches in (1, max(1, min(4, len(rows)))):
        cut = sorted(
            rnd.sample(range(1, len(rows)), n_batches - 1)
            if len(rows) > 1 and n_batches > 1
            else []
        )
        acc = None
        for lo, hi in zip([0] + cut, cut + [len(rows)]):
            if lo == hi:
                continue
            batch = spark.createDataFrame(rows[lo:hi], _CHANGE_SCHEMA)
            acc = merge_upsert_batch(acc, batch)
        finals.append(
            {
                r["k"]: (r["seq"], r["op"], r["price_micros"], r["status"])
                for r in acc.collect()
            }
        )
    assert finals[0] == finals[1]
    # tombstones present for deleted keys; filtered state == batch model
    live = {
        k: v for k, v in finals[0].items() if v[1] != "D"
    }
    assert {
        k: v for k, v in live.items()
    } == {
        k: v for k, v in _model_snapshot(clog).items()
    }


# sparse daily series per type: day offset -> value (whole units)
_series = st.dictionaries(
    st.integers(min_value=0, max_value=14),
    st.integers(min_value=-1000, max_value=1000),
    min_size=1,
    max_size=10,
)

_counter = itertools.count()


def _write_series(spark, tmp_path, series: dict) -> str:
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=d, hours=1), 1, "a", float(v), "{}")
        for i, (d, v) in enumerate(sorted(series.items()))
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / f"ex{next(_counter)}")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return sf


@settings(
    max_examples=6,
    deadline=None,
    # tmp_path is shared across examples ON PURPOSE: each example writes
    # into a unique ex{N} subdirectory (the _counter), so no state leaks
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_series)
def test_gap_interpolation_matches_python_model(spark, tmp_path, series):
    sf = _write_series(spark, tmp_path, series)
    got = {
        r["day"]: (r["filled_micros"], r["fill_kind"])
        for r in REGISTRY["events_gap_interpolation"].spark(spark, sf).collect()
    }
    days = sorted(series)
    lo, hi = days[0], days[-1]
    base = dt.date(2024, 1, 1)
    for d in range(lo, hi + 1):
        key = (base + dt.timedelta(days=d)).isoformat()
        if d in series:
            assert got[key] == (series[d] * 1_000_000, "actual")
        else:
            prev = max(x for x in days if x < d)
            nxt = min(x for x in days if x > d)
            pv, nv = series[prev] * 1_000_000, series[nxt] * 1_000_000
            import math

            interp = pv + math.floor((nv - pv) * (d - prev) / (nxt - prev))
            assert got[key] == (interp, "interp")
    assert len(got) == hi - lo + 1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_series)
def test_mad_and_cusum_match_python_models(spark, tmp_path, series):
    sf = _write_series(spark, tmp_path, series)
    vals = sorted(
        (v * 1_000_000, i)
        for i, (d, v) in enumerate(sorted(series.items()))
    )

    def lower_median(sorted_vals):
        return sorted_vals[(len(sorted_vals) + 1) // 2 - 1]

    med = lower_median([v for v, _ in vals])
    devs = sorted((abs(v - med), i) for v, i in vals)
    mad = lower_median([v for v, _ in devs])
    n_out = sum(1 for v, _ in vals if abs(v - med) > 5 * mad)
    r = REGISTRY["robust_outliers_mad"].spark(spark, sf).collect()[0]
    assert (r["median_micros"], r["mad_micros"], r["n_outliers"]) == (
        med, mad, n_out,
    )

    # CUSUM model over the present-day series (argmax |D*pref - k*T|)
    daily = [v * 1_000_000 for _, v in sorted(series.items())]
    if len(daily) >= 2:
        d_n, t = len(daily), sum(daily)
        best = None
        pref = 0
        base = dt.date(2024, 1, 1)
        days = sorted(series)
        for k in range(1, d_n):
            pref += daily[k - 1]
            s_abs = abs(d_n * pref - k * t)
            cand = (-s_abs, days[k - 1])
            if best is None or cand < best:
                best = cand
                best_row = (
                    (base + dt.timedelta(days=days[k - 1])).isoformat(),
                    s_abs,
                    k,
                )
        c = REGISTRY["changepoint_cusum_daily"].spark(spark, sf).collect()[0]
        assert (c["cp_day"], c["cusum_abs_max"], c["n_before"]) == best_row


# ---------------------------------------------------------------------------
# round-8 streaming state monoids: the pandas update fns, driven directly
# (no Spark) against brute-force models on randomized batch splits
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**12), st.floats(-100, 100, allow_nan=False)),
        min_size=0,
        max_size=60,
        # the operator's contract: hashes are distinct (they derive from
        # the unique event_id key) — hypothesis round 8 found that
        # duplicate in-batch hashes occupy k slots, an input shape the
        # real pipeline can never produce
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 8),
    st.data(),
)
def test_bottomk_update_fn_is_split_invariant(rows, k, data):
    import pandas as pd

    from notion_timetracking_etl_spark.streaming.sketch import (
        _bottomk_update_fn,
    )

    # random split into 1..4 batches
    n_batches = data.draw(st.integers(1, 4))
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(rows)), min_size=n_batches - 1,
                     max_size=n_batches - 1)
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        batches.append(rows[prev:c])
        prev = c
    fn = _bottomk_update_fn(k)
    state = _FakeState()
    last = None
    for b in batches:
        pdf = pd.DataFrame({"h": [h for h, _ in b], "value": [v for _, v in b]})
        last = list(fn(("g",), iter([pdf]), state))[-1]
    want = sorted(rows)[:k]
    got = sorted(zip(last["h"], last["value"]))
    assert [h for h, _ in got] == [h for h, _ in want]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 10**9)),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[1],  # doc_id unique, like a PK
    ),
    st.integers(1, 8),
    st.data(),
)
def test_topk_quality_update_fn_is_split_invariant(rows, cap, data):
    import pandas as pd

    from notion_timetracking_etl_spark.streaming.sketch import (
        _topk_quality_update_fn,
    )

    n_batches = data.draw(st.integers(1, 4))
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(rows)), min_size=n_batches - 1,
                     max_size=n_batches - 1)
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        batches.append(rows[prev:c])
        prev = c
    fn = _topk_quality_update_fn(cap)
    state = _FakeState()
    last = None
    for b in batches:
        pdf = pd.DataFrame(
            {"q_micro": [q for q, _ in b], "doc_id": [d for _, d in b]}
        )
        last = list(fn(("src",), iter([pdf]), state))[-1]
    want = sorted(rows, key=lambda t: (-t[0], t[1]))[:cap]
    got = sorted(
        zip(last["q_micro"], last["doc_id"]), key=lambda t: (-t[0], t[1])
    )
    assert got == want
