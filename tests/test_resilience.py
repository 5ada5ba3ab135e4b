"""Retry / rate-limit / governor / batching semantics (driver-side S3, S8, S9).

Mirrors the reference's unit suites (src/test/retry.test.ts:5-47,
src/test/rateLimit.test.ts:5-21) plus governor budget math."""

from __future__ import annotations

import pytest

from notion_timetracking_etl_spark.lib.ratelimit import RateLimiter
from notion_timetracking_etl_spark.lib.retry import (
    HttpError,
    RetryPolicy,
    decide_retry,
    retry_call,
)
from notion_timetracking_etl_spark.sinks.pbi.batching import batch_rows, iter_row_batches
from notion_timetracking_etl_spark.sinks.pbi.governor import (
    RefreshGovernor,
    RefreshLimits,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0
        self.sleeps: list[float] = []

    def now(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s


# -- retry (reference: src/test/retry.test.ts) -------------------------------


def test_429_honors_retry_after_seconds():
    clock = FakeClock()
    calls = []

    def op():
        calls.append(1)
        if len(calls) == 1:
            raise HttpError(429, headers={"retry-after": "2.5"})
        return "ok"

    assert retry_call(op, RetryPolicy(), sleep=clock.sleep, now_s=clock.now) == "ok"
    assert clock.sleeps == [2.5]


def test_429_without_header_backs_off_exponentially():
    should, delay = decide_retry(HttpError(429), 0, RetryPolicy())
    assert should and delay == 0.5
    should, delay = decide_retry(HttpError(429), 3, RetryPolicy())
    assert should and delay == 4.0
    should, delay = decide_retry(HttpError(429), 10, RetryPolicy())
    assert should and delay == 10.0  # capped


def test_non_429_4xx_does_not_retry():
    clock = FakeClock()
    calls = []

    def op():
        calls.append(1)
        raise HttpError(404, "nope")

    with pytest.raises(HttpError):
        retry_call(op, RetryPolicy(), sleep=clock.sleep, now_s=clock.now)
    assert len(calls) == 1 and clock.sleeps == []


def test_5xx_retries_with_jitter_until_budget_exhausted():
    clock = FakeClock()
    calls = []

    def op():
        calls.append(1)
        raise HttpError(503)

    with pytest.raises(HttpError):
        retry_call(
            op, RetryPolicy(max_retries=2), sleep=clock.sleep, now_s=clock.now, rng=lambda: 0.0
        )
    assert len(calls) == 3  # initial + 2 retries
    assert clock.sleeps == [0.5, 1.0]


def test_non_http_error_does_not_retry():
    with pytest.raises(ValueError):
        retry_call(
            lambda: (_ for _ in ()).throw(ValueError("boom")),
            RetryPolicy(),
            sleep=lambda _s: None,
        )


# -- rate limiter (reference: src/test/rateLimit.test.ts:5-21) ----------------


def test_rate_limiter_spaces_job_starts():
    clock = FakeClock()
    limiter = RateLimiter(3, now_s=clock.now, sleep=clock.sleep)
    start = clock.t
    for _ in range(4):
        limiter.run(lambda: None)
    # 4 jobs at 3 rps → ≥ 3 × ceil(1000/3)ms = 1.002 s total spacing
    assert clock.t - start >= 0.9
    assert sum(clock.sleeps) == pytest.approx(3 * 0.334)


# -- batching (reference: src/sinks/pbi/refresh/batchRows.ts) -----------------


def test_batch_rows_splits_and_validates():
    assert batch_rows(list(range(5)), 2) == [[0, 1], [2, 3], [4]]
    assert batch_rows([]) == []
    with pytest.raises(ValueError):
        batch_rows([1], 0)
    with pytest.raises(ValueError):
        batch_rows([1], 10_001)


def test_iter_row_batches_streams():
    out = list(iter_row_batches(iter(range(7)), 3))
    assert out == [[0, 1, 2], [3, 4, 5], [6]]


# -- governor (reference: src/sinks/pbi/refresh/governor.ts) ------------------


def test_governor_minute_post_budget_blocks_then_frees():
    clock = FakeClock()
    gov = RefreshGovernor(
        RefreshLimits(max_rows_per_hour=1000, max_posts_per_minute=2, max_posts_per_hour=100),
        now_s=clock.now,
        sleep=clock.sleep,
    )
    gov.record(rows=10, posts=1)
    gov.record(rows=10, posts=1)
    waited = gov.wait_for_budget(rows=10, posts=1)  # 3rd post within the minute
    assert waited == pytest.approx(60.0, abs=0.01)


def test_governor_row_budget_blocks_for_hour_window():
    clock = FakeClock()
    gov = RefreshGovernor(
        RefreshLimits(max_rows_per_hour=100, max_posts_per_minute=60, max_posts_per_hour=120),
        now_s=clock.now,
        sleep=clock.sleep,
    )
    gov.record(rows=90, posts=1)
    clock.t += 600  # 10 minutes pass
    waited = gov.wait_for_budget(rows=20, posts=1)  # 90+20 > 100
    assert waited == pytest.approx(3000.0, abs=0.01)  # rest of the hour


def test_governor_oversized_request_is_hard_error():
    gov = RefreshGovernor(RefreshLimits(max_rows_per_hour=100))
    with pytest.raises(ValueError):
        gov.wait_for_budget(rows=101, posts=0)
    with pytest.raises(ValueError):
        gov.record(rows=-1, posts=0)


def test_governor_no_wait_when_budget_free():
    clock = FakeClock()
    gov = RefreshGovernor(now_s=clock.now, sleep=clock.sleep)
    assert gov.wait_for_budget(rows=10_000, posts=1) == 0.0
