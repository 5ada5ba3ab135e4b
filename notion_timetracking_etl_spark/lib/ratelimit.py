"""Global rate limiter (driver-side).

Serialized min-interval scheduling: concurrency 1, at most ``rps`` request
*starts* per second with an interval of ``ceil(1000/rps)`` ms between starts
(reference: src/lib/rateLimit.ts:3-9 — Bottleneck maxConcurrent:1 + minTime;
timing expectation: src/test/rateLimit.test.ts:5-21, ≥ ~900 ms for 4 jobs at
3 rps).

Only external-API calls go through this (the Notion/Power BI boundaries);
Spark-side work is never rate-limited.
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable
from typing import Any


class RateLimiter:
    def __init__(
        self,
        requests_per_second: float,
        now_s: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._min_interval_s = math.ceil(1000 / requests_per_second) / 1000
        self._now_s = now_s
        self._sleep = sleep
        self._next_start_s: float | None = None

    def run(self, operation: Callable[[], Any]) -> Any:
        now = self._now_s()
        if self._next_start_s is not None and now < self._next_start_s:
            self._sleep(self._next_start_s - now)
            now = self._next_start_s
        self._next_start_s = now + self._min_interval_s
        return operation()
