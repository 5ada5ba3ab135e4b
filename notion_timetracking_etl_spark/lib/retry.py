"""HTTP retry policy (driver-side).

Behavioral parity with the reference policy (reference: src/lib/retry.ts:47-101):

- 429 → retry, honoring a ``retry-after`` header when present (seconds, float
  OK, or an HTTP date), else exponential backoff ``base * 2**attempt`` capped.
- 5xx → retry with capped exponential backoff plus 0–200 ms jitter.
- any other error → no retry, raise immediately.
- after ``max_retries`` failed retries the last error propagates.

Clock, sleep, and jitter are injectable so tests run instantly
(reference test: src/test/retry.test.ts:5-47).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from dataclasses import dataclass
from email.utils import parsedate_to_datetime
from typing import Any


class HttpError(Exception):
    """Transport-level failure carrying an HTTP status and response headers."""

    def __init__(
        self,
        status: int,
        message: str = "",
        headers: dict[str, str] | None = None,
        body_text: str = "",
    ):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message
        self.headers = headers or {}
        self.body_text = body_text


@dataclass(frozen=True)
class RetryPolicy:
    max_retries: int = 5
    base_delay_s: float = 0.5
    max_delay_s: float = 10.0


def _header(headers: dict[str, str], key: str) -> str | None:
    for k in (key, key.lower(), key.upper()):
        v = headers.get(k)
        if isinstance(v, str):
            return v
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
            return v[0]
    return None


def parse_retry_after_s(value: str | None, now_s: Callable[[], float]) -> float | None:
    """'retry-after' → seconds: numeric (fractional OK, rounded to ms,
    clamped >= 0) or HTTP date (delta from now)."""
    if not value:
        return None
    try:
        return max(0.0, round(float(value) * 1000) / 1000)
    except ValueError:
        pass
    try:
        dt = parsedate_to_datetime(value)
    except (TypeError, ValueError):
        return None
    if dt is None:
        return None
    return max(0.0, dt.timestamp() - now_s())


def decide_retry(
    error: Exception,
    attempt: int,
    policy: RetryPolicy,
    now_s: Callable[[], float] = time.time,
    rng: Callable[[], float] = random.random,
) -> tuple[bool, float]:
    """(should_retry, delay_s) for one failure; attempt counts from 0."""
    status = getattr(error, "status", None)
    if status == 429:
        retry_after = parse_retry_after_s(
            _header(getattr(error, "headers", {}) or {}, "retry-after"), now_s
        )
        if retry_after is not None:
            return True, retry_after
        return True, min(policy.base_delay_s * 2**attempt, policy.max_delay_s)
    if isinstance(status, int) and 500 <= status <= 599:
        backoff = min(policy.base_delay_s * 2**attempt, policy.max_delay_s)
        jitter = round(rng() * 200) / 1000
        return True, backoff + jitter
    return False, 0.0


def retry_call(
    operation: Callable[[], Any],
    policy: RetryPolicy,
    sleep: Callable[[float], None] = time.sleep,
    now_s: Callable[[], float] = time.time,
    rng: Callable[[], float] = random.random,
) -> Any:
    attempt = 0
    while True:
        try:
            return operation()
        except Exception as error:  # noqa: BLE001 — policy decides retryability
            if attempt >= policy.max_retries:
                raise
            should_retry, delay_s = decide_retry(error, attempt, policy, now_s, rng)
            if not should_retry:
                raise
            sleep(delay_s)
            attempt += 1
