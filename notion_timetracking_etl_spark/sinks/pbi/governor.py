"""Refresh governor — sliding-window API budget (SURVEY S9).

Budgets (reference: src/sinks/pbi/refresh/limits.ts:1-3): ≤900,000 rows/hour,
≤60 POSTs/minute, ≤120 POSTs/hour. Semantics (governor.ts:15-141):

- ``wait_for_budget`` blocks until the request fits all three windows; the
  wait is the smallest time after which an expiring event frees enough budget
  (minimum 1 ms), re-checked in a loop.
- ``record`` logs rows (one event) and N post timestamps at "now".
- a single request larger than any whole budget is a hard error (it could
  never be satisfied).

Clock and sleep are injectable; tests drive a fake clock.
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable
from dataclasses import dataclass

MINUTE_S = 60.0
HOUR_S = 3600.0

DEFAULT_MAX_ROWS_PER_HOUR = 900_000
DEFAULT_MAX_POSTS_PER_MINUTE = 60
DEFAULT_MAX_POSTS_PER_HOUR = 120


@dataclass(frozen=True)
class RefreshLimits:
    max_rows_per_hour: int = DEFAULT_MAX_ROWS_PER_HOUR
    max_posts_per_minute: int = DEFAULT_MAX_POSTS_PER_MINUTE
    max_posts_per_hour: int = DEFAULT_MAX_POSTS_PER_HOUR


class RefreshGovernor:
    def __init__(
        self,
        limits: RefreshLimits | None = None,
        now_s: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._limits = limits or RefreshLimits()
        self._now_s = now_s
        self._sleep = sleep
        self._post_ts: list[float] = []
        self._row_events: list[tuple[float, int]] = []

    def wait_for_budget(self, rows: int, posts: int) -> float:
        """Block until (rows, posts) fits; returns total seconds waited."""
        self._validate(rows, posts)
        waited = 0.0
        while True:
            self._prune()
            delay = self._blocking_delay_s(rows, posts)
            if delay <= 0:
                return waited
            self._sleep(delay)
            waited += delay

    def record(self, rows: int, posts: int) -> None:
        self._validate(rows, posts)
        now = self._now_s()
        if rows > 0:
            self._row_events.append((now, rows))
        self._post_ts.extend([now] * posts)
        self._prune()

    def _validate(self, rows: int, posts: int) -> None:
        if rows < 0 or posts < 0:
            raise ValueError("governor input cannot be negative")
        if rows > self._limits.max_rows_per_hour:
            raise ValueError(
                f"requested rows ({rows}) exceed max_rows_per_hour "
                f"({self._limits.max_rows_per_hour})"
            )
        if posts > self._limits.max_posts_per_minute:
            raise ValueError(
                f"requested posts ({posts}) exceed max_posts_per_minute "
                f"({self._limits.max_posts_per_minute})"
            )
        if posts > self._limits.max_posts_per_hour:
            raise ValueError(
                f"requested posts ({posts}) exceed max_posts_per_hour "
                f"({self._limits.max_posts_per_hour})"
            )

    def _prune(self) -> None:
        hour_cutoff = self._now_s() - HOUR_S
        self._post_ts = [t for t in self._post_ts if t > hour_cutoff]
        self._row_events = [(t, r) for t, r in self._row_events if t > hour_cutoff]

    def _blocking_delay_s(self, rows: int, posts: int) -> float:
        now = self._now_s()
        minute_cutoff = now - MINUTE_S

        hour_rows = sum(r for _, r in self._row_events)
        minute_posts = sum(1 for t in self._post_ts if t > minute_cutoff)
        hour_posts = len(self._post_ts)

        exceeds_rows = hour_rows + rows > self._limits.max_rows_per_hour
        exceeds_minute = minute_posts + posts > self._limits.max_posts_per_minute
        exceeds_hour = hour_posts + posts > self._limits.max_posts_per_hour
        if not (exceeds_rows or exceeds_minute or exceeds_hour):
            return 0.0

        candidates: list[float] = []
        if exceeds_rows and self._row_events:
            candidates.append(self._row_events[0][0] + HOUR_S - now)
        if exceeds_minute:
            oldest_in_minute = next((t for t in self._post_ts if t > minute_cutoff), None)
            if oldest_in_minute is not None:
                candidates.append(oldest_in_minute + MINUTE_S - now)
        if exceeds_hour and self._post_ts:
            candidates.append(self._post_ts[0] + HOUR_S - now)
        if not candidates:
            raise RuntimeError("governor cannot compute wait for exceeded limits")
        # ceil to ms, minimum 1 ms — mirrors the reference's integer-ms waits.
        return max(0.001, min(math.ceil(max(0.0, c) * 1000) / 1000 for c in candidates))
