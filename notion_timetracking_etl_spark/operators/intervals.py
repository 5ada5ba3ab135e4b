"""Interval → hour-frame explode with a defensive length clamp.

The J4 strategy (SURVEY §7) turns the reference's O(frames × intervals)
nested-loop containment join (derive/index.ts:495-529) into
``explode(sequence(...))`` — linear in interval-hours and fully
Catalyst-native. Its one robustness hole at 100× scale: ``sequence`` is
unbounded, so a single corrupt far-future ``end_ts`` would materialize
millions of hour rows for that one interval (the reference's nested loop
had the same unbounded scan, but per frame, not per row).

``explode_to_hour_frames`` caps every interval at ``max_hours`` and exposes
the clamped rows for V7-style run counters — clamping is observable, never
silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

# ~13.7 months of hourly frames; far beyond any legitimate stage residency,
# small enough that one corrupt row costs 10k rows instead of millions.
DEFAULT_MAX_HOURS = 10_000

_MICROS_PER_HOUR = 3_600_000_000


def clamp_interval_end(
    iv: DataFrame, max_hours: int = DEFAULT_MAX_HOURS
) -> DataFrame:
    """Add ``end_ts_capped`` = min(end_ts, start_ts + max_hours) and a
    ``clamped`` flag. Pure column arithmetic — no shuffle, no Python."""
    cap = F.timestamp_micros(
        F.unix_micros(F.col("start_ts")) + F.lit(int(max_hours) * _MICROS_PER_HOUR)
    )
    return iv.withColumns(
        {
            "clamped": F.col("end_ts") > cap,
            "end_ts_capped": F.when(F.col("end_ts") > cap, cap).otherwise(
                F.col("end_ts")
            ),
        }
    )


def explode_to_hour_frames(
    iv: DataFrame,
    carry: tuple[str, ...],
    max_hours: int = DEFAULT_MAX_HOURS,
) -> tuple[DataFrame, DataFrame]:
    """Explode ``[start_ts, end_ts]`` intervals to their covered on-the-hour
    frames, inclusive containment (start <= h <= end), end clamped at
    ``max_hours`` past start.

    Returns ``(frames, clamped)``:

    - ``frames``: one row per (interval, covered hour) with columns
      ``(*carry, h)``. Generated from ``date_trunc('hour', start)`` then
      filtered ``h >= start`` — equivalent to ceil-to-hour of the start
      (derive/index.ts:507 containment semantics).
    - ``clamped``: the input rows whose end was capped, for the caller's
      V7 counter. Empty on healthy data, so counting it costs one cheap
      aggregated scan.
    """
    c = clamp_interval_end(iv, max_hours)
    frames = (
        c.select(
            *carry,
            "start_ts",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", "start_ts"),
                    F.date_trunc("hour", "end_ts_capped"),
                    F.expr("interval 1 hour"),
                )
            ).alias("h"),
        )
        .filter(F.col("h") >= F.col("start_ts"))
        .select(*carry, "h")
    )
    return frames, c.filter(F.col("clamped")).drop("clamped", "end_ts_capped")
