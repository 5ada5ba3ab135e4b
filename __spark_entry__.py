"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``notion_timetracking_etl_spark.queries.REGISTRY`` — the
single source of truth where every query is registered together with its
DuckDB oracle SQL, so the two surfaces cannot drift.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from notion_timetracking_etl_spark.queries import REGISTRY  # noqa: E402

# oracle=None queries can only ever produce an `err: "no_oracle"` row in a
# driver correctness sample, so they sort to the end of the ordering. As of
# round 8 this set is EMPTY by design: the two approx-sketch queries became
# their own audit twins (exact values + sketch-contract flags are the
# hashed output, the engine-specific estimates are not emitted), so every
# registered query is fully hash-checkable and the correctness union can
# reach the whole registry.
_NO_ORACLE_TAIL = [name for name, spec in REGISTRY.items() if spec.oracle is None]


def _last_sampled_round() -> dict[str, int]:
    """Per-query latest round the driver recorded a GREEN correctness row
    for, parsed from the committed CORRECTNESS_r*.json artifacts (0 =
    never-sampled OR most recent row was red — either way the query needs a
    fresh driver row and sorts to the front of the sampling window)."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = os.path.basename(path)
        try:
            rnd = int(m[len("CORRECTNESS_r"):-len(".json")])
            rows = json.load(open(path, encoding="utf-8"))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("hash_match") is not False
                and row.get("rows_match") is not False
                and row.get("err") in (None, "no_oracle")
            )
            if rnd >= seen.get(name, 0):
                seen[name] = rnd if green else 0
    return seen


def _changed_this_round() -> tuple[set[str], int]:
    """(names, change_round) from the committed CHANGED_QUERIES.txt — the
    builder rewrites it each round with the queries whose implementation
    changed plus a ``round: N`` directive, so the driver's sample covers
    new code the round it lands (r11 verdict task #5: LRU rotation alone
    deprioritizes a query that was recently verified but has since been
    re-implemented)."""
    out: set[str] = set()
    rnd = 0
    try:
        with open(
            os.path.join(_HERE, "CHANGED_QUERIES.txt"), encoding="utf-8"
        ) as fh:
            for line in fh:
                name = line.strip()
                if name.startswith("round:"):
                    try:
                        rnd = int(name[len("round:"):].strip())
                    except ValueError:
                        pass
                elif name and not name.startswith("#"):
                    out.add(name)
    except OSError:
        pass
    return out, rnd


def _driver_order() -> list[str]:
    """Registry names: queries changed THIS round first (they need a fresh
    driver row under the new code), then least-recently-verified — the
    driver samples the first 50 entries each round, so this ordering drives
    the cross-round union of correctness rows to cover the whole registry
    while guaranteeing same-round coverage of re-implemented queries.

    Ties (same last-sampled round — in particular the never-sampled set,
    which can exceed the 50-row window in a round that registers many new
    queries) break by REGISTRATION ORDER: the registry appends new families
    at the end, so oldest-registered unverified queries claim the window
    before this round's additions — a query never waits more than one extra
    round behind newer arrivals."""
    last = _last_sampled_round()
    tail = set(_NO_ORACLE_TAIL)
    # A changed-list entry is ACTIVE only until the query has a green row
    # from the CHANGE round (or later) — a green row that predates the
    # change verified the OLD code, so the entry stays front-loaded, but
    # once the driver has sampled it under the new code, a stale
    # CHANGED_QUERIES.txt (builder forgot to rewrite it next round)
    # degrades to a no-op instead of starving the LRU rotation forever
    # (r12 review finding). A file without a round directive is treated
    # as always-active (the pre-guard behavior).
    changed_names, change_round = _changed_this_round()
    changed = {
        n
        for n in changed_names
        if change_round == 0 or last.get(n, 0) < change_round
    }
    reg_idx = {n: i for i, n in enumerate(REGISTRY)}
    body = sorted(
        (n for n in REGISTRY if n not in tail),
        key=lambda n: (n not in changed, last.get(n, 0), reg_idx[n]),
    )
    return body + sorted(tail)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return REGISTRY["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: REGISTRY[name].spark for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query in :func:`queries`."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
