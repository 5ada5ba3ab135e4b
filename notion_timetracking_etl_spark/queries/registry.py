"""QuerySpec registry — single source of truth for driver-checked queries."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    survey_ops: str  # SURVEY §2 operator ids this query covers, e.g. "J1,A3"
    doc: str
    spark: SparkBuilder
    oracle: str | None  # DuckDB SQL over pre-registered views; None → rows-only
    # Optional bound check for oracle=None queries: (spark_rows, cols,
    # duckdb_con) -> error detail string, or None when the rows satisfy the
    # documented bound. Gives approx-sketch queries a failure mode in the
    # parity harness even though their internals aren't bit-replayable.
    check: Callable | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    survey_ops: str,
    doc: str,
    oracle: str | None = None,
    check: Callable | None = None,
) -> Callable[[SparkBuilder], SparkBuilder]:
    """Decorator: register a (spark builder, oracle SQL) pair under ``name``."""

    def wrap(fn: SparkBuilder) -> SparkBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, survey_ops=survey_ops, doc=doc, spark=fn, oracle=oracle,
            check=check,
        )
        return fn

    return wrap
