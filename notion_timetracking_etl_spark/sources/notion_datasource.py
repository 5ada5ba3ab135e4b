"""Notion Python DataSource (SURVEY §2.11 optional extra: "a DataSource V2
for the Notion API (S1–S3)").

``sources/notion.py`` pulls one database driver-side — correct for a single
quota-bound database, but a workspace with MANY databases leaves the cluster
idle while the driver crawls them sequentially. This module lifts the same
pull (identical S1/S2/S3 semantics, same ``NotionSource`` code path) into
Spark's Python DataSource API (pyspark 4):

- **one input partition per database id** — each executor slot pulls its
  database through its own 3 req/s rate limiter + retry policy, so a 100-
  database workspace ingests with 100-way parallelism while honoring the
  per-connection quota (Notion quotas are per integration token; callers
  that share one token across executors pass a lower ``requests_per_second``
  to keep the aggregate inside their quota);
- **bytes at the boundary, parsing in the JVM** — partitions emit
  ``(dataset, database_id, record_json)`` rows; :func:`load_notion_records`
  applies ``from_json(RAW_RECORD_SCHEMA)`` so the polymorphic ``rawValue``
  payloads go through the exact same schema-on-read path as file ingestion
  (schemas.py docstring), and Catalyst can prune/push past the parse.

The transport is injected as a ``module:callable`` factory path (resolved on
the executor, so the option stays a plain string — the DataSource option
contract). Tests bind a scripted transport; production binds the REST client.
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from ..schemas import RAW_RECORD_SCHEMA

TRANSPORT_SCHEMA = "dataset string, database_id string, record_json string"


def resolve_factory(path: str):
    """Resolve a ``module:callable`` transport-factory path (executor-side)."""
    module_name, _, attr = path.partition(":")
    if not module_name or not attr:
        raise ValueError(
            f"transport_factory must be 'module:callable', got {path!r}"
        )
    return getattr(importlib.import_module(module_name), attr)


class DatabasePartition(InputPartition):
    def __init__(self, database_id: str):
        self.database_id = database_id


class NotionDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dataset = options.get("dataset", "notion")
        self.factory_path = options["transport_factory"]
        self.rps = float(options.get("requests_per_second", 3))
        databases = options.get("databases", "")
        self.database_ids = [d.strip() for d in databases.split(",") if d.strip()]
        if not self.database_ids:
            raise ValueError("option 'databases' must list >=1 database id")

    def partitions(self) -> Sequence[InputPartition]:
        # The parallel unit is the database: cursor pagination inside one
        # database is inherently sequential (S2), but databases are
        # independent streams.
        return [DatabasePartition(d) for d in self.database_ids]

    def read(self, partition: DatabasePartition) -> Iterator[tuple]:
        # Import inside read(): this body runs on executors.
        from ..lib.ratelimit import RateLimiter
        from .notion import NotionSource

        transport = resolve_factory(self.factory_path)()
        source = NotionSource(transport, limiter=RateLimiter(self.rps))
        for record in source.pull_dataset(self.dataset, partition.database_id):
            yield (self.dataset, partition.database_id, json.dumps(record))


class NotionDataSource(DataSource):
    """``spark.read.format("notion")`` — options: ``databases`` (comma-sep
    ids), ``transport_factory`` ("module:callable"), ``dataset``,
    ``requests_per_second``."""

    @classmethod
    def name(cls) -> str:
        return "notion"

    def schema(self) -> str:
        return TRANSPORT_SCHEMA

    def reader(self, schema: StructType) -> NotionDataSourceReader:
        return NotionDataSourceReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(NotionDataSource)


def load_notion_records(
    spark: SparkSession,
    databases: Sequence[str],
    transport_factory: str,
    dataset: str = "notion",
    requests_per_second: float = 3,
) -> DataFrame:
    """Parallel multi-database pull → RAW_RECORD_SCHEMA rows (the same shape
    ``NotionSource.pull_dataset_df`` produces for one database)."""
    register(spark)
    raw = (
        spark.read.format("notion")
        .option("databases", ",".join(databases))
        .option("transport_factory", transport_factory)
        .option("dataset", dataset)
        .option("requests_per_second", str(requests_per_second))
        .load()
    )
    return raw.select(
        F.from_json(F.col("record_json"), RAW_RECORD_SCHEMA).alias("r")
    ).select("r.*")
