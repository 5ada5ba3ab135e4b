"""Notion database source (SURVEY S1–S3).

Pull semantics (reference: src/ingress/notionAdapter.ts + pullNotion.ts):

- S1 schema scan: GET database → property name → (id, type) catalog
  (pullNotion.ts:31-43).
- S2 page scan: cursor pagination at ``page_size=100`` (notionAdapter.ts:52),
  keeping only page-shaped results (id + properties + last_edited_time,
  :55-62), looping while ``has_more`` with ``next_cursor``.
- S3 resilience: every API call goes through a global 3 req/s, concurrency-1
  rate limiter (notionAdapter.ts:75; lib/rateLimit.ts:3-9) and the standard
  retry policy at 5×, 500 ms base, 8 s cap (notionAdapter.ts:79-82).
- F11 re-keying: page properties keyed by property **id** from the schema
  name→id map, falling back to the property's embedded id, then its name
  (pullNotion.ts:44-65). The database itself becomes one ``entityType=
  'database'`` record; each page one ``'page'`` record (pullNotion.ts:78-102).

The transport is injectable (``retrieve_database(id)`` / ``query_database(id,
cursor, page_size)``), so tests drive scripted payloads and production binds
the REST API. The pull itself is driver-side — quota-bound at 3 req/s, never
a Spark bottleneck — and lands in a DataFrame via RAW_RECORD_SCHEMA, after
which everything is distributed.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession

from ..lib.ratelimit import RateLimiter
from ..lib.retry import RetryPolicy, retry_call
from ..schemas import RAW_RECORD_SCHEMA

PAGE_SIZE = 100
REQUESTS_PER_SECOND = 3
RETRY_POLICY = RetryPolicy(max_retries=5, base_delay_s=0.5, max_delay_s=8.0)


class NotionTransport(Protocol):
    def retrieve_database(self, database_id: str) -> dict: ...

    def query_database(
        self, database_id: str, start_cursor: str | None, page_size: int
    ) -> dict: ...


@dataclass
class NotionSource:
    transport: NotionTransport
    limiter: RateLimiter | None = None
    sleep: Callable[[float], None] | None = None

    def __post_init__(self) -> None:
        if self.limiter is None:
            self.limiter = RateLimiter(REQUESTS_PER_SECOND)

    def _call(self, fn: Callable[[], Any]) -> Any:
        kwargs = {} if self.sleep is None else {"sleep": self.sleep}
        return self.limiter.run(lambda: retry_call(fn, RETRY_POLICY, **kwargs))

    # -- S1/S2 ---------------------------------------------------------------

    def retrieve_database(self, database_id: str) -> dict:
        return self._call(lambda: self.transport.retrieve_database(database_id))

    def query_all_pages(self, database_id: str) -> list[dict]:
        pages: list[dict] = []
        cursor: str | None = None
        while True:
            response = self._call(
                lambda c=cursor: self.transport.query_database(database_id, c, PAGE_SIZE)
            )
            for entry in response.get("results", []):
                if (
                    isinstance(entry, dict)
                    and "properties" in entry
                    and "id" in entry
                    and "last_edited_time" in entry
                ):
                    pages.append(entry)
            if not response.get("has_more"):
                return pages
            cursor = response.get("next_cursor") or None
            if cursor is None:
                return pages

    # -- pull → RawRecord rows ----------------------------------------------

    def pull_dataset(self, dataset: str, database_id: str) -> list[dict]:
        database = self.retrieve_database(database_id)
        pages = self.query_all_pages(database_id)
        name_to_id = {
            name: (str(val.get("id", name)), str(val.get("type", "unknown")))
            for name, val in (database.get("properties") or {}).items()
            if isinstance(val, dict)
        }

        records = [
            {
                "source": "notion",
                "entityType": "database",
                "databaseId": database_id,
                "pageId": None,
                "lastEditedTime": database.get("last_edited_time"),
                "properties": {
                    str(val.get("id", name)): _raw_property(
                        str(val.get("id", name)), name, str(val.get("type", "unknown")), val
                    )
                    for name, val in (database.get("properties") or {}).items()
                    if isinstance(val, dict)
                },
                "metadata": _meta(
                    dataset,
                    title=database.get("title"),
                    url=database.get("url"),
                ),
            }
        ]
        for page in pages:
            props = {}
            for name, val in (page.get("properties") or {}).items():
                if not isinstance(val, dict):
                    continue
                pid, ptype = name_to_id.get(
                    name, (str(val.get("id", name)), str(val.get("type", "unknown")))
                )
                props[pid] = _raw_property(pid, name, ptype, val)
            records.append(
                {
                    "source": "notion",
                    "entityType": "page",
                    "databaseId": database_id,
                    "pageId": page["id"],
                    "lastEditedTime": page["last_edited_time"],
                    "properties": props,
                    "metadata": _meta(
                        dataset,
                        created_time=page.get("created_time"),
                        url=page.get("url"),
                    ),
                }
            )
        return records

    def pull_dataset_df(
        self, spark: SparkSession, dataset: str, database_id: str
    ) -> DataFrame:
        """Pull one database into a RAW_RECORD_SCHEMA DataFrame.

        Rows round-trip through JSON so the polymorphic rawValue payloads
        parse through the same schema-on-read path as file ingestion.
        """
        records = self.pull_dataset(dataset, database_id)
        return spark.read.schema(RAW_RECORD_SCHEMA).json(
            spark.sparkContext.parallelize([json.dumps(r) for r in records])
        )


def _raw_property(pid: str, name: str, ptype: str, raw_value: dict) -> dict:
    return {
        "propertyId": pid,
        "propertyName": name,
        "propertyType": ptype,
        "rawValue": raw_value,
    }


def _meta(dataset: str, **extra: Any) -> dict[str, str]:
    out = {"dataset": dataset}
    for k, v in extra.items():
        if v is not None:
            out[k] = v if isinstance(v, str) else json.dumps(v)
    return out
