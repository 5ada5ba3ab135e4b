"""Tests for the Notion Python DataSource (SURVEY §2.11 optional extra).

The contract under test: ``spark.read.format("notion")`` with N database ids
produces exactly the rows the driver-side ``NotionSource.pull_dataset_df``
path produces for each database — same S1/S2/S3 code path, executor-side,
one partition per database.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_timetracking_etl_spark.sources.notion_datasource import (
    load_notion_records,
    resolve_factory,
)

FACTORY = "notion_timetracking_etl_spark.sources.notion_demo:small_demo_transport"


def test_resolve_factory_roundtrip():
    transport = resolve_factory(FACTORY)()
    db = transport.retrieve_database("db-a")
    assert db["properties"]["Stage"]["id"] == "stg"
    page1 = transport.query_database("db-a", None, 2)
    assert page1["has_more"] and len(page1["results"]) == 2
    page2 = transport.query_database("db-a", page1["next_cursor"], 2)
    assert [r["id"] for r in page1["results"]] != [r["id"] for r in page2["results"]]


def test_datasource_multi_database_parallel_pull(spark):
    df = load_notion_records(
        spark,
        ["db-a", "db-b", "db-c"],
        FACTORY,
        dataset="demo",
        requests_per_second=1000,
    )
    rows = df.collect()
    # per database: 1 database record + 5 page records
    assert len(rows) == 3 * 6
    by_type = {
        (r.databaseId, r.entityType)
        for r in rows
    }
    assert ("db-b", "database") in by_type and ("db-c", "page") in by_type
    # properties re-keyed by property id (F11) survive the JSON round-trip
    page = next(r for r in rows if r.entityType == "page")
    assert set(page.properties.keys()) == {"ttl", "stg", "hrs"}
    assert page.properties["stg"].rawValue.select.name.endswith(". Stage")


def test_datasource_matches_driver_side_pull(spark):
    from notion_timetracking_etl_spark.sources.notion import NotionSource
    from notion_timetracking_etl_spark.sources.notion_demo import (
        small_demo_transport,
    )

    via_ds = load_notion_records(
        spark, ["db-x"], FACTORY, dataset="demo", requests_per_second=1000
    )
    source = NotionSource(small_demo_transport(), sleep=lambda _s: None)
    via_driver = source.pull_dataset_df(spark, "demo", "db-x")
    key = [
        "entityType",
        F.coalesce(F.col("pageId"), F.lit("-")).alias("pid"),
    ]
    assert via_ds.select(*key).exceptAll(via_driver.select(*key)).count() == 0
    assert via_driver.select(*key).exceptAll(via_ds.select(*key)).count() == 0
    assert via_ds.schema == via_driver.schema


def test_datasource_partitions_one_per_database(spark):
    df = load_notion_records(
        spark, ["db-1", "db-2"], FACTORY, requests_per_second=1000
    )
    # spark_partition_id is assigned per input partition → 2 distinct ids
    n_parts = (
        df.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert n_parts == 2
