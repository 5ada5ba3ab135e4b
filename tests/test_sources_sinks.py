"""JSONL round-trip (S4/S5/S6), Excel sheet model (S7), and the Notion
source pull (S1/S2/S3 + F11) feeding the real normalize pipeline."""

from __future__ import annotations

import pytest

from notion_timetracking_etl_spark.schemas import RAW_RECORD_SCHEMA
from notion_timetracking_etl_spark.sinks.excel import build_workbook_model, write_excel
from notion_timetracking_etl_spark.sinks.jsonl import write_jsonl
from notion_timetracking_etl_spark.sources.jsonl import latest_partition, read_jsonl
from notion_timetracking_etl_spark.sources.notion import NotionSource
from notion_timetracking_etl_spark.lib.ratelimit import RateLimiter


# -- JSONL (S4/S5/S6) ---------------------------------------------------------


def test_jsonl_roundtrip_and_latest_partition(spark, tmp_path):
    base = str(tmp_path)
    df = spark.createDataFrame(
        [("notion", "page", "db1", "p1", None, None, None)], RAW_RECORD_SCHEMA
    )
    write_jsonl(df, base, "raw", "timeslices", "2026-01-01")
    write_jsonl(df, base, "raw", "timeslices", "2026-02-01")

    assert latest_partition(base, "raw", "timeslices") == "2026-02-01"
    assert latest_partition(base, "raw", "nothere") is None

    back = read_jsonl(spark, RAW_RECORD_SCHEMA, base, "raw", "timeslices")
    assert back.count() == 1
    row = back.collect()[0]
    assert (row.entityType, row.databaseId, row.pageId) == ("page", "db1", "p1")

    with pytest.raises(FileNotFoundError):
        read_jsonl(spark, RAW_RECORD_SCHEMA, base, "raw", "nothere")


# -- Excel (S7) ---------------------------------------------------------------


def test_excel_sheet_model_sorted_nulls_coerced(spark):
    t_b = spark.createDataFrame([(1, None), (2, "x")], "id long, label string")
    t_a = spark.createDataFrame([], "id long")
    sheets = build_workbook_model({"B_table": t_b, "A_table": t_a})
    assert [s.name for s in sheets] == ["A_table", "B_table"]  # sorted order
    assert sheets[0].rows == []  # empty sheet preserved
    assert sheets[1].header == ["id", "label"]
    assert sheets[1].rows == [[1, ""], [2, "x"]]  # null → ''


def test_excel_writer_gated_without_openpyxl(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl installed; gate not exercised")
    except ImportError:
        pass
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        write_excel({"T": df}, str(tmp_path / "out.xlsx"))


# -- Notion source (S1/S2/S3) -------------------------------------------------


class FakeNotionTransport:
    """Two-page cursor pagination with one non-page entry and a decoy shape."""

    def __init__(self):
        self.calls = []

    def retrieve_database(self, database_id):
        self.calls.append(("db", database_id))
        return {
            "id": database_id,
            "last_edited_time": "2026-01-02T00:00:00.000Z",
            "url": "https://notion.example/db",
            "title": [{"plain_text": "Timeslices"}],
            "properties": {
                "Name": {"id": "title_prop", "type": "title"},
                "Start": {"id": "start_date", "type": "date"},
            },
        }

    def query_database(self, database_id, start_cursor, page_size):
        self.calls.append(("query", start_cursor, page_size))
        if start_cursor is None:
            return {
                "results": [
                    _page("p1"),
                    {"object": "comment"},  # not page-shaped → dropped
                ],
                "has_more": True,
                "next_cursor": "c2",
            }
        assert start_cursor == "c2"
        return {"results": [_page("p2")], "has_more": False, "next_cursor": None}


def _page(pid):
    return {
        "id": pid,
        "last_edited_time": "2026-01-03T00:00:00.000Z",
        "created_time": "2026-01-01T00:00:00.000Z",
        "url": f"https://notion.example/{pid}",
        "properties": {
            "Name": {
                "id": "title_prop",
                "type": "title",
                "title": [{"plain_text": f"Page {pid}"}],
            },
            "Start": {
                "id": "start_date",
                "type": "date",
                "date": {"start": "2026-01-01T08:00:00.000Z"},
            },
            "Adhoc": {"type": "rich_text", "rich_text": [{"plain_text": "x"}]},
        },
    }


def _instant_source(transport):
    clock = {"t": 0.0}

    def now():
        return clock["t"]

    def sleep(s):
        clock["t"] += s

    return NotionSource(
        transport,
        limiter=RateLimiter(3, now_s=now, sleep=sleep),
        sleep=sleep,
    )


def test_pull_dataset_rekeys_properties_and_paginates(spark):
    transport = FakeNotionTransport()
    source = _instant_source(transport)
    records = source.pull_dataset("timeslices", "db1")

    # pagination: schema fetch + 2 query calls at page_size 100
    assert transport.calls[0] == ("db", "db1")
    assert transport.calls[1] == ("query", None, 100)
    assert transport.calls[2] == ("query", "c2", 100)

    assert [r["entityType"] for r in records] == ["database", "page", "page"]
    page = records[1]
    # F11: keyed by schema id for known names; embedded id absent → name key
    assert set(page["properties"]) == {"title_prop", "start_date", "Adhoc"}
    assert page["properties"]["title_prop"]["propertyName"] == "Name"
    assert page["metadata"]["dataset"] == "timeslices"


def test_pull_dataset_df_parses_through_raw_schema(spark):
    source = _instant_source(FakeNotionTransport())
    df = source.pull_dataset_df(spark, "timeslices", "db1")
    assert df.schema == RAW_RECORD_SCHEMA
    rows = {r.pageId: r for r in df.collect() if r.pageId}
    title = rows["p1"].properties["title_prop"].rawValue.title
    assert title[0].plain_text == "Page p1"
    start = rows["p2"].properties["start_date"].rawValue.date.start
    assert start == "2026-01-01T08:00:00.000Z"


def test_pull_feeds_normalize_pipeline(spark):
    """End-to-end: fake Notion transport → raw DF → canonical timeslices."""
    from notion_timetracking_etl_spark.config import (
        NotionConfig,
        TimeslicePropertyIds,
        WorkflowDefinitionPropertyIds,
        WorkflowStagePropertyIds,
    )
    from notion_timetracking_etl_spark.operators.normalize import (
        normalize_workflow_definitions,
    )

    source = _instant_source(FakeNotionTransport())
    raw = source.pull_dataset_df(spark, "workflow_definitions", "db1")
    config = NotionConfig(
        timeslices=TimeslicePropertyIds(),
        workflowStages=WorkflowStagePropertyIds(),
        workflowDefinitions=WorkflowDefinitionPropertyIds(title="title_prop"),
    )
    defs = normalize_workflow_definitions(raw, config).collect()
    assert sorted(d.page_title for d in defs) == ["Page p1", "Page p2"]
    assert all(d.workflow_definition_id.startswith("workflow_definition_") for d in defs)
