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


def test_excel_writer_roundtrips_real_xlsx(spark, tmp_path):
    """write_excel produces a REAL workbook with no dependencies: reopen the
    zip, parse the SpreadsheetML parts, and check sheet order, header
    styling/cells, value cells, and the column-width floor."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    t_b = spark.createDataFrame(
        [(1, None), (2, 'x <&> "q"')], "id long, label string"
    )
    t_a = spark.createDataFrame([], "id long")
    out = str(tmp_path / "out.xlsx")
    sheets = write_excel({"B_table": t_b, "A_table": t_a}, out)
    assert [s.name for s in sheets] == ["A_table", "B_table"]

    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml", "xl/styles.xml",
                "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"} <= names
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        assert [s.get("name") for s in wb.iter("{%s}sheet" % ns["m"])] == [
            "A_table", "B_table"
        ]
        s1 = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
        assert list(s1.iter("{%s}row" % ns["m"])) == []  # empty sheet
        s2 = ET.fromstring(zf.read("xl/worksheets/sheet2.xml"))
        rows = list(s2.iter("{%s}row" % ns["m"]))
        assert len(rows) == 3  # header + 2 data rows
        hdr = [c.find("m:is/m:t", ns).text for c in rows[0]]
        assert hdr == ["id", "label"]
        assert all(c.get("s") == "1" for c in rows[0])  # header style
        # row 2: numeric id cell, null label coerced to '' (empty inline str)
        cells = list(rows[1])
        assert cells[0].find("m:v", ns).text == "1"
        assert cells[1].find("m:is/m:t", ns).text is None  # '' round-trip
        cells = list(rows[2])
        assert cells[1].find("m:is/m:t", ns).text == 'x <&> "q"'  # escaping
        col = s2.find("m:cols/m:col", ns)
        assert float(col.get("width")) >= 15
        # styles: xf 1 = bold font on the solid gray fill
        st = ET.fromstring(zf.read("xl/styles.xml"))
        xfs = list(st.find("m:cellXfs", ns))
        assert xfs[1].get("fontId") == "1" and xfs[1].get("fillId") == "2"
        fill = list(st.find("m:fills", ns))[2].find("m:patternFill", ns)
        assert fill.get("patternType") == "solid"
        assert fill.find("m:fgColor", ns).get("rgb") == "FFE0E0E0"


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
