"""Notion-shaped test fixtures.

Python re-creation of the reference's shared fixtures
(reference: src/test/fixtures.ts:3-150) — one timeslice page and one stage
page, each with decoy ("misleading") properties that configured-ID-driven
extraction must ignore — plus raw-record builders for pipeline tests.

Records are JSON-serialized and read through ``RAW_RECORD_SCHEMA`` so tests
exercise the real ingest path (schema-on-read, polymorphic rawValue parsing).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from notion_timetracking_etl_spark.config import (
    NotionConfig,
    TimeslicePropertyIds,
    WorkflowDefinitionPropertyIds,
    WorkflowStagePropertyIds,
)
from notion_timetracking_etl_spark.schemas import RAW_RECORD_SCHEMA


def build_config() -> NotionConfig:
    """Property bindings mirroring the reference test override
    (src/test/normalize.test.ts:8-25), widened to all required ids."""
    return NotionConfig(
        timeslices=TimeslicePropertyIds(
            workflowDefinitionRel="rel_workflow",
            workflowRecordRel="rel_record",
            workflowInstancePageName="ru_instance_name",
            fromStageRel="rel_from_step",
            toStageRel="rel_to_step",
            startedAtDate="start_date",
            endedAtDate="end_date",
            fromTaskPageId="ru_from_task_page",
            toTaskPageId="ru_to_task_page",
            fromTaskName="ru_from_task_name",
            toTaskName="ru_to_task_name",
            fromStatus="ru_from_status",
            toStatus="ru_to_status",
            workflowType="f_workflow_type",
        ),
        workflowStages=WorkflowStagePropertyIds(
            workflowDefinitionRel="wf_rel",
            stageNumber="stage_number",
            stageLabel="stage_label",
        ),
        workflowDefinitions=WorkflowDefinitionPropertyIds(title="title_prop"),
    )


def prop(pid: str, name: str, ptype: str, raw_value: dict) -> dict:
    return {
        "propertyId": pid,
        "propertyName": name,
        "propertyType": ptype,
        "rawValue": raw_value,
    }


def title(text: str) -> dict:
    return {"type": "title", "title": [{"plain_text": text}]}


def relation(*ids: str) -> dict:
    return {"type": "relation", "relation": [{"id": i} for i in ids]}


def date(start: str | None, end: str | None = None) -> dict:
    return {"type": "date", "date": {"start": start, "end": end}}


def rollup_array(*items: dict) -> dict:
    return {"type": "rollup", "rollup": {"type": "array", "array": list(items)}}


def rollup_date(start: str) -> dict:
    return {"type": "rollup", "rollup": {"type": "date", "date": {"start": start}}}


def rollup_rich_text(*texts: str) -> dict:
    return rollup_array(
        {"type": "rich_text", "rich_text": [{"plain_text": t} for t in texts]}
    )


def rich_text(*texts: str) -> dict:
    return {"type": "rich_text", "rich_text": [{"plain_text": t} for t in texts]}


def number(n) -> dict:
    return {"type": "number", "number": n}


def formula_string(s: str) -> dict:
    return {"type": "formula", "formula": {"type": "string", "string": s}}


def raw_record(
    page_id: str | None,
    database_id: str,
    properties: list[dict],
    entity_type: str = "page",
    last_edited: str | None = "2026-02-01T12:10:00.000Z",
    created: str = "2026-02-01T12:00:00.000Z",
    url: str = "https://notion.example/page",
) -> dict:
    return {
        "source": "notion",
        "entityType": entity_type,
        "databaseId": database_id,
        "pageId": page_id,
        "lastEditedTime": last_edited,
        "properties": {p["propertyId"]: p for p in properties},
        "metadata": {"created_time": created, "url": url},
    }


def sample_timeslice_raw_record() -> dict:
    """reference: fixtures.ts:3-89 (decoys included)."""
    return raw_record(
        page_id="12345678-1234-1234-1234-1234567890ab",
        database_id="db_timeslices",
        properties=[
            prop("title_prop", "Name", "title", title("Example Slice")),
            prop("rel_workflow", "Workflow", "relation",
                 relation("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa")),
            prop("rel_from_step", "From", "relation",
                 relation("bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb")),
            prop("rel_to_step", "To", "relation",
                 relation("cccccccc-cccc-cccc-cccc-cccccccccccc")),
            prop("start_date", "Start", "date", date("2026-02-01T12:00:00.000Z")),
            prop("end_date", "End", "date", date("2026-02-01T12:05:00.000Z")),
            prop("misleading_relation", "Other Relation", "relation",
                 relation("dddddddd-dddd-dddd-dddd-dddddddddddd")),
            prop("misleading_date", "Other Date", "date",
                 date("2026-02-01T20:00:00.000Z")),
        ],
    )


def sample_workflow_stage_raw_record() -> dict:
    """reference: fixtures.ts:91-150 (decoys included)."""
    return raw_record(
        page_id="22222222-2222-2222-2222-222222222222",
        database_id="db_stages",
        properties=[
            prop("wf_rel", "Workflow Definition", "relation",
                 relation("aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa")),
            prop("stage_number", "Stage Number", "number", number(3)),
            prop("stage_label", "Stage Label", "rich_text", rich_text("Approved")),
            prop("misleading_rel", "Other Relation", "relation",
                 relation("ffffffff-ffff-ffff-ffff-ffffffffffff")),
            prop("misleading_number", "Other Number", "number", number(999)),
        ],
    )


def to_raw_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """JSON round-trip through the real ingest schema (schema-on-read path)."""
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in records])
    return spark.read.schema(RAW_RECORD_SCHEMA).json(rdd)
