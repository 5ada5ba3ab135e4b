"""Engine schemas (SURVEY §1).

The reference validates row shapes with zod at every boundary; here the same
contracts are explicit ``StructType``s used by readers (``from_json`` /
``spark.read.schema``) and asserted by tests.

Notion's polymorphic ``rawValue`` payload is modeled as a single permissive
struct covering every shape the extractors touch (title / relation / rollup /
date / number / select / status / formula / rich_text — reference:
src/canon/timeslice.ts:36-203, workflowStage.ts:22-77). Spark's JSON parser
leaves absent fields null, which reproduces the reference's "wrong shape →
null" guards without a union type. ``number`` is read as a string so both
JSON numbers and numeric strings survive to ``try_cast`` (reference:
rules.ts:23-32 normalizeNullableNumber).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


_DATE_STRUCT = StructType([_s("start"), _s("end"), _s("time_zone")])
_RELATION_ARR = ArrayType(StructType([_s("id")]))
_TEXT_ARR = ArrayType(StructType([_s("plain_text")]))

# One rollup array element — may itself be a date / relation / rich_text item.
_ROLLUP_ITEM = StructType(
    [
        _s("type"),
        StructField("date", _DATE_STRUCT, True),
        StructField("relation", _RELATION_ARR, True),
        StructField("rich_text", _TEXT_ARR, True),
    ]
)

RAW_VALUE_SCHEMA = StructType(
    [
        _s("type"),
        StructField("date", _DATE_STRUCT, True),
        StructField("relation", _RELATION_ARR, True),
        StructField(
            "rollup",
            StructType(
                [
                    _s("type"),
                    StructField("date", _DATE_STRUCT, True),
                    StructField("array", ArrayType(_ROLLUP_ITEM), True),
                ]
            ),
            True,
        ),
        StructField("title", _TEXT_ARR, True),
        StructField("rich_text", _TEXT_ARR, True),
        StructField("select", StructType([_s("name")]), True),
        StructField("status", StructType([_s("name")]), True),
        StructField("formula", StructType([_s("type"), _s("string")]), True),
        _s("number"),  # string: accepts JSON numbers AND numeric strings
    ]
)

RAW_PROPERTY_SCHEMA = StructType(
    [
        _s("propertyId"),
        _s("propertyName"),
        _s("propertyType"),
        StructField("rawValue", RAW_VALUE_SCHEMA, True),
    ]
)

# Ingest envelope (reference: src/ingress/rawRecord.ts:10-18)
RAW_RECORD_SCHEMA = StructType(
    [
        _s("source"),
        _s("entityType"),  # 'database' | 'page'
        _s("databaseId"),
        _s("pageId"),
        _s("lastEditedTime"),
        StructField("properties", MapType(StringType(), RAW_PROPERTY_SCHEMA), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

# Canonical tables (reference: src/canon/*.ts zod schemas). ``attributes``
# carries each property's rawValue re-serialized to JSON, keyed by property id.
_ATTRIBUTES = StructField("attributes", MapType(StringType(), StringType()), True)

WORKFLOW_DEFINITION_SCHEMA = StructType(
    [
        _s("workflow_definition_id"),
        _s("source_page_id"),
        _s("source_database_id"),
        _s("page_title"),
        _s("created_time"),
        _s("last_edited_time"),
        _s("page_url"),
        _ATTRIBUTES,
    ]
)

WORKFLOW_STAGE_SCHEMA = StructType(
    [
        _s("workflow_stage_id"),
        _s("workflow_definition_id"),
        _s("source_page_id"),
        _s("source_database_id"),
        StructField("stage_number", DoubleType(), True),
        _s("stage_label"),
        _s("sort_key"),
        _s("created_time"),
        _s("last_edited_time"),
        _s("page_url"),
        _ATTRIBUTES,
    ]
)

TIMESLICE_SCHEMA = StructType(
    [
        _s("timeslice_id"),
        _s("workflow_definition_id"),
        _s("workflow_record_id"),
        _s("workflow_instance_page_name"),
        _s("from_event_id"),
        _s("to_event_id"),
        _s("from_status"),
        _s("to_status"),
        _s("workflow_type"),
        _s("from_step_id"),
        _s("to_step_id"),
        _s("from_task_page_id"),
        _s("to_task_page_id"),
        _s("from_task_name"),
        _s("to_task_name"),
        _s("started_at"),
        _s("ended_at"),
        StructField("duration_seconds", LongType(), True),
        _s("source_page_id"),
        _s("source_database_id"),
        _s("created_time"),
        _s("last_edited_time"),
        _s("page_url"),
        _s("page_title"),
        _ATTRIBUTES,
    ]
)

# Quality side-output (reference: src/normalize/quality/types.ts:1-23)
QUALITY_ISSUE_SCHEMA = StructType(
    [
        _s("issue_id"),
        _s("run_date"),
        _s("dataset"),
        _s("entity_id"),
        _s("severity"),  # 'warn' | 'error'
        _s("rule"),
        _s("message"),
        _s("sample"),  # JSON string
    ]
)
