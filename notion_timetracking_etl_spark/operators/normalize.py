"""Raw → canonical projections (SURVEY §2.2 P1–P4).

Each builder is a narrow, shuffle-free ``select`` over the raw-record
DataFrame — the whole normalize stage is map-side at any scale; Catalyst
prunes the properties map accesses down to the configured keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ..config import NotionConfig, require_configured
from ..schemas import RAW_VALUE_SCHEMA
from ..functions import extract as X
from ..functions.strings import sort_key, stable_entity_id
from ..functions.datetimes import duration_seconds, parse_iso


def _page_filter(raw: DataFrame) -> DataFrame:
    """P1 (reference: normalizeDatasets.ts:19-21): pages with a pageId only."""
    return raw.filter((F.col("entityType") == "page") & F.col("pageId").isNotNull())


def _prop(pid: str) -> Column:
    """Configured-property lookup: properties[pid].rawValue (F11 re-keyed ids)."""
    return F.element_at(F.col("properties"), pid)["rawValue"]


def _opt_prop(pid: str) -> Column:
    """Optional binding: unset id → always-null payload (reference:
    canon/timeslice.ts:245-257 `ids.x ? ... : undefined`)."""
    if pid and pid.strip():
        return _prop(pid)
    return F.lit(None).cast(RAW_VALUE_SCHEMA)  # typed null; extractors yield null


def _meta(key: str) -> Column:
    return F.element_at(F.col("metadata"), key)


def _prefixed(prefix: str, source_id: Column) -> Column:
    """``stableEntityId`` only when the source id resolved, else null
    (reference: canon/timeslice.ts:282-288)."""
    return F.when(source_id.isNotNull(), stable_entity_id(prefix, source_id))


def normalize_workflow_definitions(raw: DataFrame, config: NotionConfig) -> DataFrame:
    """P4 (reference: canon/workflowDefinition.ts:38-61)."""
    title_id = config.workflowDefinitions.title
    configured_title = (
        X.extract_title(_prop(title_id)) if title_id.strip() else F.lit(None).cast("string")
    )
    return _page_filter(raw).select(
        stable_entity_id("workflow_definition", F.col("pageId")).alias(
            "workflow_definition_id"
        ),
        F.col("pageId").alias("source_page_id"),
        F.col("databaseId").alias("source_database_id"),
        F.coalesce(configured_title, X.title_fallback_scan(F.col("properties"))).alias(
            "page_title"
        ),
        _meta("created_time").alias("created_time"),
        F.col("lastEditedTime").alias("last_edited_time"),
        _meta("url").alias("page_url"),
        X.attributes_json(F.col("properties")).alias("attributes"),
    )


def normalize_workflow_stages(raw: DataFrame, config: NotionConfig) -> DataFrame:
    """P3 (reference: canon/workflowStage.ts:93-122)."""
    require_configured(config.workflowStages, "workflowStages")
    ids = config.workflowStages
    wf_def_id = _prefixed(
        "workflow_definition", X.extract_first_relation_id(_prop(ids.workflowDefinitionRel))
    )
    stage_number = X.extract_number(_prop(ids.stageNumber))
    stage_label = X.first_display_text(_prop(ids.stageLabel))
    return _page_filter(raw).select(
        stable_entity_id("workflow_stage", F.col("pageId")).alias("workflow_stage_id"),
        wf_def_id.alias("workflow_definition_id"),
        F.col("pageId").alias("source_page_id"),
        F.col("databaseId").alias("source_database_id"),
        stage_number.alias("stage_number"),
        stage_label.alias("stage_label"),
        sort_key(wf_def_id, stage_number, stage_label, F.col("pageId")).alias("sort_key"),
        _meta("created_time").alias("created_time"),
        F.col("lastEditedTime").alias("last_edited_time"),
        _meta("url").alias("page_url"),
        X.attributes_json(F.col("properties")).alias("attributes"),
    )


def _relation_id_rollup_or_plain(raw_value: Column) -> Column:
    """Rollup-first relation extraction with plain-relation fallback.

    The reference builder calls extractFirstRollupRelationId
    (canon/timeslice.ts:268,273-274) but its unit tests bind plain relation
    payloads and expect them to resolve (src/test/normalize.test.ts:41-44,
    fixtures.ts:24-50) — the spec'd behavior is therefore rollup ?? relation.
    """
    return F.coalesce(
        X.extract_first_rollup_relation_id(raw_value),
        X.extract_first_relation_id(raw_value),
    )


def normalize_timeslices(raw: DataFrame, config: NotionConfig) -> DataFrame:
    """P2 (reference: canon/timeslice.ts:231-320) — the 25-column wide projection."""
    require_configured(config.timeslices, "timeslices")
    ids = config.timeslices

    started_at = F.coalesce(
        X.extract_first_rollup_date_start(_prop(ids.startedAtDate)),
        X.extract_date_start(_prop(ids.startedAtDate)),
    )
    ended_at = F.coalesce(
        X.extract_first_rollup_date_start(_prop(ids.endedAtDate)),
        X.extract_date_start(_prop(ids.endedAtDate)),
    )
    # page title: configured *definitions* title property first, then fallback
    # scan over all properties (reference: canon/timeslice.ts:259-266)
    def_title_id = config.workflowDefinitions.title
    configured_title = (
        X.extract_title(_prop(def_title_id))
        if def_title_id.strip()
        else F.lit(None).cast("string")
    )

    return _page_filter(raw).select(
        stable_entity_id("timeslice", F.col("pageId")).alias("timeslice_id"),
        _prefixed(
            "workflow_definition",
            _relation_id_rollup_or_plain(_prop(ids.workflowDefinitionRel)),
        ).alias("workflow_definition_id"),
        _prefixed(
            "workflow_record", X.extract_first_relation_id(_prop(ids.workflowRecordRel))
        ).alias("workflow_record_id"),
        X.extract_first_rollup_rich_text(_prop(ids.workflowInstancePageName)).alias(
            "workflow_instance_page_name"
        ),
        _prefixed("event", X.extract_first_relation_id(_opt_prop(ids.fromEventRel))).alias(
            "from_event_id"
        ),
        _prefixed("event", X.extract_first_relation_id(_opt_prop(ids.toEventRel))).alias(
            "to_event_id"
        ),
        X.extract_first_rollup_rich_text(_opt_prop(ids.fromStatus)).alias("from_status"),
        X.extract_first_rollup_rich_text(_opt_prop(ids.toStatus)).alias("to_status"),
        X.extract_formula_string(_opt_prop(ids.workflowType)).alias("workflow_type"),
        _prefixed(
            "workflow_stage", _relation_id_rollup_or_plain(_prop(ids.fromStageRel))
        ).alias("from_step_id"),
        _prefixed(
            "workflow_stage", _relation_id_rollup_or_plain(_prop(ids.toStageRel))
        ).alias("to_step_id"),
        X.extract_first_rollup_rich_text(_prop(ids.fromTaskPageId)).alias(
            "from_task_page_id"
        ),
        X.extract_first_rollup_rich_text(_prop(ids.toTaskPageId)).alias("to_task_page_id"),
        X.extract_first_rollup_rich_text(_prop(ids.fromTaskName)).alias("from_task_name"),
        X.extract_first_rollup_rich_text(_prop(ids.toTaskName)).alias("to_task_name"),
        started_at.alias("started_at"),
        ended_at.alias("ended_at"),
        duration_seconds(parse_iso(started_at), parse_iso(ended_at)).alias(
            "duration_seconds"
        ),
        F.col("pageId").alias("source_page_id"),
        F.col("databaseId").alias("source_database_id"),
        _meta("created_time").alias("created_time"),
        F.col("lastEditedTime").alias("last_edited_time"),
        _meta("url").alias("page_url"),
        F.coalesce(configured_title, X.title_fallback_scan(F.col("properties"))).alias(
            "page_title"
        ),
        X.attributes_json(F.col("properties")).alias("attributes"),
    )


def normalize_all(
    raw_definitions: DataFrame,
    raw_stages: DataFrame,
    raw_timeslices: DataFrame,
    config: NotionConfig,
) -> dict[str, DataFrame]:
    """The normalize stage over the three datasets
    (reference: normalizeDatasets.ts:47-65, pre-quality)."""
    return {
        "workflow_definitions": normalize_workflow_definitions(raw_definitions, config),
        "workflow_stages": normalize_workflow_stages(raw_stages, config),
        "timeslices": normalize_timeslices(raw_timeslices, config),
    }
