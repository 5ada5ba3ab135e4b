"""Normalize-stage tests — replicating the reference's unit suite
(reference: src/test/normalize.test.ts, rules.test.ts) over the Spark path."""

from __future__ import annotations

import dataclasses

import pytest

from notion_timetracking_etl_spark.config import MissingPropertyConfigError
from notion_timetracking_etl_spark.operators.normalize import (
    normalize_timeslices,
    normalize_workflow_definitions,
    normalize_workflow_stages,
)

from tests.notion_fixtures import (
    date,
    prop,
    raw_record,
    relation,
    rollup_array,
    rollup_date,
    rollup_rich_text,
    sample_timeslice_raw_record,
    sample_workflow_stage_raw_record,
    build_config,
    title,
    to_raw_df,
)


def test_canonical_timeslice_row(spark):
    """reference: normalize.test.ts:27-44."""
    df = normalize_timeslices(
        to_raw_df(spark, [sample_timeslice_raw_record()]), build_config()
    )
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["timeslice_id"] == "timeslice_123456781234123412341234567890ab"
    assert r["duration_seconds"] == 300
    assert (
        r["workflow_definition_id"]
        == "workflow_definition_aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    )
    assert r["from_step_id"] == "workflow_stage_bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb"
    assert r["to_step_id"] == "workflow_stage_cccccccccccccccccccccccccccccccc"
    assert r["started_at"] == "2026-02-01T12:00:00.000Z"
    assert r["ended_at"] == "2026-02-01T12:05:00.000Z"
    assert r["page_title"] == "Example Slice"
    assert r["source_page_id"] == "12345678-1234-1234-1234-1234567890ab"
    assert r["created_time"] == "2026-02-01T12:00:00.000Z"
    assert r["attributes"]["rel_workflow"] is not None


def test_configured_ids_beat_decoys(spark):
    """reference: normalize.test.ts:46-67 — config drives extraction."""
    cfg = build_config()
    cfg = dataclasses.replace(
        cfg,
        timeslices=dataclasses.replace(
            cfg.timeslices, workflowDefinitionRel="misleading_relation"
        ),
    )
    r = normalize_timeslices(
        to_raw_df(spark, [sample_timeslice_raw_record()]), cfg
    ).collect()[0]
    assert (
        r["workflow_definition_id"]
        == "workflow_definition_dddddddddddddddddddddddddddddddd"
    )
    assert r["started_at"] == "2026-02-01T12:00:00.000Z"  # not misleading_date


def test_missing_config_fails_fast(spark):
    """reference: normalize.test.ts:69-83 (V2)."""
    cfg = build_config()
    cfg = dataclasses.replace(
        cfg, timeslices=dataclasses.replace(cfg.timeslices, workflowDefinitionRel="")
    )
    with pytest.raises(MissingPropertyConfigError, match="timeslices"):
        normalize_timeslices(to_raw_df(spark, [sample_timeslice_raw_record()]), cfg)


def test_workflow_stage_row(spark):
    """reference: normalize.test.ts:85-100."""
    r = normalize_workflow_stages(
        to_raw_df(spark, [sample_workflow_stage_raw_record()]), build_config()
    ).collect()[0]
    assert (
        r["workflow_definition_id"]
        == "workflow_definition_aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    )
    assert r["stage_number"] == 3.0
    assert r["stage_label"] == "Approved"
    assert r["workflow_stage_id"] == "workflow_stage_22222222222222222222222222222222"
    # sort_key (reference: rules.ts:34-39 via workflowStage.ts:113)
    assert r["sort_key"] == (
        "workflow_definition_aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa|3.0|approved|"
        "22222222-2222-2222-2222-222222222222"
    )


def test_page_filter_drops_database_rows(spark):
    """P1 (reference: normalizeDatasets.ts:19-21)."""
    records = [
        sample_timeslice_raw_record(),
        raw_record(None, "db_timeslices", [], entity_type="database"),
    ]
    assert normalize_timeslices(to_raw_df(spark, records), build_config()).count() == 1


def test_rollup_shapes_and_fallbacks(spark):
    """F1/F3/F4/F5 rollup extraction + F10 title fallback scan."""
    rec = raw_record(
        page_id="99999999-9999-9999-9999-999999999999",
        database_id="db_timeslices",
        properties=[
            # no configured title property → fallback scan must find this one
            prop("other_title", "Other", "title", title("Fallback Title")),
            prop("rel_workflow", "Workflow", "rollup",
                 rollup_array({"type": "relation",
                               "relation": [{"id": "ABCDEFAB-1111-2222-3333-444444444444"}]})),
            prop("rel_from_step", "From", "relation", relation()),  # empty → null
            prop("rel_to_step", "To", "relation",
                 relation("cccccccc-cccc-cccc-cccc-cccccccccccc")),
            prop("start_date", "Start", "rollup", rollup_date("2026-03-01T08:00:00.000Z")),
            prop("end_date", "End", "rollup",
                 rollup_array({"type": "date", "date": {"start": "", "end": None}},
                              {"type": "date",
                               "date": {"start": "2026-03-01T09:30:00.000Z", "end": None}})),
            prop("ru_instance_name", "Instance", "rollup",
                 rollup_rich_text("", "  "),),  # all-empty → null
        ],
    )
    r = normalize_timeslices(to_raw_df(spark, [rec]), build_config()).collect()[0]
    assert r["page_title"] == "Fallback Title"
    # rollup(relation) id, lowercased by stableEntityId
    assert (
        r["workflow_definition_id"]
        == "workflow_definition_abcdefab111122223333444444444444"
    )
    assert r["from_step_id"] is None  # empty relation array
    # started_at: rollup(date) non-array shape → extract_date_start path
    assert r["started_at"] == "2026-03-01T08:00:00.000Z"
    # ended_at: first rollup-array element with non-empty start
    assert r["ended_at"] == "2026-03-01T09:30:00.000Z"
    assert r["workflow_instance_page_name"] is None
    assert r["duration_seconds"] == 5400


def test_definition_title_fallback(spark):
    """P4 (reference: workflowDefinition.ts:38-61)."""
    rec = raw_record(
        page_id="abcdefab-cdef-abcd-efab-cdefabcdefab",
        database_id="db_defs",
        properties=[prop("some_title", "Name", "title", title("My Workflow"))],
    )
    r = normalize_workflow_definitions(to_raw_df(spark, [rec]), build_config()).collect()[0]
    assert r["workflow_definition_id"] == (
        "workflow_definition_abcdefabcdefabcdefabcdefabcdefab"
    )
    assert r["page_title"] == "My Workflow"


def test_harvest_relation_uuids_nested_dedup_lowercase(spark):
    """F12: nested traversal, case folding, Set-dedup, non-UUIDs ignored."""
    import pyspark.sql.functions as F

    from notion_timetracking_etl_spark.functions.extract import (
        harvest_relation_uuids,
    )

    u1 = "0f8fad5b-d9cb-469f-a165-70867728950e"
    u2 = "7c9e6679-7425-40de-944b-e07fc1f90ae7"
    df = spark.createDataFrame(
        [((u1.upper(), [u2, u1], "plain"),)],
        "v struct<a:string, ids:array<string>, noise:string>",
    )
    got = df.select(harvest_relation_uuids(F.col("v")).alias("u")).collect()[0].u
    assert got == [u1, u2]
