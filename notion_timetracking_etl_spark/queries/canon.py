"""Driver-checked parity queries for the P3/P4 canonical projections.

Round-3 verdict: ``operators/normalize.py``'s stage/definition builders
(reference: src/canon/workflowStage.ts:93-122, workflowDefinition.ts:38-61)
were the only oracle-reachable SURVEY §2 components without a driver-hashed
query. These two close that pocket: a raw Notion page fleet is synthesized
deterministically from ``events`` — real ``RAW_RECORD_SCHEMA`` rows whose
``properties`` map holds polymorphic ``rawValue`` payloads parsed via
``from_json`` — then the REAL ``normalize_workflow_stages`` /
``normalize_workflow_definitions`` operators run over it, configured property
IDs only. The DuckDB oracle states the expected canonical output analytically
from the same base columns, so any drift in the P1 page filter, the F2/F6/F8/
F9 extractors, F13 stableEntityId, F15 trim-to-null, or F17 sortKey breaks
the hash.

The fleet fires every edge the reference's unit tests pin
(src/test/normalize.test.ts): database-entity rows and null pageIds (P1
drops), empty relation arrays and empty-string relation ids (→ null
definition id), JSON-number / numeric-string / garbage-string stage numbers
(F9 try-parse), all four display-text payload shapes incl. whitespace-only
(F8 + F15), decoy properties that configured extraction must ignore, and the
configured-title → fallback-scan chain (F10) with a non-title decoy heading
the map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..config import (
    NotionConfig,
    WorkflowDefinitionPropertyIds,
    WorkflowStagePropertyIds,
)
from ..operators.normalize import (
    normalize_workflow_definitions,
    normalize_workflow_stages,
)
from ..schemas import RAW_PROPERTY_SCHEMA, RAW_VALUE_SCHEMA
from ..sources.tpch import load_table
from .pipeline import _iso, _sql_iso, _sql_uuid32, _uuid_from_hex32
from .registry import register

# ---------------------------------------------------------------------------
# Shared synthesis helpers — identical formulas both engines
# ---------------------------------------------------------------------------


def _prop_struct(pid: str, ptype: str, payload: Column) -> Column:
    """A RAW_PROPERTY_SCHEMA struct with its rawValue parsed from JSON."""
    return F.struct(
        F.lit(pid).alias("propertyId"),
        F.lit(pid).alias("propertyName"),
        F.lit(ptype).alias("propertyType"),
        F.from_json(payload, RAW_VALUE_SCHEMA).alias("rawValue"),
    ).cast(RAW_PROPERTY_SCHEMA)


def _shift_iso(ts: str | Column, micros: int) -> Column:
    """ISO-millis render of ``ts`` shifted by ``micros`` (pipeline convention)."""
    return _iso(F.timestamp_micros(F.unix_micros(ts) + micros))


def _entity_type(drop_mod: int) -> Column:
    return F.when(F.col("event_id") % drop_mod == 0, F.lit("database")).otherwise(
        F.lit("page")
    )


def _url() -> Column:
    return F.concat(F.lit("https://example.com/p/"), F.col("event_id").cast("string"))


_SQL_URL = "concat('https://example.com/p/', CAST(event_id AS VARCHAR))"


# ---------------------------------------------------------------------------
# P3 — workflow stages
# ---------------------------------------------------------------------------

_STAGE_CONFIG = NotionConfig(
    workflowStages=WorkflowStagePropertyIds(
        workflowDefinitionRel="p_def", stageNumber="p_num", stageLabel="p_lbl"
    )
)


def _stage_raw_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    eid_s = eid.cast("string")
    page_hex = F.md5(eid_s)
    j = F.lit

    def_payload = (
        F.when(eid % 11 == 0, j('{"type":"relation","relation":[]}'))
        .when(eid % 7 == 0, j('{"type":"relation","relation":[{"id":""}]}'))
        .otherwise(
            F.concat(
                j('{"type":"relation","relation":[{"id":"'),
                _uuid_from_hex32(F.md5("event_type")),
                j('"}]}'),
            )
        )
    )
    num_payload = (
        F.when(eid % 13 == 0, j('{"type":"number","number":null}'))
        .when(eid % 17 == 0, j('{"type":"number","number":"n/a"}'))
        .when(eid % 5 == 0, j('{"type":"number","number":"  7.5 "}'))
        .otherwise(
            F.concat(
                j('{"type":"number","number":'),
                ((eid % 40).cast("double") / F.lit(4.0)).cast("string"),
                j("}"),
            )
        )
    )
    lbl_payload = (
        F.when(
            eid % 4 == 0,
            F.concat(
                j('{"type":"title","title":[{"plain_text":"Stage "},{"plain_text":"'),
                F.col("event_type"),
                j('"}]}'),
            ),
        )
        .when(
            eid % 4 == 1,
            F.concat(
                j('{"type":"rich_text","rich_text":[{"plain_text":"  "},'
                  '{"plain_text":"L-'),
                F.col("event_type"),
                j('  "}]}'),
            ),
        )
        .when(
            eid % 4 == 2,
            F.concat(
                j('{"type":"select","select":{"name":"SEL '),
                F.upper("event_type"),
                j('"}}'),
            ),
        )
        .otherwise(j('{"type":"status","status":{"name":"   "}}'))
    )
    return ev.select(
        "event_id",
        _entity_type(29).alias("entityType"),
        F.when(eid % 31 == 0, F.lit(None).cast("string"))
        .otherwise(_uuid_from_hex32(page_hex))
        .alias("pageId"),
        F.lit("db-stages").alias("databaseId"),
        _shift_iso("ts", 7_200_000_000).alias("lastEditedTime"),
        F.map_from_arrays(
            F.array(j("p_def"), j("p_num"), j("p_lbl"), j("p_decoy")),
            F.array(
                _prop_struct("p_def", "relation", def_payload),
                _prop_struct("p_num", "number", num_payload),
                _prop_struct("p_lbl", "mixed", lbl_payload),
                # decoy: a title-typed property that configured extraction
                # must NOT read (reference: src/test/normalize.test.ts:46-67)
                _prop_struct(
                    "p_decoy", "title", j('{"type":"title","title":[{"plain_text":"DECOY"}]}')
                ),
            ),
        ).alias("properties"),
        F.map_from_arrays(
            F.array(j("created_time"), j("url")),
            F.array(_shift_iso("ts", -3_600_000_000), _url()),
        ).alias("metadata"),
    )


@register(
    "pipeline_canon_stages",
    "P1,P3,F2,F8,F9,F13,F15,F17",
    "The real normalize_workflow_stages projection (reference: "
    "canon/workflowStage.ts:93-122) over a synthesized raw Notion page "
    "fleet: P1 page filter (database rows + null pageIds dropped), F2 "
    "first-relation-id with empty-array/empty-id nulls, F9 number parse "
    "over JSON numbers / padded numeric strings / garbage, F8 polymorphic "
    "display text (title/rich_text/select/whitespace-status), F13 stable "
    "ids, F17 composite sort key — decoy property ignored throughout. "
    "Shuffle-free map-side projection; the only exchange is the final "
    "presentation sort.",
    oracle=f"""
        WITH base AS (
          SELECT event_id, event_type, ts,
                 {_sql_uuid32("md5(CAST(event_id AS VARCHAR))")} AS page_uuid
          FROM events
          WHERE event_id % 29 <> 0 AND event_id % 31 <> 0
        ),
        canon AS (
          SELECT
            concat('workflow_stage_', md5(CAST(event_id AS VARCHAR)))
              AS workflow_stage_id,
            CASE WHEN event_id % 11 = 0 OR event_id % 7 = 0 THEN NULL
                 ELSE concat('workflow_definition_', md5(event_type))
            END AS workflow_definition_id,
            page_uuid AS source_page_id,
            'db-stages' AS source_database_id,
            CASE WHEN event_id % 13 = 0 THEN NULL
                 WHEN event_id % 17 = 0 THEN NULL
                 WHEN event_id % 5 = 0 THEN CAST(7.5 AS DOUBLE)
                 ELSE CAST(event_id % 40 AS DOUBLE) / 4.0
            END AS stage_number,
            CASE WHEN event_id % 4 = 0 THEN concat('Stage ', event_type)
                 WHEN event_id % 4 = 1 THEN concat('L-', event_type)
                 WHEN event_id % 4 = 2 THEN concat('SEL ', upper(event_type))
                 ELSE NULL
            END AS stage_label,
            {_sql_iso("ts - INTERVAL 1 HOUR")} AS created_time,
            {_sql_iso("ts + INTERVAL 2 HOUR")} AS last_edited_time,
            {_SQL_URL} AS page_url
          FROM base
        )
        SELECT workflow_stage_id, workflow_definition_id, source_page_id,
               source_database_id, stage_number, stage_label,
               lower(concat_ws('|',
                 COALESCE(workflow_definition_id, ''),
                 COALESCE(trim(CAST(stage_number AS VARCHAR)), ''),
                 COALESCE(trim(stage_label), ''),
                 source_page_id)) AS sort_key,
               created_time, last_edited_time, page_url
        FROM canon
        ORDER BY workflow_stage_id
    """,
)
def pipeline_canon_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _stage_raw_fleet(spark, sf_dir)
    return (
        normalize_workflow_stages(raw, _STAGE_CONFIG)
        .select(
            "workflow_stage_id",
            "workflow_definition_id",
            "source_page_id",
            "source_database_id",
            "stage_number",
            "stage_label",
            "sort_key",
            "created_time",
            "last_edited_time",
            "page_url",
        )
        .orderBy("workflow_stage_id")
    )


# ---------------------------------------------------------------------------
# P4 — workflow definitions
# ---------------------------------------------------------------------------

_DEF_CONFIG = NotionConfig(
    workflowDefinitions=WorkflowDefinitionPropertyIds(title="p_title")
)


def _def_raw_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    eid_s = eid.cast("string")
    page_hex = F.md5(F.concat(F.lit("def"), eid_s))
    j = F.lit

    title_payload = (
        F.when(
            eid % 3 == 0,
            F.concat(
                j('{"type":"title","title":[{"plain_text":"Def "},{"plain_text":"'),
                eid_s,
                j('"}]}'),
            ),
        )
        # whitespace-only title → F15 trims to null → F10 fallback scan
        .when(eid % 3 == 1, j('{"type":"title","title":[{"plain_text":"   "}]}'))
        # wrong-typed payload under the configured id → extract_title null
        .otherwise(j('{"type":"rich_text","rich_text":[{"plain_text":"not a title"}]}'))
    )
    alt_payload = F.concat(
        j('{"type":"title","title":[{"plain_text":"Alt "},{"plain_text":"'),
        eid_s,
        j('"}]}'),
    )
    return ev.select(
        "event_id",
        _entity_type(23).alias("entityType"),
        F.when(eid % 19 == 0, F.lit(None).cast("string"))
        .otherwise(_uuid_from_hex32(page_hex))
        .alias("pageId"),
        F.lit("db-defs").alias("databaseId"),
        _shift_iso("ts", 2_700_000_000).alias("lastEditedTime"),
        # map order is load-bearing for the F10 fallback scan: a non-title
        # decoy FIRST (must be skipped), the configured title, then the alt
        # title the scan should find when the configured one yields null.
        F.map_from_arrays(
            F.array(j("p_decoy"), j("p_title"), j("p_alt")),
            F.array(
                _prop_struct(
                    "p_decoy",
                    "relation",
                    j('{"type":"relation","relation":[{"id":"decoy"}]}'),
                ),
                _prop_struct("p_title", "title", title_payload),
                _prop_struct("p_alt", "title", alt_payload),
            ),
        ).alias("properties"),
        F.map_from_arrays(
            F.array(j("created_time"), j("url")),
            F.array(_shift_iso("ts", -1_800_000_000), _url()),
        ).alias("metadata"),
    )


@register(
    "pipeline_canon_definitions",
    "P1,P4,F6,F10,F13,F15",
    "The real normalize_workflow_definitions projection (reference: "
    "canon/workflowDefinition.ts:38-61) over a synthesized raw fleet: "
    "configured-title extraction (F6) with whitespace-trim-to-null (F15) "
    "and wrong-type nulls, falling back to the F10 full-properties title "
    "scan that must skip a leading non-title decoy; P1 page filter and "
    "F13 stable ids. Map-side projection, no shuffle before the "
    "presentation sort.",
    oracle=f"""
        WITH base AS (
          SELECT event_id, ts,
                 {_sql_uuid32("md5(concat('def', CAST(event_id AS VARCHAR)))")}
                   AS page_uuid
          FROM events
          WHERE event_id % 23 <> 0 AND event_id % 19 <> 0
        )
        SELECT
          concat('workflow_definition_', md5(concat('def', CAST(event_id AS VARCHAR))))
            AS workflow_definition_id,
          page_uuid AS source_page_id,
          'db-defs' AS source_database_id,
          CASE WHEN event_id % 3 = 0 THEN concat('Def ', event_id)
               ELSE concat('Alt ', event_id)
          END AS page_title,
          {_sql_iso("ts - INTERVAL 30 MINUTE")} AS created_time,
          {_sql_iso("ts + INTERVAL 45 MINUTE")} AS last_edited_time,
          {_SQL_URL} AS page_url
        FROM base
        ORDER BY workflow_definition_id
    """,
)
def pipeline_canon_definitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _def_raw_fleet(spark, sf_dir)
    return (
        normalize_workflow_definitions(raw, _DEF_CONFIG)
        .select(
            "workflow_definition_id",
            "source_page_id",
            "source_database_id",
            "page_title",
            "created_time",
            "last_edited_time",
            "page_url",
        )
        .orderBy("workflow_definition_id")
    )
