"""Oracle-checked queries for the Notion payload extractors (F1–F10) and the
quality-rule engine (V3/F21/A7).

The extractors' unit tests (tests/test_normalize.py) prove fixture-level
semantics; these queries additionally hash-verify them at testdata scale:
polymorphic Notion payload JSON is synthesized deterministically from the
``orders`` table (shape chosen by ``o_orderkey % 8``), parsed through
``RAW_VALUE_SCHEMA`` with ``from_json``, and run through the real
higher-order-function extractors. The DuckDB oracle states the expected
output per shape directly from the same base columns — so any drift in the
JSON schema contract, the HOF expressions, or null/trim semantics breaks the
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..functions import extract as X
from ..operators.quality import _issues_for, stage_rules, timeslice_rules
from ..schemas import RAW_PROPERTY_SCHEMA, RAW_VALUE_SCHEMA
from ..sources.tpch import load_table
from .pipeline import _CANON_CTES, synth_canon
from .registry import register

# ---------------------------------------------------------------------------
# Payload synthesis — identical formulas both engines
# ---------------------------------------------------------------------------

def _uuid_sql(h: str) -> str:
    return (
        f"concat(substr({h},1,8),'-',substr({h},9,4),'-',substr({h},13,4),'-',"
        f"substr({h},17,4),'-',substr({h},21,12))"
    )


def _payload_col() -> F.Column:
    """JSON payload string, shape = o_orderkey % 8 (see oracle for the map)."""
    k = F.col("o_orderkey")
    iso = F.date_format("o_orderdate", "yyyy-MM-dd")
    h = F.md5(k.cast("string"))
    uid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    kstr = k.cast("string")
    shape = (k % 8).cast("int")
    j = F.lit
    return (
        F.when(shape == 0, F.concat(j('{"type":"date","date":{"start":"'), iso, j('"}}')))
        .when(
            shape == 1,
            F.concat(
                j('{"type":"rollup","rollup":{"type":"date","date":{"start":"'),
                iso,
                j('"}}}'),
            ),
        )
        .when(
            shape == 2,
            F.concat(
                j(
                    '{"type":"rollup","rollup":{"type":"array","array":['
                    '{"type":"rich_text","rich_text":[{"plain_text":"  "}]},'
                    '{"type":"relation","relation":[{"id":"'
                ),
                uid,
                j('"}]},{"type":"date","date":{"start":"'),
                iso,
                j(
                    '"}},{"type":"rich_text","rich_text":'
                    '[{"plain_text":" note "},{"plain_text":"x"}]}]}}'
                ),
            ),
        )
        .when(
            shape == 3,
            F.concat(
                j('{"type":"title","title":[{"plain_text":"Order "},{"plain_text":"'),
                kstr,
                j('"}]}'),
            ),
        )
        .when(shape == 4, F.concat(j('{"type":"relation","relation":[{"id":"'), uid, j('"}]}')))
        .when(
            shape == 5,
            F.concat(
                j('{"type":"formula","formula":{"type":"string","string":"  padded '),
                kstr,
                j('  "}}'),
            ),
        )
        .when(shape == 6, F.concat(j('{"type":"select","select":{"name":"S'), (k % 5).cast("string"), j('"}}')))
        .otherwise(F.concat(j('{"type":"number","number":'), kstr, j(".25}")))
    )


@register(
    "notion_extract_scalars",
    "F1,F2,F3,F4,F5,F6,F7,F8,F9,F10,V1",
    "The Notion payload extractor library at testdata scale: polymorphic "
    "payload JSON synthesized per order (8 shapes incl. rollup arrays with "
    "decoy elements), parsed via from_json(RAW_VALUE_SCHEMA), and run "
    "through every F1-F10 higher-order-function extractor plus the F10 "
    "title fallback scan over a properties map. Oracle states expected "
    "values per shape from the base columns.",
    oracle=f"""
        WITH base AS (
          SELECT o_orderkey AS okey,
                 o_orderkey % 8 AS shape,
                 strftime(o_orderdate, '%Y-%m-%d') AS iso,
                 {_uuid_sql("md5(CAST(o_orderkey AS VARCHAR))")} AS uid
          FROM orders
        )
        SELECT okey,
               CASE WHEN shape IN (0, 1, 2) THEN iso END AS date_start,
               CASE WHEN shape = 4 THEN uid END AS relation_id,
               CASE WHEN shape = 2 THEN uid END AS rollup_relation_id,
               CASE WHEN shape = 2 THEN iso END AS rollup_date_start,
               CASE WHEN shape = 2 THEN 'note x' END AS rollup_rich_text,
               CASE WHEN shape = 3 THEN concat('Order ', okey) END AS title,
               CASE WHEN shape = 5 THEN concat('padded ', okey) END AS formula_string,
               CASE WHEN shape = 3 THEN concat('Order ', okey)
                    WHEN shape = 6 THEN concat('S', okey % 5) END AS display_text,
               CASE WHEN shape = 7 THEN CAST(okey + 0.25 AS DOUBLE) END AS num_val,
               CASE WHEN shape = 3 THEN concat('Order ', okey) END AS title_fallback
        FROM base
        ORDER BY okey
    """,
)
def notion_extract_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    parsed = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.from_json(_payload_col(), RAW_VALUE_SCHEMA).alias("raw"),
    )
    # properties map for the F10 fallback scan: a decoy non-title property
    # first, then the row's own payload — the scan must skip the decoy.
    decoy = F.from_json(
        F.lit('{"type":"relation","relation":[{"id":"decoy"}]}'), RAW_VALUE_SCHEMA
    )
    prop = lambda raw: F.struct(  # noqa: E731
        F.lit(None).cast("string").alias("propertyId"),
        F.lit(None).cast("string").alias("propertyName"),
        F.lit(None).cast("string").alias("propertyType"),
        raw.alias("rawValue"),
    ).cast(RAW_PROPERTY_SCHEMA)
    props = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")), F.array(prop(decoy), prop(F.col("raw")))
    )
    return parsed.select(
        "okey",
        X.extract_date_start(F.col("raw")).alias("date_start"),
        X.extract_first_relation_id(F.col("raw")).alias("relation_id"),
        X.extract_first_rollup_relation_id(F.col("raw")).alias("rollup_relation_id"),
        X.extract_first_rollup_date_start(F.col("raw")).alias("rollup_date_start"),
        X.extract_first_rollup_rich_text(F.col("raw")).alias("rollup_rich_text"),
        X.extract_title(F.col("raw")).alias("title"),
        X.extract_formula_string(F.col("raw")).alias("formula_string"),
        X.first_display_text(F.col("raw")).alias("display_text"),
        X.extract_number(F.col("raw")).alias("num_val"),
        X.title_fallback_scan(props).alias("title_fallback"),
    ).orderBy("okey")


# ---------------------------------------------------------------------------
# Quality rules over synthesized canon
# ---------------------------------------------------------------------------

_RUN_DATE = "2026-01-01"  # injected for determinism (reference seam:
# quality/timeslices.ts:13-20)

_ISSUE_SQL = (
    "sha256(concat_ws('|', '{rd}', '{ds}', entity_id, rule)) AS issue_id, "
    "'{rd}' AS run_date, '{ds}' AS dataset, entity_id, severity, rule"
)


@register(
    "pipeline_quality_issues",
    "V3,F21,U1,A7,P5",
    "The declarative quality-rule engine over synthesized canon: all 6 "
    "timeslice rules + the stage rule as when() predicates unioned into one "
    "issue table with sha256 issue ids. The synthesized fleet fires every "
    "rule (modular null injection + negative intervals).",
    oracle=f"""
        WITH {_CANON_CTES},
        t AS (SELECT *, TRY_CAST(started_at AS TIMESTAMP) AS s_ts,
                        TRY_CAST(ended_at AS TIMESTAMP) AS e_ts FROM slices),
        ts_issues AS (
          SELECT timeslice_id AS entity_id, 'error' AS severity,
                 'MISSING_WORKFLOW_DEFINITION' AS rule
          FROM t WHERE workflow_definition_id IS NULL
          UNION ALL
          SELECT timeslice_id, 'warn', 'FROM_STEP_WITHOUT_STARTED_AT'
          FROM t WHERE from_step_id IS NOT NULL AND started_at IS NULL
          UNION ALL
          SELECT timeslice_id, 'warn', 'TO_STEP_WITHOUT_ENDED_AT'
          FROM t WHERE to_step_id IS NOT NULL AND ended_at IS NULL
          UNION ALL
          SELECT timeslice_id, 'warn', 'WORKFLOW_WITH_NO_STEPS'
          FROM t WHERE workflow_definition_id IS NOT NULL
            AND from_step_id IS NULL AND to_step_id IS NULL
          UNION ALL
          SELECT timeslice_id, 'warn', 'STEPS_WITHOUT_ANY_TIMESTAMP'
          FROM t WHERE (from_step_id IS NOT NULL OR to_step_id IS NOT NULL)
            AND started_at IS NULL AND ended_at IS NULL
          UNION ALL
          SELECT timeslice_id, 'warn', 'NEGATIVE_DURATION'
          FROM t WHERE started_at IS NOT NULL AND ended_at IS NOT NULL
            AND s_ts IS NOT NULL AND e_ts IS NOT NULL AND e_ts < s_ts
        ),
        st_issues AS (
          SELECT workflow_stage_id AS entity_id, 'warn' AS severity,
                 'STAGE_MISSING_LABEL_OR_NUMBER' AS rule
          FROM stages WHERE stage_label IS NULL OR stage_number IS NULL
        )
        SELECT {_ISSUE_SQL.format(rd=_RUN_DATE, ds="timeslices")} FROM ts_issues
        UNION ALL
        SELECT {_ISSUE_SQL.format(rd=_RUN_DATE, ds="workflowStages")} FROM st_issues
        ORDER BY issue_id
    """,
)
def pipeline_quality_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = synth_canon(spark, sf_dir)
    issues = _issues_for(
        c["slices"], "timeslice_id", "timeslices", _RUN_DATE, timeslice_rules()
    ).unionByName(
        _issues_for(
            c["stages"], "workflow_stage_id", "workflowStages", _RUN_DATE, stage_rules()
        )
    )
    return issues.select(
        "issue_id", "run_date", "dataset", "entity_id", "severity", "rule"
    ).orderBy("issue_id")
