"""Quality rules (SURVEY §2.11 V3) — declarative rule tables → issue DataFrame.

Each rule is a ``when()`` predicate + message + sample projection; issues are
produced by unioning per-rule filtered projections of the canon tables —
narrow, shuffle-free, and trivially parallel at any scale. The report (A7/A8)
is a single aggregation.

reference: src/normalize/quality/timeslices.ts:30-151, workflowStages.ts:11-29,
index.ts:8-49.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ..functions.datetimes import parse_iso
from ..functions.strings import issue_id


@dataclass(frozen=True)
class QualityRule:
    rule: str
    severity: str  # 'warn' | 'error'
    message: str
    predicate: Column
    sample_cols: tuple[str, ...]


def timeslice_rules() -> list[QualityRule]:
    c = F.col
    started_ms = F.unix_millis(parse_iso(c("started_at")))
    ended_ms = F.unix_millis(parse_iso(c("ended_at")))
    return [
        QualityRule(
            "MISSING_WORKFLOW_DEFINITION",
            "error",
            "Timeslice is missing workflow_definition_id and will be excluded.",
            c("workflow_definition_id").isNull(),
            ("timeslice_id", "from_step_id", "to_step_id"),
        ),
        QualityRule(
            "FROM_STEP_WITHOUT_STARTED_AT",
            "warn",
            "Timeslice has from_step_id but started_at is null.",
            c("from_step_id").isNotNull() & c("started_at").isNull(),
            ("from_step_id",),
        ),
        QualityRule(
            "TO_STEP_WITHOUT_ENDED_AT",
            "warn",
            "Timeslice has to_step_id but ended_at is null.",
            c("to_step_id").isNotNull() & c("ended_at").isNull(),
            ("to_step_id",),
        ),
        QualityRule(
            "WORKFLOW_WITH_NO_STEPS",
            "warn",
            "Timeslice has workflow_definition_id but no from/to steps.",
            c("workflow_definition_id").isNotNull()
            & c("from_step_id").isNull()
            & c("to_step_id").isNull(),
            ("workflow_definition_id",),
        ),
        QualityRule(
            "STEPS_WITHOUT_ANY_TIMESTAMP",
            "warn",
            "Timeslice has steps but both started_at and ended_at are null.",
            (c("from_step_id").isNotNull() | c("to_step_id").isNotNull())
            & c("started_at").isNull()
            & c("ended_at").isNull(),
            ("from_step_id", "to_step_id"),
        ),
        QualityRule(
            "NEGATIVE_DURATION",
            "warn",
            "Timeslice ended_at is earlier than started_at.",
            c("started_at").isNotNull()
            & c("ended_at").isNotNull()
            & started_ms.isNotNull()
            & ended_ms.isNotNull()
            & (ended_ms < started_ms),
            ("started_at", "ended_at"),
        ),
    ]


def stage_rules() -> list[QualityRule]:
    return [
        QualityRule(
            "STAGE_MISSING_LABEL_OR_NUMBER",
            "warn",
            "Workflow stage is missing stage_label or stage_number.",
            F.col("stage_label").isNull() | F.col("stage_number").isNull(),
            ("stage_label", "stage_number"),
        )
    ]


def _issues_for(
    df: DataFrame, entity_col: str, dataset: str, run_date: str, rules: list[QualityRule]
) -> DataFrame:
    parts = []
    for r in rules:
        sample = F.to_json(F.struct(*[F.col(col) for col in r.sample_cols]))
        parts.append(
            df.filter(r.predicate).select(
                issue_id(
                    F.lit(run_date), F.lit(dataset), F.col(entity_col), F.lit(r.rule)
                ).alias("issue_id"),
                F.lit(run_date).alias("run_date"),
                F.lit(dataset).alias("dataset"),
                F.col(entity_col).alias("entity_id"),
                F.lit(r.severity).alias("severity"),
                F.lit(r.rule).alias("rule"),
                F.lit(r.message).alias("message"),
                sample.alias("sample"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)  # U1
    return out


def evaluate_quality(
    timeslices: DataFrame, workflow_stages: DataFrame, run_date: str
) -> dict:
    """Issues + report + exclusion filter (reference: quality/index.ts:8-49).

    ``run_date`` is injected for determinism (reference seam:
    quality/timeslices.ts:13-20).
    Returns dict with 'issues' (DataFrame), 'report' (driver dict),
    'timeslices_clean' (P5-filtered DataFrame).
    """
    issues = _issues_for(
        timeslices, "timeslice_id", "timeslices", run_date, timeslice_rules()
    ).unionByName(
        _issues_for(
            workflow_stages, "workflow_stage_id", "workflowStages", run_date, stage_rules()
        )
    )

    # P5 exclusion (reference: normalizeDatasets.ts:54-56): drop error rows.
    timeslices_clean = timeslices.filter(F.col("workflow_definition_id").isNotNull())

    # A7/A8 report aggregates (reference: quality/index.ts:29-44).
    totals = timeslices.agg(
        F.count(F.lit(1)).alias("timeslices_total"),
        F.sum(F.when(F.col("workflow_definition_id").isNull(), 1).otherwise(0)).alias(
            "timeslices_excluded_missing_workflow_definition"
        ),
        F.sum(F.when(F.col("to_step_id").isNotNull(), 1).otherwise(0)).alias(
            "to_step_count"
        ),
    ).collect()[0]
    by_rule = {
        r["rule"]: r["n"]
        for r in issues.groupBy("rule").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    report = {
        "run_date": run_date,
        "counts": {
            "timeslices_total": totals["timeslices_total"],
            "timeslices_excluded_missing_workflow_definition": totals[
                "timeslices_excluded_missing_workflow_definition"
            ]
            or 0,
            "issues_total": sum(by_rule.values()),
            "issues_by_rule": by_rule,
        },
        "flags": {"no_to_step_in_run": (totals["to_step_count"] or 0) == 0},
    }
    return {"issues": issues, "report": report, "timeslices_clean": timeslices_clean}
