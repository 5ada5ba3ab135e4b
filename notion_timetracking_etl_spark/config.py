"""Property-ID bindings — the engine's schema-on-read seam.

The reference binds Notion property IDs to canonical columns via runtime
config (reference: src/config/env.ts:121-156; test override seam
env.ts:158-175). Extraction is driven by configured property IDs ONLY —
decoy properties of the same type must be ignored
(reference: src/test/normalize.test.ts:46-67).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass(frozen=True)
class TimeslicePropertyIds:
    """reference: env.ts propertyIds.timeslices + canon/timeslice.ts:241-257."""

    workflowDefinitionRel: str = ""
    workflowRecordRel: str = ""
    workflowInstancePageName: str = ""
    fromEventRel: str = ""
    toEventRel: str = ""
    fromStageRel: str = ""
    toStageRel: str = ""
    fromStatus: str = ""
    toStatus: str = ""
    startedAtDate: str = ""
    endedAtDate: str = ""
    fromTaskPageId: str = ""
    toTaskPageId: str = ""
    fromTaskName: str = ""
    toTaskName: str = ""
    workflowType: str = ""

    # Bindings the reference guards with `ids.x ? ... : undefined` — allowed
    # to be empty without failing validation (canon/timeslice.ts:245-257).
    OPTIONAL = frozenset(
        {"fromEventRel", "toEventRel", "fromStatus", "toStatus", "workflowType"}
    )


@dataclass(frozen=True)
class WorkflowStagePropertyIds:
    """reference: canon/workflowStage.ts:98-104."""

    workflowDefinitionRel: str = ""
    stageNumber: str = ""
    stageLabel: str = ""

    OPTIONAL = frozenset()


@dataclass(frozen=True)
class WorkflowDefinitionPropertyIds:
    """reference: canon/workflowDefinition.ts:46-48 (title fallback scan if empty)."""

    title: str = ""

    OPTIONAL = frozenset({"title"})


@dataclass(frozen=True)
class NotionConfig:
    timeslices: TimeslicePropertyIds = field(default_factory=TimeslicePropertyIds)
    workflowStages: WorkflowStagePropertyIds = field(
        default_factory=WorkflowStagePropertyIds
    )
    workflowDefinitions: WorkflowDefinitionPropertyIds = field(
        default_factory=WorkflowDefinitionPropertyIds
    )


class MissingPropertyConfigError(ValueError):
    """V2 fail-fast (reference: canon/timeslice.ts:205-217, workflowStage.ts:79-91)."""


def require_configured(ids, dataset: str) -> None:
    missing = [
        f.name
        for f in fields(ids)
        if f.name not in ids.OPTIONAL and not getattr(ids, f.name).strip()
    ]
    if missing:
        raise MissingPropertyConfigError(
            f"Missing configured property IDs for {dataset}: {', '.join(missing)}."
        )
