"""Star-schema relationship model for the push-dataset sink.

The 8 FK edges of the derived model (reference:
src/sinks/pbi/spec/buildModelSpec.ts:42-107), with the same
``From.col__to__To.col`` relationship-name convention (:5-6). These edges are
also the documented join keys of the star schema — DimStage and DimDate are
the shared conformed dimensions.
"""

from __future__ import annotations

from ..sinks.pbi.spec import RelationshipSpec

_EDGES = (
    ("StageOccupancy_Hourly", "frame_n", "DimPlaybackFrame", "frame_n"),
    ("StageOccupancy_Hourly", "stage_key", "DimStage", "stage_key"),
    ("FactTimeslices", "from_stage_key", "DimStage", "stage_key"),
    ("StageThroughput_Daily", "stage_key", "DimStage", "stage_key"),
    ("StageThroughput_Daily", "bucket_day", "DimDate", "Date"),
    ("DimPlaybackFrame", "frame_date", "DimDate", "Date"),
    ("FactTimeslices", "To Date", "DimDate", "Date"),
    ("DimStage", "workflow_definition_key", "DimWorkflow", "workflow_definition_key"),
)


def rel_name(from_table: str, from_col: str, to_table: str, to_col: str) -> str:
    return f"{from_table}.{from_col}__to__{to_table}.{to_col}"


def build_model_relationships() -> tuple[RelationshipSpec, ...]:
    return tuple(
        RelationshipSpec(
            name=rel_name(ft, fc, tt, tc),
            from_table=ft,
            from_column=fc,
            to_table=tt,
            to_column=tc,
            cross_filtering_behavior="OneDirection",
        )
        for ft, fc, tt, tc in _EDGES
    )
