"""Push-dataset model spec + validation (SURVEY V6).

Limits and rules (reference: src/sinks/pbi/spec/validateSpec.ts:3-18,48-159):
≤75 tables, ≤75 columns/table, ≤75 relationships; names non-empty, trimmed,
≤100 chars, no control chars, case-insensitively unique; column types from
the push whitelist {Int64, Double, Boolean, String, DateTime}
(src/sinks/pbi/spec/types.ts:1); the 7-table set is exact (no missing/extra);
relationship endpoints must exist (case-insensitive).

``spec_from_frames`` derives the spec from DataFrame schemas instead of a
hand-maintained column list — the Spark-native equivalent of
buildModelSpec (src/sinks/pbi/spec/buildModelSpec.ts:42-107).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

MAX_TABLES = 75
MAX_COLUMNS_PER_TABLE = 75
MAX_RELATIONSHIPS = 75
MAX_NAME_LENGTH = 100
_CONTROL_CHARS = re.compile("[\\u0000-\\u001F\\u007F]")
SUPPORTED_COLUMN_TYPES = frozenset({"Int64", "Double", "Boolean", "String", "DateTime"})
VALID_CROSS_FILTERING = frozenset({"OneDirection", "BothDirections", "Automatic"})

REQUIRED_TABLE_NAMES = (
    "FactTimeslices",
    "DimWorkflow",
    "DimStage",
    "DimDate",
    "DimPlaybackFrame",
    "StageOccupancy_Hourly",
    "StageThroughput_Daily",
)


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    data_type: str


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[ColumnSpec, ...]


@dataclass(frozen=True)
class RelationshipSpec:
    name: str
    from_table: str
    from_column: str
    to_table: str
    to_column: str
    cross_filtering_behavior: str | None = None


@dataclass(frozen=True)
class DatasetSpec:
    name: str
    tables: tuple[TableSpec, ...]
    relationships: tuple[RelationshipSpec, ...] = field(default_factory=tuple)
    default_retention_policy: str = "None"


class SpecValidationError(ValueError):
    pass


def pbi_type_for(dt: DataType) -> str:
    """Spark type → push-dataset column type (whitelist of 5)."""
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return "Int64"
    if isinstance(dt, (FloatType, DoubleType)):
        return "Double"
    if isinstance(dt, BooleanType):
        return "Boolean"
    if isinstance(dt, (TimestampType, DateType)):
        return "DateTime"
    if isinstance(dt, StringType):
        return "String"
    raise SpecValidationError(f"Spark type {dt.simpleString()} has no push-dataset mapping")


def spec_from_frames(
    name: str,
    tables: dict[str, DataFrame],
    relationships: tuple[RelationshipSpec, ...] = (),
) -> DatasetSpec:
    table_specs = tuple(
        TableSpec(
            name=t,
            columns=tuple(
                ColumnSpec(f.name, pbi_type_for(f.dataType)) for f in tables[t].schema
            ),
        )
        for t in tables
    )
    return DatasetSpec(name=name, tables=table_specs, relationships=relationships)


def _validate_name(kind: str, name: str) -> None:
    if not name:
        raise SpecValidationError(f"{kind} name cannot be empty")
    if name != name.strip():
        raise SpecValidationError(f"{kind} name {name!r} has leading/trailing whitespace")
    if _CONTROL_CHARS.search(name):
        raise SpecValidationError(f"{kind} name {name!r} contains control characters")
    if len(name) > MAX_NAME_LENGTH:
        raise SpecValidationError(f"{kind} name {name!r} exceeds {MAX_NAME_LENGTH} chars")


def validate_spec(spec: DatasetSpec, required_tables: tuple[str, ...] = REQUIRED_TABLE_NAMES) -> None:
    if len(spec.tables) > MAX_TABLES:
        raise SpecValidationError(f"tables ({len(spec.tables)}) > {MAX_TABLES}")

    seen_tables: set[str] = set()
    for table in spec.tables:
        _validate_name("table", table.name)
        low = table.name.lower()
        if low in seen_tables:
            raise SpecValidationError(f"duplicate table name {table.name!r}")
        seen_tables.add(low)
        if len(table.columns) > MAX_COLUMNS_PER_TABLE:
            raise SpecValidationError(
                f"columns in {table.name!r} ({len(table.columns)}) > {MAX_COLUMNS_PER_TABLE}"
            )
        seen_cols: set[str] = set()
        for col in table.columns:
            _validate_name("column", col.name)
            if col.name.lower() in seen_cols:
                raise SpecValidationError(
                    f"duplicate column {col.name!r} in table {table.name!r}"
                )
            seen_cols.add(col.name.lower())
            if col.data_type not in SUPPORTED_COLUMN_TYPES:
                raise SpecValidationError(
                    f"unsupported push column type {col.data_type!r} "
                    f"for {table.name}.{col.name}"
                )

    actual = {t.name for t in spec.tables}
    missing = [t for t in required_tables if t not in actual]
    extra = [t for t in actual if t not in required_tables]
    if missing or extra:
        raise SpecValidationError(
            f"table set mismatch; missing: {missing or 'none'}, extra: {extra or 'none'}"
        )

    if len(spec.relationships) > MAX_RELATIONSHIPS:
        raise SpecValidationError(
            f"relationships ({len(spec.relationships)}) > {MAX_RELATIONSHIPS}"
        )
    by_lower = {t.name.lower(): t for t in spec.tables}
    for rel in spec.relationships:
        _validate_name("relationship", rel.name)
        if (
            rel.cross_filtering_behavior is not None
            and rel.cross_filtering_behavior not in VALID_CROSS_FILTERING
        ):
            raise SpecValidationError(
                f"invalid crossFilteringBehavior {rel.cross_filtering_behavior!r}"
            )
        for table_name, column_name, side in (
            (rel.from_table, rel.from_column, "from"),
            (rel.to_table, rel.to_column, "to"),
        ):
            table = by_lower.get(table_name.lower())
            if table is None:
                raise SpecValidationError(
                    f"relationship references missing {side}Table {table_name!r}"
                )
            if not any(c.name.lower() == column_name.lower() for c in table.columns):
                raise SpecValidationError(
                    f"relationship references missing {side}Column "
                    f"{column_name!r} on {table_name!r}"
                )
