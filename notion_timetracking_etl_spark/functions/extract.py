"""Notion payload extraction (SURVEY §2.8 F1–F12).

Each function takes a ``rawValue`` Column typed as ``schemas.RAW_VALUE_SCHEMA``
and returns the extracted value or null, mirroring the reference's defensive
"wrong shape → null" semantics. All are built-in higher-order-function
expressions (``filter`` / ``transform`` / ``element_at``) — JVM-side, no UDFs.

Spark's JSON parser nulls absent/mismatched fields, so the reference's
``typeof`` guards reduce to null checks here.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

from .strings import normalize_nullable_string


def _first(arr: Column) -> Column:
    # try_element_at: null (not ANSI error) on empty/short arrays
    return F.try_element_at(arr, F.lit(1))


def extract_date_start(raw: Column) -> Column:
    """F1 (reference: canon/timeslice.ts:36-72): native date start; rollup-date
    start; or start of the first rollup-array element with type=='date'."""
    first_date_item = _first(
        F.filter(raw["rollup"]["array"], lambda x: x["type"] == F.lit("date"))
    )
    return (
        F.when(raw["type"] == "date", raw["date"]["start"])
        .when(
            (raw["type"] == "rollup") & (raw["rollup"]["type"] == "date"),
            raw["rollup"]["date"]["start"],
        )
        .when(
            (raw["type"] == "rollup") & (raw["rollup"]["type"] == "array"),
            first_date_item["date"]["start"],
        )
        .otherwise(F.lit(None).cast("string"))
    )


def extract_first_relation_id(raw: Column) -> Column:
    """F2 (reference: canon/timeslice.ts:74-84): relation[0].id if non-empty."""
    first_id = _first(raw["relation"])["id"]
    return F.when(
        (raw["type"] == "relation") & (F.length(first_id) > 0), first_id
    ).otherwise(F.lit(None).cast("string"))


def extract_first_rollup_relation_id(raw: Column) -> Column:
    """F3 (reference: canon/timeslice.ts:86-113): id of the first rollup-array
    element having a non-empty relation array (with a non-empty first id)."""
    candidates = F.filter(
        raw["rollup"]["array"],
        lambda x: (x["type"] == F.lit("relation"))
        & (F.size(x["relation"]) > 0)
        & (F.length(F.try_element_at(x["relation"], F.lit(1))["id"]) > 0),
    )
    value = _first(_first(candidates)["relation"])["id"]
    return F.when(
        (raw["type"] == "rollup") & (raw["rollup"]["type"] == "array"), value
    ).otherwise(F.lit(None).cast("string"))


def extract_first_rollup_date_start(raw: Column) -> Column:
    """F4 (reference: canon/timeslice.ts:115-142): start of the first
    rollup-array date element with a non-empty start."""
    candidates = F.filter(
        raw["rollup"]["array"],
        lambda x: (x["type"] == F.lit("date")) & (F.length(x["date"]["start"]) > 0),
    )
    return F.when(
        (raw["type"] == "rollup") & (raw["rollup"]["type"] == "array"),
        _first(candidates)["date"]["start"],
    ).otherwise(F.lit(None).cast("string"))


def _joined_plain_text(parts: Column) -> Column:
    return F.concat_ws(
        "", F.transform(parts, lambda p: F.coalesce(p["plain_text"], F.lit("")))
    )


def extract_first_rollup_rich_text(raw: Column) -> Column:
    """F5 (reference: canon/timeslice.ts:144-175): first rollup-array rich_text
    element whose concatenated plain_text, trimmed, is non-empty."""
    texts = F.transform(
        F.filter(raw["rollup"]["array"], lambda x: x["type"] == F.lit("rich_text")),
        lambda x: F.trim(_joined_plain_text(x["rich_text"])),
    )
    non_empty = F.filter(texts, lambda t: F.length(t) > 0)
    return F.when(
        (raw["type"] == "rollup") & (raw["rollup"]["type"] == "array"),
        _first(non_empty),
    ).otherwise(F.lit(None).cast("string"))


def extract_title(raw: Column) -> Column:
    """F6 (reference: canon/timeslice.ts:177-189): join of title plain_texts;
    trimmed; '' → null."""
    return F.when(
        (raw["type"] == "title") & raw["title"].isNotNull(),
        normalize_nullable_string(_joined_plain_text(raw["title"])),
    ).otherwise(F.lit(None).cast("string"))


def extract_formula_string(raw: Column) -> Column:
    """F7 (reference: canon/timeslice.ts:191-203)."""
    return F.when(
        (raw["type"] == "formula") & (raw["formula"]["type"] == "string"),
        normalize_nullable_string(raw["formula"]["string"]),
    ).otherwise(F.lit(None).cast("string"))


def first_display_text(raw: Column) -> Column:
    """F8 (reference: canon/workflowStage.ts:34-66): polymorphic title /
    rich_text / select / status → display string."""
    return (
        F.when(
            (raw["type"] == "title") & raw["title"].isNotNull(),
            normalize_nullable_string(_joined_plain_text(raw["title"])),
        )
        .when(
            (raw["type"] == "rich_text") & raw["rich_text"].isNotNull(),
            normalize_nullable_string(_joined_plain_text(raw["rich_text"])),
        )
        .when(raw["type"] == "select", normalize_nullable_string(raw["select"]["name"]))
        .when(raw["type"] == "status", normalize_nullable_string(raw["status"]["name"]))
        .otherwise(F.lit(None).cast("string"))
    )


def extract_number(raw: Column) -> Column:
    """F9 (reference: canon/workflowStage.ts:68-77 + rules.ts:23-32): finite
    number, or numeric-string parse, else null."""
    return F.when(
        raw["type"] == "number", F.trim(raw["number"]).try_cast("double")
    ).otherwise(F.lit(None).cast("double"))


def title_fallback_scan(properties: Column) -> Column:
    """F10 (reference: canon/timeslice.ts:259-266, workflowDefinition.ts:19-36):
    first non-empty title across ALL properties of the record (map order)."""
    titles = F.transform(
        F.map_values(properties), lambda p: extract_title(p["rawValue"])
    )
    return _first(F.filter(titles, lambda t: t.isNotNull()))


_UUID_RE = r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"


def harvest_relation_uuids(col: Column) -> Column:
    """F12 (reference: scripts/diagnose-stage-relations.ts:228-264): walk an
    arbitrarily nested value and collect every hyphenated UUID, lowercased,
    de-duplicated in first-seen order (the reference's Set semantics).

    The reference recurses over JS objects; here the value is rendered to
    JSON once and scanned with one regexp — same result set, single pass,
    fully JVM-side."""
    return F.array_distinct(
        F.regexp_extract_all(F.lower(F.to_json(col)), F.lit(_UUID_RE), 0)
    )


def attributes_json(properties: Column) -> Column:
    """Build the canonical ``attributes`` map: property id → rawValue as JSON
    (reference: canon/timeslice.ts:237-239 rawProperties passthrough)."""
    return F.map_from_entries(
        F.transform(
            F.map_entries(properties),
            lambda e: F.struct(
                e["key"].alias("key"), F.to_json(e["value"]["rawValue"]).alias("value")
            ),
        )
    )
