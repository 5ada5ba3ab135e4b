"""Dataset provisioning (SURVEY S10).

- ``schema_diff``: desired spec vs live tables → tables missing live
  (case-insensitive), upsert-only (reference:
  src/sinks/pbi/provision/schemaDiff.ts:9-26).
- ``apply_schema``: PUT each missing table's column list (applySchema.ts:14-41).
- ``ensure_dataset``: idempotent create-or-reuse — registry hit → done; else
  live lookup by name (case-insensitive) → adopt + record; else create +
  record (ensureDataset.ts:17-55).
"""

from __future__ import annotations

from dataclasses import dataclass

from . import registry as reg
from .client import PowerBiClient
from .spec import DatasetSpec


@dataclass(frozen=True)
class SchemaDiff:
    has_changes: bool
    tables_to_upsert: tuple[str, ...]


def schema_diff(desired: DatasetSpec, existing_tables: list[dict]) -> SchemaDiff:
    existing = {str(t.get("name", "")).lower() for t in existing_tables}
    to_upsert = tuple(t.name for t in desired.tables if t.name.lower() not in existing)
    return SchemaDiff(has_changes=bool(to_upsert), tables_to_upsert=to_upsert)


def apply_schema(client: PowerBiClient, dataset_id: str, desired: DatasetSpec, diff: SchemaDiff) -> int:
    by_name = {t.name: t for t in desired.tables}
    for name in diff.tables_to_upsert:
        table = by_name[name]
        client.put_table(
            dataset_id,
            name,
            [{"name": c.name, "dataType": c.data_type} for c in table.columns],
        )
    return len(diff.tables_to_upsert)


def ensure_dataset(
    client: PowerBiClient,
    data_dir: str,
    group_id: str,
    dataset_name: str,
    spec: DatasetSpec,
) -> str:
    entries = reg.load_registry(data_dir)
    known = reg.find_dataset_id(entries, group_id, dataset_name)
    if known:
        return known

    for ds in client.get_datasets_in_group(group_id):
        if str(ds.get("name", "")).lower() == dataset_name.lower():
            dataset_id = str(ds["id"])
            reg.save_registry(
                data_dir, reg.upsert_entry(entries, group_id, dataset_name, dataset_id)
            )
            return dataset_id

    created = client.create_dataset_in_group(group_id, spec)
    dataset_id = str(created["id"])
    reg.save_registry(data_dir, reg.upsert_entry(entries, group_id, dataset_name, dataset_id))
    return dataset_id
