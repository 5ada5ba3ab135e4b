"""Dataset registry — JSON state mapping (groupId, datasetName) → datasetId
(SURVEY S10 state half; reference: src/sinks/pbi/state/datasetRegistry.ts).

Semantics:
- file at ``<data_dir>/state/pbi-dataset-registry.json``; unreadable/missing
  → empty registry (:26-58); entries with a legacy ``workspaceId`` key are
  normalized to ``groupId``; malformed entries are dropped.
- lookup is case-insensitive on datasetName (:70-80).
- most-recent-per-group sort: updatedAt desc, createdAt desc, name desc
  (:82-114) — unparseable timestamps sort as epoch 0.
- upsert keys on (groupId, lower(name)); preserves createdAt, refreshes
  updatedAt, keeps the previous schema hash when not supplied (:116-152).
- save writes pretty JSON with a trailing newline (:60-68).

``now_iso`` is injectable for deterministic tests.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import asdict, dataclass
from datetime import datetime, timezone


@dataclass
class RegistryEntry:
    groupId: str
    datasetName: str
    datasetId: str
    createdAt: str
    updatedAt: str
    lastAppliedSchemaHash: str | None = None


def _default_now_iso() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"


def registry_path(data_dir: str) -> str:
    return os.path.join(data_dir, "state", "pbi-dataset-registry.json")


def load_registry(data_dir: str, now_iso: Callable[[], str] = _default_now_iso) -> list[RegistryEntry]:
    try:
        with open(registry_path(data_dir), encoding="utf-8") as f:
            parsed = json.load(f)
    except (OSError, json.JSONDecodeError):
        return []
    raw_entries = parsed.get("entries") if isinstance(parsed, dict) else None
    if not isinstance(raw_entries, list):
        return []
    entries: list[RegistryEntry] = []
    for e in raw_entries:
        if not isinstance(e, dict):
            continue
        group_id = e.get("groupId", e.get("workspaceId"))
        name, ds_id = e.get("datasetName"), e.get("datasetId")
        if not (isinstance(group_id, str) and isinstance(name, str) and isinstance(ds_id, str)):
            continue
        entries.append(
            RegistryEntry(
                groupId=group_id,
                datasetName=name,
                datasetId=ds_id,
                createdAt=e["createdAt"] if isinstance(e.get("createdAt"), str) else now_iso(),
                updatedAt=e["updatedAt"] if isinstance(e.get("updatedAt"), str) else now_iso(),
                lastAppliedSchemaHash=(
                    e["lastAppliedSchemaHash"]
                    if isinstance(e.get("lastAppliedSchemaHash"), str)
                    else None
                ),
            )
        )
    return entries


def save_registry(data_dir: str, entries: list[RegistryEntry]) -> str:
    path = registry_path(data_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"entries": [asdict(e) for e in entries]}
    with open(path, "w", encoding="utf-8") as f:
        f.write(json.dumps(payload, indent=2) + "\n")
    return path


def find_dataset_id(entries: list[RegistryEntry], group_id: str, dataset_name: str) -> str | None:
    for e in entries:
        if e.groupId == group_id and e.datasetName.lower() == dataset_name.lower():
            return e.datasetId
    return None


def _ts(value: str | None) -> float:
    if not value:
        return 0.0
    try:
        return datetime.fromisoformat(value.replace("Z", "+00:00")).timestamp()
    except ValueError:
        return 0.0


def find_most_recent_entry(entries: list[RegistryEntry], group_id: str) -> RegistryEntry | None:
    candidates = [e for e in entries if e.groupId == group_id]
    if not candidates:
        return None
    candidates.sort(key=lambda e: (_ts(e.updatedAt), _ts(e.createdAt), e.datasetName), reverse=True)
    return candidates[0]


def upsert_entry(
    entries: list[RegistryEntry],
    group_id: str,
    dataset_name: str,
    dataset_id: str,
    schema_hash: str | None = None,
    now_iso: Callable[[], str] = _default_now_iso,
) -> list[RegistryEntry]:
    now = now_iso()
    for e in entries:
        if e.groupId == group_id and e.datasetName.lower() == dataset_name.lower():
            e.datasetId = dataset_id
            e.updatedAt = now
            if schema_hash is not None:
                e.lastAppliedSchemaHash = schema_hash
            return entries
    entries.append(
        RegistryEntry(
            groupId=group_id,
            datasetName=dataset_name,
            datasetId=dataset_id,
            createdAt=now,
            updatedAt=now,
            lastAppliedSchemaHash=schema_hash,
        )
    )
    return entries
