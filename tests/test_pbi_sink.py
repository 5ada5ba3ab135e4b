"""Power BI sink stack: spec validation, registry, client, provision,
wipe-and-reload order/batching (SURVEY S8, S10, S11, V5, V6)."""

from __future__ import annotations

import json

import pytest

from notion_timetracking_etl_spark.lib.retry import HttpError
from notion_timetracking_etl_spark.sinks.pbi import registry as reg
from notion_timetracking_etl_spark.sinks.pbi.client import PowerBiClient, TokenProvider
from notion_timetracking_etl_spark.sinks.pbi.governor import RefreshGovernor, RefreshLimits
from notion_timetracking_etl_spark.sinks.pbi.provision import (
    apply_schema,
    ensure_dataset,
    schema_diff,
)
from notion_timetracking_etl_spark.sinks.pbi.refresh import execute_wipe_and_reload
from notion_timetracking_etl_spark.sinks.pbi.spec import (
    ColumnSpec,
    DatasetSpec,
    REQUIRED_TABLE_NAMES,
    SpecValidationError,
    TableSpec,
    validate_spec,
)


def _spec(names=REQUIRED_TABLE_NAMES) -> DatasetSpec:
    return DatasetSpec(
        name="tt",
        tables=tuple(
            TableSpec(n, (ColumnSpec("k", "String"), ColumnSpec("v", "Double")))
            for n in names
        ),
    )


# -- spec validation (V6) -----------------------------------------------------


def test_validate_spec_accepts_required_set():
    validate_spec(_spec())


def test_validate_spec_rejects_bad_type_and_table_set():
    bad = DatasetSpec(
        name="tt",
        tables=(TableSpec("FactTimeslices", (ColumnSpec("k", "Decimal"),)),),
    )
    with pytest.raises(SpecValidationError, match="unsupported push column type"):
        validate_spec(bad, required_tables=("FactTimeslices",))
    with pytest.raises(SpecValidationError, match="table set mismatch"):
        validate_spec(_spec(("FactTimeslices",)))


def test_validate_spec_rejects_control_char_and_dup_names():
    with pytest.raises(SpecValidationError, match="control characters"):
        validate_spec(
            DatasetSpec(name="x", tables=(TableSpec("bad\x01name", ()),)),
            required_tables=(),
        )
    with pytest.raises(SpecValidationError, match="duplicate table name"):
        validate_spec(
            DatasetSpec(name="x", tables=(TableSpec("T", ()), TableSpec("t", ()))),
            required_tables=(),
        )


def test_validate_spec_rejects_missing_relationship_endpoint():
    from notion_timetracking_etl_spark.sinks.pbi.spec import RelationshipSpec

    spec = DatasetSpec(
        name="x",
        tables=(TableSpec("A", (ColumnSpec("id", "String"),)),),
        relationships=(RelationshipSpec("r", "A", "id", "B", "id"),),
    )
    with pytest.raises(SpecValidationError, match="missing toTable"):
        validate_spec(spec, required_tables=("A",))


# -- registry (S10 state) -----------------------------------------------------


def test_registry_roundtrip_lookup_and_recency(tmp_path):
    d = str(tmp_path)
    entries = reg.upsert_entry([], "g1", "Sales", "ds-1", now_iso=lambda: "2026-01-01T00:00:00Z")
    entries = reg.upsert_entry(
        entries, "g1", "Ops", "ds-2", now_iso=lambda: "2026-02-01T00:00:00Z"
    )
    reg.save_registry(d, entries)

    loaded = reg.load_registry(d)
    assert reg.find_dataset_id(loaded, "g1", "sales") == "ds-1"  # case-insensitive
    assert reg.find_dataset_id(loaded, "g2", "Sales") is None
    assert reg.find_most_recent_entry(loaded, "g1").datasetId == "ds-2"

    # upsert same name (different case) updates in place, keeps createdAt
    entries = reg.upsert_entry(
        loaded, "g1", "SALES", "ds-9", now_iso=lambda: "2026-03-01T00:00:00Z"
    )
    e = next(x for x in entries if x.datasetId == "ds-9")
    assert e.createdAt == "2026-01-01T00:00:00Z" and e.updatedAt == "2026-03-01T00:00:00Z"
    assert reg.find_most_recent_entry(entries, "g1").datasetId == "ds-9"


def test_registry_tolerates_missing_file_and_legacy_keys(tmp_path):
    d = str(tmp_path)
    assert reg.load_registry(d) == []
    path = reg.registry_path(d)
    import os

    os.makedirs(os.path.dirname(path))
    with open(path, "w") as f:
        json.dump(
            {
                "entries": [
                    {"workspaceId": "g1", "datasetName": "n", "datasetId": "d1"},
                    {"datasetName": "broken"},
                    "not-a-dict",
                ]
            },
            f,
        )
    loaded = reg.load_registry(d, now_iso=lambda: "2026-01-01T00:00:00Z")
    assert len(loaded) == 1 and loaded[0].groupId == "g1"


# -- client (S11) -------------------------------------------------------------


class ScriptedTransport:
    """Scripted (status, headers, text) responses; records every request."""

    def __init__(self, script):
        self.script = list(script)
        self.requests = []

    def __call__(self, method, url, headers, body):
        self.requests.append((method, url, headers, body))
        return self.script.pop(0)


def _token_ok(expires_in=3600):
    return (200, {}, json.dumps({"access_token": "tok", "expires_in": expires_in}))


def _client(script, clock=None):
    transport = ScriptedTransport(script)
    now = clock.now if clock else (lambda: 0.0)
    sleep = clock.sleep if clock else (lambda _s: None)
    tokens = TokenProvider(transport, "tn", "cid", "sec", now_s=now, sleep=sleep)
    return PowerBiClient(transport, tokens, now_s=now, sleep=sleep), transport


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def now(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_token_cached_until_early_refresh_window():
    clock = FakeClock()
    client, transport = _client(
        [_token_ok(100), (200, {}, '{"value": []}'), (200, {}, '{"value": []}'),
         _token_ok(100), (200, {}, '{"value": []}')],
        clock,
    )
    client.get_datasets_in_group("g")
    client.get_datasets_in_group("g")  # token still fresh → no token request
    clock.t += 50  # inside 60 s early-refresh window of the 100 s token
    client.get_datasets_in_group("g")  # refetches token
    token_posts = [r for r in transport.requests if "login.microsoftonline" in r[1]]
    assert len(token_posts) == 2


def test_client_retries_429_with_retry_after_then_succeeds():
    clock = FakeClock()
    client, transport = _client(
        [_token_ok(), (429, {"retry-after": "3"}, ""), (200, {}, '{"value": [{"id": "d"}]}')],
        clock,
    )
    out = client.get_datasets_in_group("g")
    assert out == [{"id": "d"}]
    assert clock.t == pytest.approx(3.0)


def test_client_does_not_retry_404():
    client, transport = _client([_token_ok(), (404, {}, "missing")])
    with pytest.raises(HttpError) as exc:
        client.get_datasets_in_group("g")
    assert exc.value.status == 404
    assert len(transport.requests) == 2  # token + one attempt


def test_transport_exception_becomes_retryable_503():
    calls = {"n": 0}

    def flaky(method, url, headers, body):
        calls["n"] += 1
        if "login" in url:
            return _token_ok()
        if calls["n"] == 2:
            raise ConnectionError("reset")
        return (200, {}, "{}")

    tokens = TokenProvider(flaky, "t", "c", "s", now_s=lambda: 0.0, sleep=lambda _s: None)
    client = PowerBiClient(flaky, tokens, now_s=lambda: 0.0, sleep=lambda _s: None)
    client.delete_rows_in_group("g", "d", "T")  # retried through the 503
    assert calls["n"] == 3


# -- provision (S10) ----------------------------------------------------------


def test_schema_diff_is_upsert_only_case_insensitive():
    diff = schema_diff(_spec(("A", "B")), existing_tables=[{"name": "a"}])
    assert diff.tables_to_upsert == ("B",) and diff.has_changes
    assert not schema_diff(_spec(("A",)), [{"name": "A"}]).has_changes


def test_apply_schema_puts_missing_tables():
    client, transport = _client([_token_ok(), (200, {}, "{}")])
    spec = _spec(("A", "B"))
    n = apply_schema(client, "ds", spec, schema_diff(spec, [{"name": "A"}]))
    assert n == 1
    put = [r for r in transport.requests if r[0] == "PUT"]
    assert len(put) == 1 and "/tables/B" in put[0][1]


def test_ensure_dataset_registry_then_live_then_create(tmp_path):
    d = str(tmp_path)
    # 1. registry hit — no API calls at all
    reg.save_registry(d, reg.upsert_entry([], "g", "N", "known-id"))
    client, transport = _client([])
    assert ensure_dataset(client, d, "g", "n", _spec(("A",))) == "known-id"
    assert transport.requests == []

    # 2. live lookup adopts an existing dataset by case-insensitive name
    d2 = str(tmp_path / "d2")
    client, transport = _client(
        [_token_ok(), (200, {}, json.dumps({"value": [{"id": "live-id", "name": "n"}]}))]
    )
    assert ensure_dataset(client, d2, "g", "N", _spec(("A",))) == "live-id"
    assert reg.find_dataset_id(reg.load_registry(d2), "g", "N") == "live-id"

    # 3. create when neither registry nor live has it
    d3 = str(tmp_path / "d3")
    client, transport = _client(
        [_token_ok(), (200, {}, '{"value": []}'), (200, {}, '{"id": "new-id"}')]
    )
    assert ensure_dataset(client, d3, "g", "N", _spec(("A",))) == "new-id"
    create = [r for r in transport.requests if r[0] == "POST" and "datasets?" in r[1]]
    assert len(create) == 1
    body = json.loads(create[0][3])
    assert body["defaultMode"] == "Push" and body["tables"][0]["name"] == "A"


# -- wipe and reload (S8 + V5) ------------------------------------------------


def test_wipe_and_reload_order_batching_and_governor(spark):
    spec = _spec(("A", "B"))
    df_a = spark.range(3).selectExpr("cast(id as string) as k", "cast(id as double) as v")
    rows_b = [{"k": str(i), "v": float(i)} for i in range(5)]

    script = [_token_ok()] + [(200, {}, "{}")] * 10
    client, transport = _client(script)
    gov = RefreshGovernor(
        RefreshLimits(), now_s=lambda: 0.0, sleep=lambda _s: None
    )
    result = execute_wipe_and_reload(
        client, "g", "ds", spec, {"A": df_a, "B": rows_b}, governor=gov
    )
    assert (result.tables_processed, result.total_rows_posted, result.total_post_requests) == (2, 8, 2)

    api = [(m, u) for m, u, _h, _b in transport.requests if "login" not in u]
    # spec order: wipe A, post A, wipe B, post B
    assert [m for m, _u in api] == ["DELETE", "POST", "DELETE", "POST"]
    assert "/tables/A/rows" in api[0][1] and "/tables/B/rows" in api[2][1]
    posted = json.loads(transport.requests[2][3])
    assert posted["rows"][0]["k"] == "0"


def test_wipe_and_reload_rejects_table_set_mismatch(spark):
    with pytest.raises(ValueError, match="mismatch"):
        execute_wipe_and_reload(
            None, "g", "ds", _spec(("A", "B")), {"A": []},
        )
