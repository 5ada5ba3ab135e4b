"""Power BI REST client with OAuth2 token cache (SURVEY S11).

Behavior (reference: src/sinks/pbi/client/auth.ts:26-86, powerbiClient.ts:
108-158):

- client-credentials token fetch, cached and refreshed 60 s before expiry;
  missing ``expires_in`` defaults to 3600 s; fetch retried under the standard
  policy (5×, 500 ms base, 10 s cap).
- every API call: bearer auth, JSON body, retried under the same policy;
  429 honors retry-after; 5xx backs off; other 4xx raise immediately.
- transport failures (no HTTP status) surface as status-503 errors →
  retryable, matching the reference's catch-and-wrap.
- 204 / empty body → {}.

The HTTP transport is injectable: ``transport(method, url, headers, body)``
→ ``(status, headers, text)``. Tests drive a scripted fake; a production
binding would wrap ``urllib.request``. All driver-side — executors never
talk to the API.
"""

from __future__ import annotations

import json
import time
import urllib.parse
from collections.abc import Callable

from ...lib.retry import HttpError, RetryPolicy, retry_call
from .spec import DatasetSpec

Transport = Callable[[str, str, dict[str, str], bytes | None], tuple[int, dict[str, str], str]]

RETRY_POLICY = RetryPolicy(max_retries=5, base_delay_s=0.5, max_delay_s=10.0)
TOKEN_EARLY_REFRESH_S = 60.0
DEFAULT_BASE_URL = "https://api.powerbi.com/v1.0/myorg"
DEFAULT_TOKEN_SCOPE = "https://analysis.windows.net/powerbi/api/.default"


class TokenProvider:
    def __init__(
        self,
        transport: Transport,
        tenant_id: str,
        client_id: str,
        client_secret: str,
        now_s: Callable[[], float] = time.time,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._transport = transport
        self._tenant_id = tenant_id
        self._client_id = client_id
        self._client_secret = client_secret
        self._now_s = now_s
        self._sleep = sleep
        self._cached: tuple[str, float] | None = None  # (token, expires_at_s)

    def get_access_token(self) -> str:
        if self._cached and self._now_s() < self._cached[1] - TOKEN_EARLY_REFRESH_S:
            return self._cached[0]
        token, expires_at = retry_call(
            self._fetch_token, RETRY_POLICY, sleep=self._sleep, now_s=self._now_s
        )
        self._cached = (token, expires_at)
        return token

    def _fetch_token(self) -> tuple[str, float]:
        url = f"https://login.microsoftonline.com/{self._tenant_id}/oauth2/v2.0/token"
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": self._client_id,
                "client_secret": self._client_secret,
                "scope": DEFAULT_TOKEN_SCOPE,
            }
        ).encode()
        try:
            status, headers, text = self._transport(
                "POST", url, {"Content-Type": "application/x-www-form-urlencoded"}, body
            )
        except HttpError:
            raise
        except Exception as exc:  # network failure → retryable 503
            raise HttpError(503, str(exc)) from exc
        if not 200 <= status < 300:
            raise HttpError(status, "token fetch failed", headers, text)
        payload = json.loads(text)
        access_token = payload.get("access_token")
        if not access_token:
            raise RuntimeError("auth failed: token response missing access_token")
        expires_in = payload.get("expires_in")
        if not isinstance(expires_in, (int, float)):
            expires_in = 3600
        return access_token, self._now_s() + float(expires_in)


class PowerBiClient:
    def __init__(
        self,
        transport: Transport,
        token_provider: TokenProvider,
        base_url: str = DEFAULT_BASE_URL,
        sleep: Callable[[float], None] = time.sleep,
        now_s: Callable[[], float] = time.time,
    ):
        self._transport = transport
        self._tokens = token_provider
        self._base_url = base_url.rstrip("/")
        self._sleep = sleep
        self._now_s = now_s

    # -- API surface ---------------------------------------------------------

    def get_datasets_in_group(self, group_id: str) -> list[dict]:
        out = self._request("GET", f"/groups/{group_id}/datasets")
        return out.get("value", [])

    def create_dataset_in_group(self, group_id: str, spec: DatasetSpec) -> dict:
        retention = urllib.parse.quote(spec.default_retention_policy)
        body: dict = {
            "name": spec.name,
            "defaultMode": "Push",
            "tables": [
                {
                    "name": t.name,
                    "columns": [{"name": c.name, "dataType": c.data_type} for c in t.columns],
                }
                for t in spec.tables
            ],
        }
        if spec.relationships:
            body["relationships"] = [
                {
                    "name": r.name,
                    "fromTable": r.from_table,
                    "fromColumn": r.from_column,
                    "toTable": r.to_table,
                    "toColumn": r.to_column,
                    **(
                        {"crossFilteringBehavior": r.cross_filtering_behavior}
                        if r.cross_filtering_behavior
                        else {}
                    ),
                }
                for r in spec.relationships
            ]
        return self._request(
            "POST", f"/groups/{group_id}/datasets?defaultRetentionPolicy={retention}", body
        )

    def get_tables_in_group(self, group_id: str, dataset_id: str) -> list[dict]:
        out = self._request("GET", f"/groups/{group_id}/datasets/{dataset_id}/tables")
        return out.get("value", [])

    def put_table(self, dataset_id: str, table_name: str, columns: list[dict]) -> None:
        self._request(
            "PUT",
            f"/datasets/{dataset_id}/tables/{urllib.parse.quote(table_name)}",
            {"name": table_name, "columns": columns},
        )

    def delete_rows_in_group(self, group_id: str, dataset_id: str, table_name: str) -> None:
        self._request(
            "DELETE",
            f"/groups/{group_id}/datasets/{dataset_id}/tables/"
            f"{urllib.parse.quote(table_name)}/rows",
        )

    def post_rows_in_group(
        self, group_id: str, dataset_id: str, table_name: str, rows: list[dict]
    ) -> None:
        self._request(
            "POST",
            f"/groups/{group_id}/datasets/{dataset_id}/tables/"
            f"{urllib.parse.quote(table_name)}/rows",
            {"rows": rows},
        )

    # -- plumbing ------------------------------------------------------------

    def _request(self, method: str, route: str, body: dict | None = None) -> dict:
        return retry_call(
            lambda: self._execute(method, route, body),
            RETRY_POLICY,
            sleep=self._sleep,
            now_s=self._now_s,
        )

    def _execute(self, method: str, route: str, body: dict | None) -> dict:
        token = self._tokens.get_access_token()
        headers = {"Authorization": f"Bearer {token}", "Content-Type": "application/json"}
        payload = None if body is None else json.dumps(body).encode()
        try:
            status, resp_headers, text = self._transport(
                method, f"{self._base_url}{route}", headers, payload
            )
        except HttpError:
            raise
        except Exception as exc:  # network failure → retryable 503
            raise HttpError(503, str(exc)) from exc
        if not 200 <= status < 300:
            raise HttpError(
                status, f"Power BI API error for {method} {route}", resp_headers, text
            )
        if status == 204 or not text.strip():
            return {}
        return json.loads(text)
