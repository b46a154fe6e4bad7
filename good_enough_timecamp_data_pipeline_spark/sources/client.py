"""TimeCamp REST client (SURVEY §2.1 S1–S7).

Same observable semantics as the reference client (``/root/reference/
common/api.py``), re-implemented around an injectable ``transport`` so unit
tests and the demo pipeline run fully offline (the reference's tests mock
``requests`` the same way — ``tests/test_api.py:26-87``).

Semantics re-expressed (file:line cites are to /root/reference/):

- retry/backoff: 5 attempts; retry on 429/500/502/503/504; honor a
  ``Retry-After`` header or JSON ``retry_after`` body, else linear
  5s·attempt backoff; non-retryable statuses raise immediately
  (common/api.py:20-64).
- users + enabled flag: ``disabled_user`` setting fetched in 50-id batches;
  enabled := setting != '1', default True (common/api.py:66-79,141-145,193-224).
- tasks: GET /tasks?status=all; dict-of-dicts normalized to a list
  (common/api.py:118-133).
- entries: GET /entries with from/to, optional comma-joined user_ids,
  include_project/include_rates/opt_fields passthrough (common/api.py:81-116).
- computer activities: fan out per user and per ≤20-date chunk; a failing
  batch logs and contributes nothing instead of failing the run
  (common/api.py:226-324).
- applications: 100-id chunks against GET /application; dict results merged
  (common/api.py:326-360).
- groups / group users / roles / people_picker passthroughs
  (common/api.py:135-191).

This layer is deliberately *not* a Spark operator: fetching is driver-side
(or inside ``mapInPandas`` for parallel fetch — see ingest.fetch_parallel);
everything downstream of the raw rows is relational.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from typing import Any

RETRYABLE_STATUSES = {429, 500, 502, 503, 504}
MAX_RETRIES = 5
RETRY_DELAY_S = 5

# transport: (method, url, params) -> (status_code, headers, body_text)
Transport = Callable[[str, str, dict[str, Any]], tuple[int, dict[str, str], str]]


class TimeCampAPIError(RuntimeError):
    def __init__(self, status: int, url: str, body: str):
        super().__init__(f"HTTP {status} for {url}: {body[:200]}")
        self.status = status


def requests_transport(token: str, timeout_s: int = 30) -> Transport:
    """Real-HTTP transport (gated import so offline envs never need it)."""
    import requests  # deferred: tests and the demo never import this

    session = requests.Session()
    session.headers.update(
        {"Authorization": f"Bearer {token}", "Accept": "application/json"}
    )

    def _send(method: str, url: str, params: dict[str, Any]):
        resp = session.request(method, url, params=params, timeout=timeout_s)
        return resp.status_code, dict(resp.headers), resp.text

    return _send


@dataclass
class TimeCampClient:
    transport: Transport
    base_url: str = "https://app.timecamp.com/third_party/api"
    sleeper: Callable[[float], None] = time.sleep
    calls: list[tuple[str, str, dict[str, Any]]] = field(default_factory=list)

    # -- core request with retry/backoff (S7) -------------------------------
    def _request(self, method: str, endpoint: str, params: dict[str, Any] | None = None) -> Any:
        url = f"{self.base_url}/{endpoint.lstrip('/')}"
        params = params or {}
        last: tuple[int, str] = (0, "")
        for attempt in range(1, MAX_RETRIES + 1):
            self.calls.append((method, endpoint, dict(params)))
            status, headers, body = self.transport(method, url, params)
            if status < 400:
                return json.loads(body) if body.strip() else None
            last = (status, body)
            if status not in RETRYABLE_STATUSES:
                raise TimeCampAPIError(status, url, body)
            if attempt == MAX_RETRIES:
                break
            self.sleeper(self._retry_delay(attempt, headers, body))
        raise TimeCampAPIError(last[0], url, last[1])

    @staticmethod
    def _retry_delay(attempt: int, headers: dict[str, str], body: str) -> float:
        retry_after = headers.get("Retry-After") or headers.get("retry-after")
        if retry_after is not None:
            try:
                return float(retry_after)
            except ValueError:
                pass
        try:
            parsed = json.loads(body)
            if isinstance(parsed, dict) and "retry_after" in parsed:
                return float(parsed["retry_after"])
        except (ValueError, TypeError):
            pass
        return float(RETRY_DELAY_S * attempt)

    # -- S1: time entries ---------------------------------------------------
    def get_time_entries(
        self,
        from_date: str,
        to_date: str,
        user_ids: list[int] | None = None,
        include_project: bool = True,
        include_rates: bool = True,
        opt_fields: str | None = None,
    ) -> list[dict[str, Any]]:
        params: dict[str, Any] = {"from": from_date, "to": to_date, "format": "json"}
        if include_project:
            params["include_project"] = "1"
        if include_rates:
            params["include_rates"] = "1"
        if user_ids:
            params["user_ids"] = ",".join(str(u) for u in user_ids)
        if opt_fields:
            params["opt_fields"] = opt_fields
        return self._request("GET", "entries", params) or []

    # -- S2: tasks ----------------------------------------------------------
    def get_tasks(self) -> list[dict[str, Any]]:
        raw = self._request("GET", "tasks", {"format": "json", "status": "all"})
        if isinstance(raw, dict):  # API returns {task_id: {...}}
            return list(raw.values())
        return raw or []

    # -- S3: users + enabled flag ------------------------------------------
    def get_users(self) -> list[dict[str, Any]]:
        users = self._request("GET", "users", {"format": "json"}) or []
        ids = [int(u["user_id"]) for u in users if "user_id" in u]
        enabled = self.are_users_enabled(ids)
        for u in users:
            u["is_enabled"] = enabled.get(int(u.get("user_id", -1)), True)
        return users

    def get_user_settings(
        self, user_ids: list[int], setting_name: str, batch_size: int = 50
    ) -> dict[int, str | None]:
        out: dict[int, str | None] = {}
        for i in range(0, len(user_ids), batch_size):
            batch = user_ids[i : i + batch_size]
            resp = (
                self._request(
                    "GET",
                    "user_settings",
                    {
                        "user_ids": ",".join(str(u) for u in batch),
                        "name": setting_name,
                        "format": "json",
                    },
                )
                or []
            )
            got = {
                int(r["user_id"]): r.get("value")
                for r in resp
                if isinstance(r, dict) and "user_id" in r
            }
            for uid in batch:
                out[uid] = got.get(uid)
        return out

    def are_users_enabled(self, user_ids: list[int]) -> dict[int, bool]:
        settings = self.get_user_settings(user_ids, "disabled_user")
        return {uid: value != "1" for uid, value in settings.items()}

    # -- S6: groups / roles / people picker ---------------------------------
    def get_groups(self) -> list[dict[str, Any]]:
        return self._request("GET", "group", {"format": "json"}) or []

    def get_group_users(self, group_id: int) -> list[dict[str, Any]]:
        return self._request("GET", f"group/{group_id}/user", {"format": "json"}) or []

    def get_user_roles(self) -> dict[str, Any]:
        return self._request("GET", "users_roles", {"format": "json"}) or {}

    def get_user_details(self) -> dict[str, Any]:
        return self._request("GET", "people_picker", {"format": "json"}) or {}

    # -- S4: computer activities -------------------------------------------
    def get_computer_activities(
        self,
        dates: list[str],
        include: str | None = None,
        user_ids: list[int] | None = None,
        dates_per_request: int = 20,
    ) -> list[dict[str, Any]]:
        """Per-user × ≤20-date-chunk fan-out; failed batches yield nothing."""
        out: list[dict[str, Any]] = []
        users: list[list[int] | None] = (
            [[u] for u in user_ids] if user_ids else [None]
        )
        for user_batch in users:
            for i in range(0, len(dates), dates_per_request):
                chunk = dates[i : i + dates_per_request]
                try:
                    out.extend(
                        self._activities_single(chunk, include, user_batch) or []
                    )
                except TimeCampAPIError:
                    continue  # tolerate per-batch failure (common/api.py:281-298)
        return out

    def _activities_single(
        self,
        dates: list[str],
        include: str | None,
        user_ids: list[int] | None,
    ) -> list[dict[str, Any]]:
        params: dict[str, Any] = {"format": "json"}
        for i, d in enumerate(dates):
            params[f"dates[{i}]"] = d
        if include:
            params["include"] = include
        if user_ids:
            params["user_id"] = ",".join(str(u) for u in user_ids)
        return self._request("GET", "computer_activities", params) or []

    # -- S5: application details -------------------------------------------
    def get_applications(
        self,
        application_ids: Iterable[str],
        date: str | None = None,
        batch_size: int = 100,
    ) -> dict[str, dict[str, Any]]:
        ids = [str(a) for a in application_ids]
        merged: dict[str, dict[str, Any]] = {}
        for i in range(0, len(ids), batch_size):
            batch = ids[i : i + batch_size]
            params: dict[str, Any] = {
                "application_ids": ",".join(batch),
                "format": "json",
            }
            if date:
                params["date"] = date
            resp = self._request("GET", "application", params) or {}
            if isinstance(resp, dict):
                merged.update(resp)
        return merged
