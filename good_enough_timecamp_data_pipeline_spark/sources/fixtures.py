"""Offline transports for the TimeCamp client.

`DictTransport` serves canned per-endpoint responses (unit tests build these
by hand, exactly like the reference's mocked-``requests`` tests —
``/root/reference/tests/test_api.py:26-87``).

`demo_transport()` returns a deterministic synthetic workspace: a 3-level
task tree, two user groups, entries across 13 months, activities, and an
application catalog — enough surface to exercise every ingest builder
end-to-end with zero network.
"""

from __future__ import annotations

import json
import re
from typing import Any

from .client import Transport


class DictTransport:
    """Transport returning queued or static responses per endpoint.

    ``responses`` maps an endpoint regex to either a single response or a
    list popped per call; a response is ``(status, headers, json-able)``
    or just the json-able payload (→ 200, no headers).
    """

    def __init__(self, responses: dict[str, Any]):
        self._routes = [(re.compile(pat), resp) for pat, resp in responses.items()]
        self.requests: list[tuple[str, str, dict[str, Any]]] = []

    def __call__(self, method: str, url: str, params: dict[str, Any]):
        self.requests.append((method, url, dict(params)))
        for pat, resp in self._routes:
            if pat.search(url):
                if isinstance(resp, list) and resp and isinstance(resp[0], tuple):
                    item = resp.pop(0) if len(resp) > 1 else resp[0]
                else:
                    item = resp
                if isinstance(item, tuple):
                    status, headers, payload = item
                else:
                    status, headers, payload = 200, {}, item
                body = payload if isinstance(payload, str) else json.dumps(payload)
                return status, headers, body
        return 404, {}, json.dumps({"error": f"no fixture route for {url}"})


def demo_workspace() -> dict[str, Any]:
    """Deterministic synthetic TimeCamp workspace payloads (API shapes)."""
    tasks = {
        "1": {"task_id": 1, "parent_id": 0, "name": "Acme", "budgeted": 0,
              "public_hash": "ph1", "task_key": "ACME", "users": {"101": {}}, "perms": {}},
        "2": {"task_id": 2, "parent_id": 1, "name": "Platform", "budgeted": 7200,
              "public_hash": "ph2", "task_key": "PLAT", "users": {}, "perms": {}},
        "3": {"task_id": 3, "parent_id": 2, "name": "Ingest", "budgeted": 3600,
              "public_hash": "ph3", "task_key": "ING", "users": {}, "perms": {}},
        "4": {"task_id": 4, "parent_id": 2, "name": "Query", "budgeted": 0,
              "public_hash": "ph4", "task_key": "QRY", "users": {}, "perms": {}},
        "5": {"task_id": 5, "parent_id": "", "name": "Internal", "budgeted": 0,
              "public_hash": "ph5", "task_key": "INT", "users": {}, "perms": {}},
        # orphan parent: breadcrumb walk must stop gracefully
        "6": {"task_id": 6, "parent_id": 999, "name": "Orphan", "budgeted": 60,
              "public_hash": "ph6", "task_key": "ORPH", "users": {}, "perms": {}},
    }
    users = [
        {"user_id": "101", "email": "ada@example.com", "display_name": "Ada"},
        {"user_id": "102", "email": "lin@example.com", "display_name": "Lin"},
        {"user_id": "103", "email": "sam@example.com", "display_name": "Sam"},
    ]
    # group tree: 10 (root) → g20 (API sometimes prefixes ids with 'g')
    people_picker = {
        "groups": [
            {"group_id": "10", "name": "Everyone", "parent_id": "0",
             "users": {"u101": {"user_id": "u101"}, "u103": {"user_id": "u103"}}},
            {"group_id": "g20", "name": "Engineering", "parent_id": "10",
             "users": {"u101": {"user_id": "u101"}, "u102": {"user_id": "u102"}}},
        ]
    }
    entries = [
        {"id": 9001, "task_id": 3, "user_id": 101, "date": "2025-01-10",
         "duration": "3600", "description": "pipeline", "tags": [{"tagId": "7"}]},
        {"id": 9002, "task_id": 3, "user_id": 102, "date": "2025-02-11",
         "duration": "1800", "description": "", "tags": []},
        {"id": 9003, "task_id": 4, "user_id": 101, "date": "2025-07-03",
         "duration": "5400", "description": "queries", "tags": None},
        {"id": 9004, "task_id": 2, "user_id": 103, "date": "2026-01-20",
         "duration": "600", "description": "review", "tags": []},
        # duplicate id: dedup-by-pk must keep one
        {"id": 9004, "task_id": 2, "user_id": 103, "date": "2026-01-20",
         "duration": "600", "description": "review", "tags": []},
    ]
    activities = [
        {"user_id": "101", "application_id": "501", "window_title": "editor — repo",
         "start_time": "2026-01-05 09:00:00", "end_time": "2026-01-05 09:30:00",
         "end_date": "2026-01-05", "duration": 1800},
        {"user_id": "101", "application_id": "502", "window_title": "browser — docs",
         "start_time": "2026-01-05 09:30:00", "end_time": "2026-01-05 09:40:00",
         "end_date": "2026-01-05", "duration": 600},
        {"user_id": "102", "application_id": "0", "window_title": "",
         "start_time": "2026-01-06 10:00:00", "end_time": "2026-01-06 10:05:00",
         "end_date": "2026-01-06", "duration": 300},
        {"user_id": "102", "application_id": "501", "window_title": "editor — notes",
         "start_time": "2026-01-06 11:00:00", "end_time": "2026-01-06 11:20:00",
         "end_date": "2026-01-06", "duration": 1200},
    ]
    applications = {
        "501": {"application_id": "501", "app_name": "editor.bin", "full_name": "Super Editor",
                "aditional_info": "", "category_id": "2", "type": "desktop",
                "icon_url": "https://img.example/editor.png"},
        "502": {"application_id": "502", "app_name": "browser.bin", "full_name": "",
                "aditional_info": "Web Browser", "category_id": "13", "type": "desktop",
                "icon_url": ""},
    }
    return {
        "tasks": tasks,
        "users": users,
        "people_picker": people_picker,
        "entries": entries,
        "activities": activities,
        "applications": applications,
    }


def demo_transport() -> Transport:
    ws = demo_workspace()
    # only user 102 is disabled
    def settings_for(params: dict[str, Any]) -> list[dict[str, Any]]:
        ids = str(params.get("user_ids", "")).split(",")
        return [
            {"user_id": uid, "value": "1" if uid == "102" else "0"}
            for uid in ids
            if uid
        ]

    base = DictTransport(
        {
            r"/tasks$": ws["tasks"],
            r"/users$": ws["users"],
            r"/people_picker$": ws["people_picker"],
            r"/application$": ws["applications"],
        }
    )

    def _send(method: str, url: str, params: dict[str, Any]):
        if url.rstrip("/").endswith("user_settings"):
            return 200, {}, json.dumps(settings_for(params))
        if url.rstrip("/").endswith("computer_activities"):
            # the real API filters server-side by the dates[i] grid and
            # the user_id list — mirror that (like /entries below), so
            # the per-user × date-chunk partition fan-out of the
            # timecamp DataSource sees disjoint windows, not N copies
            dates = {
                str(v) for k, v in params.items() if str(k).startswith("dates[")
            }
            uids = {
                u for u in str(params.get("user_id", "")).split(",") if u
            }
            rows = [
                a
                for a in ws["activities"]
                if (not dates or str(a.get("end_date", "")) in dates)
                and (not uids or str(a.get("user_id", "")) in uids)
            ]
            return 200, {}, json.dumps(rows)
        if url.rstrip("/").endswith("entries"):
            # the real API filters entries server-side by the from/to
            # window — mirror that, so chunked/partitioned fetchers (the
            # timecamp DataSource) see disjoint windows, not N copies
            lo, hi = params.get("from"), params.get("to")
            rows = [
                e
                for e in ws["entries"]
                if (lo is None or str(e.get("date", "")) >= str(lo))
                and (hi is None or str(e.get("date", "")) <= str(hi))
            ]
            return 200, {}, json.dumps(rows)
        return base(method, url, params)

    return _send
