"""Keboola Storage-API client for the writer's column-list sync action.

Parity surface (reference: ``components/wr-iceberg/src/
storage_api_client.py:8-30`` and its use in
``wr-iceberg/src/component.py:154-166``): a GET of the table detail with
the ``X-StorageApi-Token`` header, retried ``retry_attempts`` times with
linear backoff (sleep 1s, 2s, … between attempts), raising the last
error when all attempts fail.

The HTTP transport is injectable so the retry/backoff contract is
unit-testable without a network (and so a deployment can swap in its own
session handling); the default is stdlib ``urllib``.
"""

from __future__ import annotations

import json
import logging
import time
import urllib.request
from collections.abc import Callable

log = logging.getLogger(__name__)

# transport: (url, headers) -> response body string
Transport = Callable[[str, dict[str, str]], str]


def _urllib_transport(url: str, headers: dict[str, str]) -> str:
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req) as resp:  # noqa: S310 — https API URL
        return resp.read().decode("utf-8")


class StorageApiClient:
    """Minimal Storage-API reader: table detail → column list."""

    def __init__(
        self,
        base_url: str,
        token: str,
        retry_attempts: int = 3,
        transport: Transport | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.retry_attempts = retry_attempts
        self._transport = transport or _urllib_transport
        self._sleep = sleep

    def _get_json(self, url: str) -> dict:
        errors: list[Exception] = []
        for attempt in range(1, self.retry_attempts + 1):
            try:
                return json.loads(
                    self._transport(url, {"X-StorageApi-Token": self.token})
                )
            except Exception as exc:  # noqa: BLE001 — retry any failure
                errors.append(exc)
                log.warning("storage API attempt %d failed: %s", attempt, exc)
                if attempt < self.retry_attempts:
                    # linear backoff: 1s after the first failure, 2s after
                    # the second, … (reference backoff shape)
                    self._sleep(attempt)
        raise errors[-1]

    def get_table_detail(self, table_id: str) -> dict:
        return self._get_json(f"{self.base_url}/v2/storage/tables/{table_id}")

    def list_table_columns(self, table_id: str) -> list[str]:
        """Column names of a Storage table — what the writer's
        ``list_table_columns`` sync action surfaces in the UI."""
        return list(self.get_table_detail(table_id).get("columns", []))
