"""Minimal retrying JSON-over-HTTP client (stdlib only).

The live half of S1/S10: the reference fetches paginated OData pages
(``src/main.py:349-364``) and PATCHes flags back in ``$batch`` requests
(``src/main.py:854-859,318``) through the ``pandassta`` HTTP layer.  This
module is the engine's equivalent transport: ``urllib``-based so it works
on any executor image, exponential backoff on retryable failures
(connection errors, 429, 5xx), fail-fast on client errors (4xx other
than 429 — a malformed query never heals by retrying).

Everything is injectable for tests: the sleeper (no real waiting in unit
tests) and, at the call sites, the sender/transport itself.
"""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable


class HttpError(RuntimeError):
    """Terminal HTTP failure (non-retryable status, or retries exhausted)."""

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


def request_json(
    url: str,
    method: str = "GET",
    body: dict | None = None,
    auth: tuple[str, str] | None = None,
    timeout: float = 30.0,
    retries: int = 4,
    backoff: float = 0.5,
    headers: dict[str, str] | None = None,
    sleep: Callable[[float], None] = time.sleep,
):
    """JSON-in/JSON-out request with exponential backoff.

    Retries connection-level failures, 429 and 5xx up to ``retries``
    times (waits ``backoff * 2**attempt`` seconds between tries); other
    HTTP errors raise :class:`HttpError` immediately.  Returns the parsed
    JSON document, or ``None`` for an empty body (204-style responses).
    """
    data = json.dumps(body).encode("utf-8") if body is not None else None
    hdrs = {"Accept": "application/json"}
    if data is not None:
        hdrs["Content-Type"] = "application/json"
    if auth is not None:
        token = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
        hdrs["Authorization"] = f"Basic {token}"
    hdrs.update(headers or {})

    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            req = urllib.request.Request(
                url, data=data, headers=hdrs, method=method
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                payload = resp.read()
                return json.loads(payload) if payload else None
        except urllib.error.HTTPError as e:
            if e.code == 429 or 500 <= e.code < 600:
                last = e
            else:
                raise HttpError(
                    f"{method} {url} -> HTTP {e.code}", status=e.code
                ) from e
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            last = e
        if attempt < retries:
            sleep(backoff * (2**attempt))
    raise HttpError(
        f"{method} {url} failed after {retries + 1} attempts: {last!r}"
    )


def with_query(url: str, params: str) -> str:
    """Append OData params to a URL that may already carry a query string."""
    return url + ("&" if "?" in url else "?") + params
