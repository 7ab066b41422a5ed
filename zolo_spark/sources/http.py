"""Live HTTP fetchers for the paginated API sources (S1-S4 live mode).

The pipeline modules take injected ``fetch_page`` callables; the test
suite injects fixture fetchers, and THIS module builds the live ones —
a pure-stdlib (``urllib``) HTTP client with retry/backoff plus an
OAuth2 refresh-token manager, mirroring the reference's live behavior
(``/root/reference/bin/etl/quickbooks_ETL.py:70-89`` refreshes the
access token at session start; ``square_ETL.py:79-95`` follows the
``Link`` header's batch token; ``shopify_ETL.py:73-87`` does
count-then-pages).

No third-party HTTP/OAuth library is used: the container has no
network and no creds, so these run only against user-supplied
endpoints — the tests drive them against a local ``http.server``.

Usage (Square)::

    client = HttpClient(auth=OAuth2TokenManager(...))
    run(spark, wh, store,
        fetcher_factory=lambda s, e: square_fetch_page(
            client, "https://connect.squareup.com/v1/me/payments", s, e))
"""

from __future__ import annotations

import json
import logging
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable

from .paginate import extract_batch_token

logger = logging.getLogger(__name__)

RETRYABLE = {429, 500, 502, 503, 504}


class HttpError(Exception):
    def __init__(self, status: int, url: str, body: str = ""):
        super().__init__(f"HTTP {status} for {url}: {body[:200]}")
        self.status = status


class OAuth2TokenManager:
    """Refresh-token OAuth2 (the reference's ``Oauth2SessionManager``
    role): POSTs ``grant_type=refresh_token`` to ``token_url``, keeps
    the rotating (access, refresh) pair in memory, and exposes the
    bearer header. ``on_rotate`` is the config-writeback seam — the
    reference persists rotated tokens back to its config store."""

    def __init__(self, token_url: str, client_id: str, client_secret: str,
                 access_token: str | None, refresh_token: str,
                 on_rotate: Callable[[str, str], None] | None = None):
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.access_token = access_token
        self.refresh_token = refresh_token
        self.on_rotate = on_rotate

    def refresh(self) -> None:
        body = urllib.parse.urlencode({
            "grant_type": "refresh_token",
            "refresh_token": self.refresh_token,
            "client_id": self.client_id,
            "client_secret": self.client_secret,
        }).encode()
        req = urllib.request.Request(
            self.token_url, data=body, method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = json.loads(resp.read().decode())
        self.access_token = payload["access_token"]
        # providers may rotate the refresh token too (QuickBooks does)
        self.refresh_token = payload.get("refresh_token", self.refresh_token)
        if self.on_rotate:
            self.on_rotate(self.access_token, self.refresh_token)

    def headers(self) -> dict[str, str]:
        if self.access_token is None:
            self.refresh()
        return {"Authorization": f"Bearer {self.access_token}"}


class HttpClient:
    """urllib JSON client: query-param encoding, bounded retry with
    exponential backoff on 429/5xx/connection errors, and a single
    refresh-and-retry on 401 when an auth manager is attached."""

    def __init__(self, auth: OAuth2TokenManager | None = None,
                 timeout: float = 30.0, max_retries: int = 3,
                 backoff: float = 0.5,
                 sleep: Callable[[float], None] = time.sleep):
        self.auth = auth
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff = backoff
        self._sleep = sleep  # injectable so tests don't wall-clock wait

    def get_json(self, url: str, params: dict | None = None,
                 headers: dict | None = None) -> tuple[dict | list, dict]:
        """GET → (parsed JSON body, response headers)."""
        if params:
            url = f"{url}?{urllib.parse.urlencode(params)}"
        refreshed = False
        attempt = 0
        while True:
            hdrs = dict(headers or {})
            if self.auth:
                hdrs.update(self.auth.headers())
            req = urllib.request.Request(url, headers=hdrs)
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    return (
                        json.loads(r.read().decode() or "null"),
                        dict(r.headers.items()),
                    )
            except urllib.error.HTTPError as e:
                if e.code == 401 and self.auth and not refreshed:
                    logger.info("401 from %s: refreshing access token", url)
                    self.auth.refresh()
                    refreshed = True  # one refresh per request, then fail
                    continue
                if e.code in RETRYABLE and attempt < self.max_retries:
                    self._sleep(self.backoff * 2**attempt)
                    attempt += 1
                    continue
                raise HttpError(e.code, url, e.read().decode(errors="replace")
                                if e.fp else "") from e
            except urllib.error.URLError as e:
                if attempt < self.max_retries:
                    self._sleep(self.backoff * 2**attempt)
                    attempt += 1
                    continue
                raise


# ------------------------------------------------------------------ S1
def square_fetch_page(client: HttpClient, url: str,
                      begin_time: str, end_time: str,
                      batch_size: int = 200):
    """Live S1 fetcher for :func:`..paginate.paginate_batch_token`:
    ``fetch_page(token) -> (payloads, next_token)`` where the next
    token comes from the response's ``Link`` header exactly as the
    reference regex does (``square_ETL.py:91-92``)."""

    def fetch_page(token: str | None):
        params = {"begin_time": begin_time, "end_time": end_time,
                  "limit": batch_size}
        if token:
            params["batch_token"] = token
        payloads, headers = client.get_json(url, params)
        return payloads, extract_batch_token(headers.get("Link"))

    return fetch_page


# ------------------------------------------------------------------ S2
def shopify_fetchers(client: HttpClient, base_url: str,
                     created_at_min: str, created_at_max: str,
                     status: str = "any"):
    """Live S2 fetchers for :func:`..paginate.paginate_count_pages`:
    ``(fetch_count, fetch_page)`` against ``orders/count.json`` +
    ``orders.json?page=N`` (``shopify_ETL.py:73-87``)."""
    window = {"created_at_min": created_at_min,
              "created_at_max": created_at_max, "status": status}

    def fetch_count() -> int:
        body, _ = client.get_json(f"{base_url}/orders/count.json", window)
        return int(body["count"])

    def fetch_page(page: int) -> list:
        body, _ = client.get_json(
            f"{base_url}/orders.json", {**window, "page": page}
        )
        return body["orders"]

    return fetch_count, fetch_page


# --------------------------------------------------------------- S3/S4
_QB_COUNT = ("select count(*) from {entity} "
             "where TxnDate > '{start}' and TxnDate < '{end}'")
_QB_PAGE = ("select * from {entity} "
            "where TxnDate > '{start}' and TxnDate < '{end}' "
            "STARTPOSITION {pos} MAXRESULTS {page_size}")
_QB_ALL = "select * from {entity} STARTPOSITION {pos} MAXRESULTS {page_size}"


def quickbooks_fetchers(client: HttpClient, base_url: str, realm_id: str,
                        entity: str, start: str | None = None,
                        end: str | None = None, page_size: int = 25):
    """Live S3/S4 fetchers for
    :func:`..paginate.paginate_start_position`: issues the reference's
    count + ``STARTPOSITION n MAXRESULTS m`` queries against the QBO
    ``/query`` endpoint (``quickbooks_ETL.py:92-109``; S4 passes no
    window — full-table customer scan, ``qb_customers_ETL.py``)."""
    query_url = f"{base_url}/v3/company/{realm_id}/query"
    windowed = start is not None

    def fetch_count() -> int:
        q = _QB_COUNT.format(entity=entity, start=start, end=end) if windowed \
            else f"select count(*) from {entity}"
        body, _ = client.get_json(query_url, {"query": q, "minorversion": 4})
        return int(body["QueryResponse"]["totalCount"])

    def fetch_page(pos: int) -> list:
        tmpl = _QB_PAGE if windowed else _QB_ALL
        q = tmpl.format(entity=entity, start=start, end=end, pos=pos,
                        page_size=page_size)
        body, _ = client.get_json(query_url, {"query": q, "minorversion": 4})
        return body["QueryResponse"].get(entity, [])

    return fetch_count, fetch_page
