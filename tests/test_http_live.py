"""Live-mode HTTP fetchers (sources/http.py) against a LOCAL
``http.server`` — proving the S1-S4 connectors speak real HTTP
(query params, Link-header batch tokens, OAuth2 refresh on 401,
429 backoff-retry) end-to-end through the same pagination drivers
the fixture-injected pipelines use. No external network involved.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from tests import fixtures
from zolo_spark.sources import paginate
from zolo_spark.sources.http import (
    HttpClient,
    HttpError,
    OAuth2TokenManager,
    quickbooks_fetchers,
    shopify_fetchers,
    square_fetch_page,
)

PAGE = 10


class _Api(BaseHTTPRequestHandler):
    """Fake Square + Shopify + QuickBooks + OAuth token endpoint."""

    payments = fixtures.square_payments(25)
    orders = fixtures.shopify_orders(23)
    invoices = fixtures.qb_invoices(26)

    # mutable class-level knobs the tests poke
    valid_token = "tok-1"
    flaky_remaining = 0  # serve this many 500s before succeeding
    refresh_calls = 0

    def log_message(self, *a):  # silence test output
        pass

    def _json(self, code: int, body, headers: dict | None = None):
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):
        if urllib.parse.urlparse(self.path).path == "/oauth/token":
            length = int(self.headers["Content-Length"])
            form = urllib.parse.parse_qs(self.rfile.read(length).decode())
            assert form["grant_type"] == ["refresh_token"]
            type(self).refresh_calls += 1
            type(self).valid_token = f"tok-{self.refresh_calls + 1}"
            self._json(200, {
                "access_token": self.valid_token,
                "refresh_token": f"refresh-{self.refresh_calls + 1}",
            })
        else:
            self._json(404, {"error": "not found"})

    def do_GET(self):
        url = urllib.parse.urlparse(self.path)
        q = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}

        if type(self).flaky_remaining > 0:
            type(self).flaky_remaining -= 1
            self._json(503, {"error": "try later"})
            return
        if self.headers.get("Authorization") != f"Bearer {self.valid_token}":
            self._json(401, {"error": "expired"})
            return

        if url.path == "/v1/me/payments":  # Square S1
            start = int(q.get("batch_token", 0))
            page = self.payments[start: start + PAGE]
            headers = {}
            if start + PAGE < len(self.payments):
                nxt = start + PAGE
                headers["Link"] = (
                    f"<https://x?batch_token={nxt}&begin_time=0>; rel=next"
                )
            self._json(200, page, headers)
        elif url.path == "/admin/orders/count.json":  # Shopify S2
            self._json(200, {"count": len(self.orders)})
        elif url.path == "/admin/orders.json":
            p = int(q["page"]) - 1
            self._json(200, {"orders": self.orders[p * PAGE:(p + 1) * PAGE]})
        elif url.path == "/v3/company/rlm/query":  # QuickBooks S3
            query = q["query"]
            if query.startswith("select count"):
                self._json(200, {"QueryResponse":
                                 {"totalCount": len(self.invoices)}})
            else:
                pos = int(query.split("STARTPOSITION ")[1].split(" ")[0])
                size = int(query.split("MAXRESULTS ")[1])
                self._json(200, {"QueryResponse": {
                    "Invoice": self.invoices[pos - 1: pos - 1 + size]}})
        else:
            self._json(404, {"error": url.path})


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Api)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture()
def client(server):
    _Api.valid_token = "tok-1"
    _Api.flaky_remaining = 0
    auth = OAuth2TokenManager(
        token_url=f"{server}/oauth/token", client_id="cid",
        client_secret="sec", access_token="tok-1", refresh_token="refresh-1",
    )
    return HttpClient(auth=auth, backoff=0.0, sleep=lambda s: None)


def test_square_live_link_header_pagination(server, client):
    fetch = square_fetch_page(
        client, f"{server}/v1/me/payments", "2020-01-01", "2020-02-01"
    )
    got = [p for batch in paginate.paginate_batch_token(fetch) for p in batch]
    assert got == _Api.payments  # all 25 rows across 3 token-chained pages


def test_shopify_live_count_then_pages(server, client):
    fc, fp = shopify_fetchers(
        client, f"{server}/admin", "2020-01-01", "2020-02-01"
    )
    got = [o for page in paginate.paginate_count_pages(fc, fp, PAGE)
           for o in page]
    assert got == _Api.orders  # ceil(23/10) = 3 pages, partial tail kept


def test_quickbooks_live_startposition(server, client):
    fc, fp = quickbooks_fetchers(
        client, server, "rlm", "Invoice", "2020-01-01", "2020-02-01",
        page_size=PAGE,
    )
    got = [i for page in paginate.paginate_start_position(fc, fp, PAGE)
           for i in page]
    assert got == _Api.invoices  # 26 rows: the ceil fix keeps the 6-row tail


def test_oauth_refresh_on_401(server, client):
    _Api.valid_token = "tok-99"  # invalidate the client's current token
    before = _Api.refresh_calls
    fc, _ = shopify_fetchers(client, f"{server}/admin", "a", "b")
    assert fc() == len(_Api.orders)  # 401 -> refresh -> retried OK
    assert _Api.refresh_calls == before + 1
    assert client.auth.access_token == _Api.valid_token
    assert client.auth.refresh_token.startswith("refresh-")


def test_retry_on_5xx_then_success(server, client):
    _Api.flaky_remaining = 2  # two 503s, then healthy
    fc, _ = shopify_fetchers(client, f"{server}/admin", "a", "b")
    assert fc() == len(_Api.orders)


def test_retries_exhausted_raises(server, client):
    _Api.flaky_remaining = 99
    fc, _ = shopify_fetchers(client, f"{server}/admin", "a", "b")
    with pytest.raises(HttpError) as e:
        fc()
    assert e.value.status == 503
    _Api.flaky_remaining = 0


def test_square_pipeline_end_to_end_over_live_http(spark, server, client):
    """The full Square ETL transform consumes the LIVE extract — the
    same rows the fixture-injected path produces."""
    from zolo_spark.pipelines import square_etl

    raw = square_etl.extract(
        spark,
        square_fetch_page(client, f"{server}/v1/me/payments", "a", "b"),
    )
    details, trans = square_etl.transform(raw)
    assert trans.count() == len(_Api.payments)
    assert details.count() > 0
