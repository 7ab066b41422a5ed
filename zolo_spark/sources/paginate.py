"""Pagination drivers for the three API shapes (S1-S4).

The reference's three pagination protocols, with the quirks register
applied (SURVEY §2.10): QuickBooks' ``round(n/25)`` — which silently
drops the final partial page — is implemented as ``ceil`` (the intent,
and what Shopify's twin does).
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Iterator


def paginate_batch_token(
    fetch_page: Callable[[str | None], tuple[list, str | None]],
) -> Iterator[list]:
    """S1 (Square): follow an opaque batch token until exhausted
    (``square_ETL.py:79-95``). ``fetch_page(token) -> (payloads,
    next_token)``; first call gets ``None``."""
    token: str | None = None
    while True:
        payloads, token = fetch_page(token)
        yield payloads
        if not token:
            return


def extract_batch_token(link_header: str | None) -> str | None:
    """P15: the reference regex-extracts the next batch token from the
    ``Link`` response header (``square_ETL.py:91-92``)."""
    if not link_header:
        return None
    m = re.search(r"batch_token=(.*?)&begin_time=", link_header)
    return m.group(1) if m else None


def paginate_count_pages(
    fetch_count: Callable[[], int],
    fetch_page: Callable[[int], list],
    page_size: int,
) -> Iterator[list]:
    """S2 (Shopify): count then ``ceil(count/page_size)`` page fetches,
    1-based page numbers (``shopify_ETL.py:73-87``)."""
    n = fetch_count()
    for page in range(1, math.ceil(n / page_size) + 1):
        yield fetch_page(page)


def paginate_start_position(
    fetch_count: Callable[[], int],
    fetch_page: Callable[[int], list],
    page_size: int,
) -> Iterator[list]:
    """S3/S4 (QuickBooks): count then paged ``STARTPOSITION n
    MAXRESULTS page_size`` (``quickbooks_ETL.py:92-109``). The
    reference's ``range(round(n/25))`` drops the last partial page;
    intent (= Shopify's ceil) implemented."""
    n = fetch_count()
    for i in range(math.ceil(n / page_size)):
        yield fetch_page(i * page_size + 1)
