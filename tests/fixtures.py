"""Deterministic synthetic API payloads (FIXTURES.md §1 shapes).

Built to hit every branch: NULL tender (~20%), NULL modifiers (~30%),
empty shipping_lines (~25%), subtotal pseudo-lines, absent
SalesItemLineDetail members, and market-classification edges
(Saturday first-transactions before/after/exactly 07:00 Pacific).
"""

from __future__ import annotations

import datetime as dt
import random


def square_payments(n: int = 40, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    out = []
    # UTC times; the pipeline shifts -7h, so 14:00 UTC == 07:00 local.
    # Include Saturdays (2024-01-06/13/20/27) with first transactions
    # before, after, and exactly at 07:00 local.
    base = dt.datetime(2024, 1, 1, 16, 0)  # Monday 09:00 local
    special = [
        dt.datetime(2024, 1, 7, 13, 0),   # Sat local (Sun UTC-7h? no: -7h => Jan 7 06:00 local, Sunday)
        dt.datetime(2024, 1, 7, 20, 0),   # Sunday 13:00 local
        dt.datetime(2024, 1, 6, 13, 30),  # Saturday 06:30 local
        dt.datetime(2024, 1, 6, 21, 0),   # Saturday 14:00 local
        dt.datetime(2024, 1, 13, 14, 0),  # Saturday 07:00:00 local exactly
        dt.datetime(2024, 1, 4, 18, 0),   # Thursday 11:00 local
        dt.datetime(2024, 1, 5, 18, 0),   # Friday 11:00 local
    ]
    for i in range(n):
        ts = special[i % len(special)] if i < len(special) else (
            base + dt.timedelta(hours=rng.randrange(0, 24 * 28))
        )
        k = rng.randint(1, 5)
        items = []
        for j in range(k):
            mods = None if rng.random() < 0.3 else [
                {"name": rng.choice(["oat", "extra shot", "decaf"])}
                for _ in range(rng.randint(1, 2))
            ]
            items.append({
                "quantity": float(rng.randint(1, 4)),
                "item_variation_name": f"var_{rng.randint(1, 9)}",
                "item_detail": {"item_variation_id": f"sq_{rng.randint(1, 30)}"},
                "total_money": {"amount": rng.randrange(100, 5000)},
                "modifiers": mods,
            })
        tender = None if rng.random() < 0.2 else [{
            "tendered_money": {"amount": rng.randrange(500, 10000)},
            "change_back_money": {"amount": rng.randrange(0, 500)},
        }]
        out.append({
            "payment_id": f"pay_{i:04d}",
            "created_at": ts.isoformat() + "Z",
            "device": {"name": rng.choice(["reg_1", "reg_2"])},
            "itemizations": items,
            "tender": tender,
        })
    return out


def shopify_orders(n: int = 30, seed: int = 11) -> list[dict]:
    rng = random.Random(seed)
    out = []
    base = dt.datetime(2024, 1, 2, 15, 0)
    for i in range(n):
        ts = base + dt.timedelta(hours=rng.randrange(0, 24 * 28))
        k = rng.randint(1, 4)
        out.append({
            "id": 9000 + i,
            "created_at": ts.isoformat() + "Z",
            "line_items": [
                {
                    "quantity": str(rng.randint(1, 5)),
                    "variant_id": rng.randint(100, 130),
                    "price": f"{rng.randrange(500, 3000) / 100:.2f}",
                }
                for _ in range(k)
            ],
            "shipping_lines":
                [] if rng.random() < 0.25
                else [{"price": f"{rng.randrange(300, 900) / 100:.2f}"}],
        })
    return out


def qb_invoices(n: int = 25, seed: int = 13) -> list[dict]:
    rng = random.Random(seed)
    out = []
    base = dt.date(2024, 1, 2)
    for i in range(n):
        k = rng.randint(1, 3)
        lines = []
        for j in range(k):
            detail = {
                "ItemRef": {"value": f"qb_{rng.randint(1, 25)}"},
                "Qty": float(rng.randint(1, 6)),
                "UnitPrice": rng.randrange(400, 2500) / 100,
            }
            # ~20%: absent SalesItemLineDetail members -> NULL (N3)
            if rng.random() < 0.2:
                detail = {"ItemRef": {"value": f"qb_{rng.randint(1, 25)}"},
                          "Qty": None, "UnitPrice": None}
            lines.append({"Id": str(j + 1), "SalesItemLineDetail": detail})
        # subtotal pseudo-line without an Id (filtered, N4)
        lines.append({"Id": None, "SalesItemLineDetail": None})
        out.append({
            "DocNumber": f"inv_{i:04d}",
            "TxnDate": (base + dt.timedelta(days=rng.randrange(0, 28))).isoformat(),
            "CustomerRef": {"value": f"cust_{rng.randint(1, 10)}"},
            "Line": lines,
        })
    return out


def qb_customers(n: int = 12, seed: int = 17) -> list[dict]:
    rng = random.Random(seed)
    return [
        {
            "Id": f"cust_{i}",
            "CompanyName": f"Co {i}",
            "PrimaryPhone": {"FreeFormNumber": f"555-01{i:02d}"},
            "ShipAddr": {
                "Line1": f"{i} Main St", "City": "Oakland",
                "CountrySubDivisionCode": "CA", "PostalCode": f"946{i:02d}",
            },
            "MetaData": {"CreateTime": f"2023-0{rng.randint(1, 9)}-15T10:00:00"},
        }
        for i in range(n)
    ]


# ----------------------------------------------------- fixture fetchers

def square_fetcher(payloads: list[dict], page_size: int = 10):
    """Batch-token pagination over canned payloads (S1 shape)."""
    def fetch(token: str | None):
        i = int(token) if token else 0
        page = payloads[i:i + page_size]
        nxt = str(i + page_size) if i + page_size < len(payloads) else None
        return page, nxt
    return fetch


def count_page_fetchers(payloads: list[dict], page_size: int):
    """count + 1-based page fetch (S2 shape)."""
    def fetch_count() -> int:
        return len(payloads)

    def fetch_page(page: int) -> list:
        return payloads[(page - 1) * page_size: page * page_size]
    return fetch_count, fetch_page


def start_position_fetchers(payloads: list[dict], page_size: int):
    """count + STARTPOSITION fetch, 1-based (S3/S4 shape)."""
    def fetch_count() -> int:
        return len(payloads)

    def fetch_page(start_pos: int) -> list:
        return payloads[start_pos - 1: start_pos - 1 + page_size]
    return fetch_count, fetch_page


def gen_page_fetcher(page: int, page_size: int) -> list[dict]:
    """Executor-side fetcher for the paged_api DataSource tests:
    deterministic synthetic 'API rows' derived from the page number."""
    first = (page - 1) * page_size
    return [
        {"id": first + i, "name": f"row_{first + i}", "value": float((first + i) % 97)}
        for i in range(page_size)
    ]
