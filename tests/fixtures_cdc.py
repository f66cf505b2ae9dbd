"""Synthetic CDC fixture generator per FIXTURES.md.

Deterministic (seeded) generator for customers_cdc / orders_cdc batches
with the dirt the reference's cleaning logic exists for: multiple
versions per key, DELETEs, dirty vocab spellings, invalid emails and
phones, NULL/negative/oversized money, dangling customer FKs, and
multiple non-overlapping batches for incremental replay.
"""

from __future__ import annotations

import datetime as dt
import random

BASE_TS = dt.datetime(2024, 1, 1)

DIRTY_STATUS = [
    "PENDING", "pending", " Confirmed ", "processing", "IN_TRANSIT",
    "out_for_delivery", "Completed", "FULFILLED", "canceled", "VOID",
    "REJECTED", "DELIVERED", "shipped", "weird_status",
]
DIRTY_PAY_STATUS = ["PAID", "paid ", "authorized", "CAPTURED", "declined", "Chargeback", "??", "PENDING"]
DIRTY_PAY_METHOD = ["visa", "MASTERCARD", "apple_pay", "ACH", "paypal", "DEBIT_CARD", "bitcoin"]
DIRTY_SHIP_METHOD = ["ground", "NEXT_DAY", "two_day", "saver", "STANDARD", "warp"]
DIRTY_REGION = ["NE", "se", " midwest ", "NW", "sw", "CENTRAL", "atlantis"]
COUNTRIES = ["USA", "usa", " Canada", "UK", "germany", "France", "AUSTRALIA", "Brazil"]
EMAILS = ["ok{i}@example.com", "bad{i}@", "{i}missing.at", "", None, "UPPER{i}@Mail.COM"]
PHONES = ["555-123-{i:04d}", "000-000-0000", "12{i}", "", None, "(555) 987-{i:04d}"]


def customers_cdc_rows(n_keys: int = 40, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for cid in range(1, n_keys + 1):
        n_versions = rng.choice([1, 1, 2, 3])
        for v in range(n_versions):
            ts = BASE_TS + dt.timedelta(days=v * 3 + rng.randint(0, 2), seconds=cid)
            op = "INSERT" if v == 0 else ("DELETE" if rng.random() < 0.08 else "UPDATE")
            email_t = rng.choice(EMAILS)
            phone_t = rng.choice(PHONES)
            rows.append(
                dict(
                    customer_id=cid,
                    email=email_t.format(i=cid) if email_t else email_t,
                    first_name=f"  First{cid} ",
                    last_name=f" Last{cid}",
                    phone=phone_t.format(i=cid) if phone_t else phone_t,
                    address_line1=rng.choice([f"{cid} Main St", "", None]),
                    address_line2=rng.choice(["Apt 1", "", None]),
                    city=rng.choice(["Springfield", "", None]),
                    state=rng.choice(["CA", "NY", "", None]),
                    country=rng.choice(COUNTRIES),
                    postal_code=rng.choice([f"9{cid:04d}", "", None]),
                    registration_date=dt.date(2023, 1 + cid % 12, 1 + cid % 27),
                    customer_status=rng.choice(["active", "ACTIVE", "inactive", "SUSPENDED"]),
                    customer_segment=rng.choice(["vip", "REGULAR", "new"]),
                    _cdc_operation=op,
                    _cdc_timestamp=ts,
                    _ingested_at=ts + dt.timedelta(minutes=1),
                    _source_system="crm",
                    _batch_id=f"b{v}",
                )
            )
    return rows


def orders_cdc_rows(n_keys: int = 80, n_customers: int = 40, seed: int = 11) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for oid in range(1, n_keys + 1):
        n_versions = rng.choice([1, 1, 2, 3])
        # ~10% dangling customer FKs (FIXTURES.md).
        cid = rng.randint(1, n_customers + 5) if rng.random() < 0.15 else rng.randint(1, n_customers)
        order_date = BASE_TS + dt.timedelta(days=rng.randint(0, 400), hours=rng.randint(0, 23))
        for v in range(n_versions):
            ts = BASE_TS + dt.timedelta(days=v * 3 + rng.randint(0, 2), seconds=oid * 7)
            op = "INSERT" if v == 0 else ("DELETE" if rng.random() < 0.05 else "UPDATE")
            total = rng.choice([None, -10.0, 60000.0, round(rng.uniform(5, 2000), 2)])
            est = order_date.date() + dt.timedelta(days=rng.randint(2, 10))
            rows.append(
                dict(
                    order_id=oid,
                    customer_id=cid if rng.random() > 0.03 else None,
                    order_date=order_date,
                    order_status=rng.choice(DIRTY_STATUS),
                    payment_status=rng.choice(DIRTY_PAY_STATUS),
                    payment_method=rng.choice(DIRTY_PAY_METHOD),
                    shipping_address_line1=rng.choice([f"{oid} Oak Ave ", "", None]),
                    shipping_address_line2="",
                    shipping_city=rng.choice(["Metropolis", "", None]),
                    shipping_state=rng.choice(["CA", "tx ", None]),
                    shipping_country=rng.choice(COUNTRIES),
                    shipping_postal_code=rng.choice([f"1{oid:04d}", None]),
                    shipping_method=rng.choice(DIRTY_SHIP_METHOD),
                    estimated_delivery_date=est,
                    actual_delivery_date=rng.choice(
                        [None, est + dt.timedelta(days=rng.randint(-2, 5))]
                    ),
                    order_total=total,
                    tax_amount=rng.choice([None, -1.0, 1e9, round(rng.uniform(0, 100), 2)]),
                    shipping_cost=rng.choice([None, -2.0, 500.0, round(rng.uniform(0, 50), 2)]),
                    discount_amount=rng.choice([None, -3.0, 1e9, round(rng.uniform(0, 80), 2)]),
                    region=rng.choice(DIRTY_REGION),
                    _cdc_operation=op,
                    _cdc_timestamp=ts,
                    _ingested_at=ts + dt.timedelta(minutes=2),
                    _source_system="oms",
                    _batch_id=f"b{v}",
                )
            )
    return rows


CUSTOMERS_SCHEMA = """
    customer_id long, email string, first_name string, last_name string,
    phone string, address_line1 string, address_line2 string, city string,
    state string, country string, postal_code string, registration_date date,
    customer_status string, customer_segment string, _cdc_operation string,
    _cdc_timestamp timestamp, _ingested_at timestamp, _source_system string,
    _batch_id string
"""

ORDERS_SCHEMA = """
    order_id long, customer_id long, order_date timestamp, order_status string,
    payment_status string, payment_method string, shipping_address_line1 string,
    shipping_address_line2 string, shipping_city string, shipping_state string,
    shipping_country string, shipping_postal_code string, shipping_method string,
    estimated_delivery_date date, actual_delivery_date date, order_total double,
    tax_amount double, shipping_cost double, discount_amount double, region string,
    _cdc_operation string, _cdc_timestamp timestamp, _ingested_at timestamp,
    _source_system string, _batch_id string
"""


def make_cdc_frames(spark):
    customers = spark.createDataFrame(customers_cdc_rows(), CUSTOMERS_SCHEMA)
    orders = spark.createDataFrame(orders_cdc_rows(), ORDERS_SCHEMA)
    return customers, orders
