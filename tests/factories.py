"""Deterministic synthetic transaction rows for parity-layer unit tests
(domains per FIXTURES.md §1 / the reference seeder distributions).

The driver fixtures have no transaction-shaped table; these rows
exercise ``operators/analytics.py`` and the service/streaming layers.
Generation is seeded and pure-Python, so Spark and DuckDB see the exact
same rows.
"""

from __future__ import annotations

import datetime as dt
import random
import uuid

CATEGORIES = ["electronics", "clothing", "grocery", "home_garden", "sports"]
REGIONS = {"west": ["Mumbai", "Pune"], "south": ["Chennai", "Mysore"],
           "north": ["Delhi", "Agra"], "east": ["Kolkata", "Patna"]}
PAYMENTS = ["credit_card", "debit_card", "upi", "wallet", "cod"]
CARD_NETWORKS = ["visa", "mastercard", "amex"]
CHANNELS = ["pos_in_store", "web", "mobile_app", "marketplace"]
TIERS = ["bronze", "silver", "gold", "platinum"]
STATUSES = ["completed"] * 92 + ["pending"] * 4 + ["failed"] * 2 + ["refunded"] * 2


def make_transactions(n: int = 2000, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for i in range(n):
        category = rng.choice(CATEGORIES)
        region = rng.choice(list(REGIONS))
        city = rng.choice(REGIONS[region])
        channel = rng.choice(CHANNELS)
        payment = rng.choice(PAYMENTS)
        quantity = rng.choice([1, 1, 1, 2, 2, 3])
        unit_price = round(rng.uniform(5, 500), 2)
        discount = rng.choice([0.0, 0.0, 5.0, 10.0, 25.0])
        total = round(quantity * unit_price * (1 - discount / 100), 2)
        fraud = rng.random() < 0.05
        ts = base + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 20))
        rows.append(
            {
                "transaction_id": str(uuid.UUID(int=rng.getrandbits(128))),
                "event_timestamp": ts,
                "processing_timestamp": ts,
                "customer_id": f"CUST-{rng.randint(1, 200):08d}",
                "customer_tier": rng.choice(TIERS),
                "product_id": f"SKU-{category[:3].upper()}-{rng.randint(1, 50):05d}",
                "product_name": f"Item {rng.randint(1, 50)}",
                "category": category,
                "sub_category": f"{category}_sub{rng.randint(1, 3)}",
                "brand": f"Brand{rng.randint(1, 10)}",
                "quantity": quantity,
                "unit_price": unit_price,
                "discount_percent": discount,
                "total_amount": total,
                "tax_amount": round(total * 0.09, 2),
                "currency": "USD",
                "payment_method": payment,
                "card_network": rng.choice(CARD_NETWORKS)
                if payment in ("credit_card", "debit_card")
                else None,
                "transaction_status": rng.choice(STATUSES),
                "channel": channel,
                "store_id": f"STORE-{city[:3].upper()}-{rng.randint(1, 20):03d}"
                if channel == "pos_in_store"
                else None,
                "region": region,
                "city": city,
                "state": city[:2].upper(),
                "postal_code": f"{rng.randint(100000, 999999)}",
                "device_type": rng.choice(["android", "ios", "desktop"])
                if channel != "pos_in_store"
                else None,
                "session_id": f"sess-{rng.getrandbits(48):012x}"
                if channel != "pos_in_store"
                else None,
                "ip_address": f"10.0.{rng.randint(0, 255)}.xxx",
                "is_fraudulent": fraud,
                "fraud_score": round(
                    rng.uniform(0.7, 1.0) if fraud else rng.uniform(0.0, 0.15), 4
                ),
                "batch_id": None,
                "event_date": ts.date(),
            }
        )
    return rows


def transactions_df(spark, n: int = 2000, seed: int = 7):
    from pyspark.sql import types as T

    from streamandbatchprocessing_spark.schemas import TRANSACTION_SCHEMA

    schema = T.StructType(
        TRANSACTION_SCHEMA.fields + [T.StructField("event_date", T.DateType())]
    )
    return spark.createDataFrame(make_transactions(n, seed), schema)
