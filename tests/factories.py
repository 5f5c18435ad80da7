"""Deterministic synthetic transaction rows for parity-layer unit tests.

Distributional port of the reference's Kafka generator
(``scripts/kafka_stream_generator.py:37-188`` weights/pools and
``:273-422`` event assembly): category weights with per-category price
ranges and brand lists, region weights with city/state tables, payment /
channel / tier / card-network weights, the 70/20/10 quantity split, the
60/30/10 discount split, the 92/4/2/1.5/0.5 status split, preferred-
channel stickiness (0.7), and the 2% fraud rate with bimodal fraud
scores. The reference samples with ``SystemRandom``; here a seeded
``random.Random`` makes rows reproducible so Spark and DuckDB see the
exact same data (``tests/test_factories_distribution.py`` checks the
empirical frequencies against these weights).

The driver fixtures have no transaction-shaped table; these rows
exercise ``operators/analytics.py`` and the service/streaming layers.
"""

from __future__ import annotations

import datetime as dt
import random
import uuid

# kafka_stream_generator.py:46-121 (weights, price ranges, sub-categories)
CATEGORIES: dict[str, dict] = {
    "electronics": {"weight": 0.20, "price_range": (29.99, 2499.99),
                    "sub_cats": ["smartphones", "laptops", "audio_headphones",
                                 "cameras", "tablets", "wearables"]},
    "clothing": {"weight": 0.18, "price_range": (9.99, 299.99),
                 "sub_cats": ["mens_shirts", "womens_dresses", "shoes",
                              "activewear", "accessories"]},
    "grocery": {"weight": 0.22, "price_range": (1.99, 89.99),
                "sub_cats": ["dairy", "snacks", "beverages", "frozen",
                             "organic", "bakery"]},
    "home_garden": {"weight": 0.10, "price_range": (14.99, 999.99),
                    "sub_cats": ["furniture", "kitchen", "bedding",
                                 "garden_tools", "lighting"]},
    "sports": {"weight": 0.08, "price_range": (19.99, 799.99),
               "sub_cats": ["fitness", "outdoor", "team_sports", "cycling",
                            "swimming"]},
    "beauty": {"weight": 0.07, "price_range": (4.99, 199.99),
               "sub_cats": ["skincare", "makeup", "haircare", "fragrance",
                            "supplements"]},
    "automotive": {"weight": 0.04, "price_range": (9.99, 499.99),
                   "sub_cats": ["parts", "accessories", "tools", "car_care",
                                "electronics"]},
    "books": {"weight": 0.05, "price_range": (5.99, 49.99),
              "sub_cats": ["fiction", "non_fiction", "textbooks", "children",
                           "comics"]},
    "toys": {"weight": 0.03, "price_range": (7.99, 199.99),
             "sub_cats": ["action_figures", "board_games", "educational",
                          "outdoor", "dolls"]},
    "pharmacy": {"weight": 0.03, "price_range": (2.99, 149.99),
                 "sub_cats": ["otc_medicine", "vitamins", "first_aid",
                              "personal_care", "baby_care"]},
}

# kafka_stream_generator.py:123-160
REGIONS: dict[str, dict] = {
    "north": {"weight": 0.22, "cities": ["Delhi", "Chandigarh", "Lucknow", "Jaipur"],
              "states": ["DL", "CH", "UP", "RJ"]},
    "south": {"weight": 0.25, "cities": ["Bangalore", "Chennai", "Hyderabad", "Kochi"],
              "states": ["KA", "TN", "TS", "KL"]},
    "east": {"weight": 0.12, "cities": ["Kolkata", "Patna", "Bhubaneswar", "Guwahati"],
             "states": ["WB", "BR", "OD", "AS"]},
    "west": {"weight": 0.28, "cities": ["Mumbai", "Pune", "Ahmedabad", "Goa"],
             "states": ["MH", "MH", "GJ", "GA"]},
    "central": {"weight": 0.08, "cities": ["Bhopal", "Nagpur", "Indore", "Raipur"],
                "states": ["MP", "MH", "MP", "CG"]},
    "northeast": {"weight": 0.05, "cities": ["Guwahati", "Imphal", "Shillong", "Agartala"],
                  "states": ["AS", "MN", "ML", "TR"]},
}

# kafka_stream_generator.py:162-176
PAYMENT_METHODS = ["credit_card", "debit_card", "upi", "wallet",
                   "bank_transfer", "cod", "gift_card"]
PAYMENT_WEIGHTS = [0.30, 0.20, 0.25, 0.10, 0.05, 0.08, 0.02]
CHANNELS = ["pos_in_store", "web", "mobile_app", "marketplace", "call_center"]
CHANNEL_WEIGHTS = [0.25, 0.20, 0.35, 0.15, 0.05]
CUSTOMER_TIERS = ["bronze", "silver", "gold", "platinum"]
TIER_WEIGHTS = [0.50, 0.30, 0.15, 0.05]
CARD_NETWORKS = ["visa", "mastercard", "amex", "rupay", "discover"]
CARD_WEIGHTS = [0.35, 0.30, 0.15, 0.15, 0.05]

# kafka_stream_generator.py:178-188
BRANDS: dict[str, list[str]] = {
    "electronics": ["Apple", "Samsung", "Sony", "LG", "Dell", "HP", "Bose", "OnePlus"],
    "clothing": ["Nike", "Adidas", "Zara", "H&M", "Levi's", "Puma", "Uniqlo"],
    "grocery": ["Amul", "Nestle", "Britannia", "ITC", "Parle", "Haldiram"],
    "home_garden": ["IKEA", "HomeTown", "Godrej", "Nilkamal", "Wipro"],
    "sports": ["Nike", "Adidas", "Puma", "Decathlon", "Yonex", "Wilson"],
    "beauty": ["Lakme", "L'Oreal", "Maybelline", "Nivea", "Dove"],
    "automotive": ["Bosch", "3M", "Castrol", "Shell", "Philips"],
    "books": ["Penguin", "HarperCollins", "Scholastic", "Oxford", "Cambridge"],
    "toys": ["Lego", "Hasbro", "Mattel", "Funskool", "PlayDoh"],
    "pharmacy": ["Cipla", "Sun Pharma", "Himalaya", "Dabur", "Patanjali"],
}

FRAUD_RATE = 0.02  # kafka_stream_generator.py:37
STATUSES = ["completed", "pending", "failed", "refunded", "chargeback"]
STATUS_WEIGHTS = [0.92, 0.04, 0.02, 0.015, 0.005]  # :349-363 cumulative rolls
PREFERRED_CHANNEL_PROB = 0.7  # :275
DIGITAL = ("web", "mobile_app", "marketplace")


def _customer_pool(rng: random.Random, n: int) -> list[dict]:
    """kafka_stream_generator.py:197-216 — tier/region/channel per customer."""
    region_names = list(REGIONS)
    region_weights = [REGIONS[r]["weight"] for r in region_names]
    return [
        {
            "customer_id": f"CUST-{i:08d}",
            "customer_tier": rng.choices(CUSTOMER_TIERS, weights=TIER_WEIGHTS)[0],
            "home_region": rng.choices(region_names, weights=region_weights)[0],
            "preferred_channel": rng.choices(CHANNELS, weights=CHANNEL_WEIGHTS)[0],
        }
        for i in range(n)
    ]


def _product_pool(rng: random.Random, n: int) -> list[dict]:
    """kafka_stream_generator.py:219-240 — weighted category, brand, price."""
    cat_names = list(CATEGORIES)
    cat_weights = [CATEGORIES[c]["weight"] for c in cat_names]
    products = []
    for i in range(n):
        cat = rng.choices(cat_names, weights=cat_weights)[0]
        info = CATEGORIES[cat]
        sub = rng.choice(info["sub_cats"])
        brand = rng.choice(BRANDS[cat])
        products.append(
            {
                "product_id": f"SKU-{cat[:3].upper()}-{i:05d}",
                "product_name": f"{brand} {sub.replace('_', ' ').title()} #{i}",
                "category": cat,
                "sub_category": sub,
                "brand": brand,
                "unit_price": round(rng.uniform(*info["price_range"]), 2),
            }
        )
    return products


def _store_pool(rng: random.Random, n: int) -> list[dict]:
    """kafka_stream_generator.py:243-266."""
    region_names = list(REGIONS)
    region_weights = [REGIONS[r]["weight"] for r in region_names]
    stores = []
    for i in range(n):
        region = rng.choices(region_names, weights=region_weights)[0]
        info = REGIONS[region]
        ci = rng.randrange(len(info["cities"]))
        stores.append(
            {
                "store_id": f"STORE-{info['cities'][ci][:3].upper()}-{i:03d}",
                "region": region,
                "city": info["cities"][ci],
                "state": info["states"][ci],
            }
        )
    return stores


def _financials(rng: random.Random, unit_price: float) -> tuple:
    """kafka_stream_generator.py:312-339 — 70/20/10 quantity, 60/30/10
    discount splits, 9% tax."""
    q = rng.random()
    quantity = 1 if q < 0.70 else (2 if q < 0.90 else rng.randint(3, 5))
    d = rng.random()
    discount = (
        0.0 if d < 0.60
        else round(rng.uniform(5, 15), 1) if d < 0.90
        else round(rng.uniform(20, 50), 1)
    )
    total = round(quantity * unit_price * (1 - discount / 100), 2)
    return quantity, discount, total, round(total * 0.09, 2)


def make_transactions(
    n: int = 2000,
    seed: int = 7,
    n_customers: int = 200,
    n_products: int = 120,
    n_stores: int = 25,
) -> list[dict]:
    rng = random.Random(seed)
    customers = _customer_pool(rng, n_customers)
    products = _product_pool(rng, n_products)
    stores = _store_pool(rng, n_stores)
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for _ in range(n):
        customer = rng.choice(customers)
        product = rng.choice(products)

        # :273-289 channel stickiness + digital/in-store split
        channel = (
            customer["preferred_channel"]
            if rng.random() < PREFERRED_CHANNEL_PROB
            else rng.choices(CHANNELS, weights=CHANNEL_WEIGHTS)[0]
        )
        if channel in DIGITAL:
            store = None
            device = rng.choice(["android", "ios", "desktop", "tablet"])
            session = f"sess-{rng.getrandbits(48):012x}"
        else:
            store = rng.choice(stores)
            device, session = None, None

        # :292-305 location from store else customer's home region
        if store is not None:
            region, city, state = store["region"], store["city"], store["state"]
            store_id = store["store_id"]
        else:
            region = customer["home_region"]
            info = REGIONS[region]
            ci = rng.randrange(len(info["cities"]))
            city, state, store_id = info["cities"][ci], info["states"][ci], None

        quantity, discount, total, tax = _financials(rng, product["unit_price"])

        # :342-363 payment + status
        payment = rng.choices(PAYMENT_METHODS, weights=PAYMENT_WEIGHTS)[0]
        card = (
            rng.choices(CARD_NETWORKS, weights=CARD_WEIGHTS)[0]
            if payment in ("credit_card", "debit_card")
            else None
        )
        status = rng.choices(STATUSES, weights=STATUS_WEIGHTS)[0]

        # :380-385 fraud flag + bimodal score
        fraud = rng.random() < FRAUD_RATE
        score = round(
            rng.uniform(0.7, 1.0) if fraud else rng.uniform(0.0, 0.15), 4
        )
        ts = base + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 20))
        rows.append(
            {
                "transaction_id": str(uuid.UUID(int=rng.getrandbits(128))),
                "event_timestamp": ts,
                "processing_timestamp": ts,
                "customer_id": customer["customer_id"],
                "customer_tier": customer["customer_tier"],
                "product_id": product["product_id"],
                "product_name": product["product_name"],
                "category": product["category"],
                "sub_category": product["sub_category"],
                "brand": product["brand"],
                "quantity": quantity,
                "unit_price": product["unit_price"],
                "discount_percent": discount,
                "total_amount": total,
                "tax_amount": tax,
                "currency": "USD",
                "payment_method": payment,
                "card_network": card,
                "transaction_status": status,
                "channel": channel,
                "store_id": store_id,
                "region": region,
                "city": city,
                "state": state,
                "postal_code": f"{rng.randint(100000, 999999)}",
                "device_type": device,
                "session_id": session,
                "ip_address": f"{rng.randint(1, 255)}.{rng.randint(0, 255)}.xxx.xxx",
                "is_fraudulent": fraud,
                "fraud_score": score,
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
