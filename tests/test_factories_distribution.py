"""The transaction factory must reproduce the reference generator's
distributions (kafka_stream_generator.py:46-188, :273-422), not just its
schema — the analyses' selectivities (completed filter, fraud rate,
channel mix) only mean something on reference-shaped data.
"""

from __future__ import annotations

from collections import Counter

from .factories import (
    CATEGORIES,
    CHANNEL_WEIGHTS,
    CHANNELS,
    PAYMENT_METHODS,
    PAYMENT_WEIGHTS,
    REGIONS,
    STATUS_WEIGHTS,
    STATUSES,
    make_transactions,
)

N = 30000
# n_stores high enough that the store pool's realized region mix (a
# finite-pool effect the reference generator has too) stays near the
# configured weights.
ROWS = make_transactions(n=N, seed=13, n_customers=2000, n_products=1000,
                         n_stores=500)


def _freq(key):
    c = Counter(r[key] for r in ROWS)
    return {k: v / N for k, v in c.items()}


def test_status_distribution():
    f = _freq("transaction_status")
    for status, w in zip(STATUSES, STATUS_WEIGHTS):
        assert abs(f.get(status, 0.0) - w) < 0.01, (status, f.get(status), w)


def test_payment_distribution():
    f = _freq("payment_method")
    for method, w in zip(PAYMENT_METHODS, PAYMENT_WEIGHTS):
        assert abs(f.get(method, 0.0) - w) < 0.02, (method, f.get(method), w)


def test_channel_distribution_with_stickiness():
    # Channels pass through customer preference (0.7 sticky) but the
    # marginal distribution still converges to the channel weights.
    f = _freq("channel")
    for channel, w in zip(CHANNELS, CHANNEL_WEIGHTS):
        assert abs(f.get(channel, 0.0) - w) < 0.03, (channel, f.get(channel), w)


def test_category_distribution_and_price_ranges():
    f = _freq("category")
    for cat, info in CATEGORIES.items():
        # product pool is finite (1000 SKUs) → looser tolerance
        assert abs(f.get(cat, 0.0) - info["weight"]) < 0.04, (cat, f.get(cat))
    for r in ROWS:
        lo, hi = CATEGORIES[r["category"]]["price_range"]
        assert lo <= r["unit_price"] <= hi


def test_region_distribution():
    f = _freq("region")
    for region, info in REGIONS.items():
        assert abs(f.get(region, 0.0) - info["weight"]) < 0.03, (region, f.get(region))


def test_fraud_rate_and_score_bimodality():
    fraud = [r for r in ROWS if r["is_fraudulent"]]
    assert abs(len(fraud) / N - 0.02) < 0.005
    assert all(r["fraud_score"] >= 0.7 for r in fraud)
    assert all(r["fraud_score"] <= 0.15 for r in ROWS if not r["is_fraudulent"])


def test_quantity_and_discount_splits():
    q = Counter(r["quantity"] for r in ROWS)
    assert abs(q[1] / N - 0.70) < 0.01
    assert abs(q[2] / N - 0.20) < 0.01
    assert abs((q[3] + q[4] + q[5]) / N - 0.10) < 0.01
    no_disc = sum(1 for r in ROWS if r["discount_percent"] == 0.0) / N
    small = sum(1 for r in ROWS if 5 <= r["discount_percent"] <= 15) / N
    big = sum(1 for r in ROWS if r["discount_percent"] >= 20) / N
    assert abs(no_disc - 0.60) < 0.01
    assert abs(small - 0.30) < 0.01
    assert abs(big - 0.10) < 0.01


def test_channel_consistency_fields():
    for r in ROWS:
        if r["channel"] in ("web", "mobile_app", "marketplace"):
            assert r["store_id"] is None
            assert r["session_id"] is not None and r["device_type"] is not None
        else:
            assert r["store_id"] is not None
            assert r["session_id"] is None and r["device_type"] is None


def test_deterministic_given_seed():
    a = make_transactions(n=50, seed=99)
    b = make_transactions(n=50, seed=99)
    assert a == b
