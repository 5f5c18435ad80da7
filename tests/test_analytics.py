"""Parity-layer tests: each reference analysis
(operators/analytics.py) against a DuckDB oracle over the *same*
synthetic transaction rows. Float aggregates use tolerant comparison
here (the parity layer keeps the reference's plain double sums; the
correctness-gated fixture queries use exact decimal accumulation
instead)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from streamandbatchprocessing_spark.operators import analytics

from .factories import make_transactions, transactions_df

N = 2000


@pytest.fixture(scope="module")
def tx_df(spark):
    df = transactions_df(spark, N)
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.register("tx", pd.DataFrame(make_transactions(N)))
    return con


def _assert_close(name, spark_rows, duck_rows, key_cols):
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    skey = {tuple(r[k] for k in key_cols): r for r in spark_rows}
    dkey = {tuple(r[k] for k in key_cols): r for r in duck_rows}
    assert skey.keys() == dkey.keys(), f"{name}: group keys differ"
    for key, srow in skey.items():
        drow = dkey[key]
        for col, sval in srow.items():
            dval = drow[col]
            if isinstance(sval, float) and isinstance(dval, float):
                assert math.isclose(sval, dval, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}[{key}].{col}: {sval} != {dval}"
                )
            elif isinstance(sval, (list, tuple)):
                assert sorted(sval) == sorted(dval), f"{name}[{key}].{col}"
            else:
                assert sval == dval, f"{name}[{key}].{col}: {sval} != {dval}"


def _rows(df):
    return [r.asDict() for r in df.collect()]


def _duck(con, sql):
    res = con.sql(sql)
    cols = res.columns
    return [dict(zip(cols, row)) for row in res.fetchall()]


def test_revenue_by_category(tx_df, oracle_con):
    got = _rows(analytics.revenue_by_category(tx_df))
    exp = _duck(oracle_con, """
        SELECT category, SUM(total_amount) total_revenue,
               AVG(total_amount) avg_order_value,
               COUNT(transaction_id) transaction_count,
               SUM(quantity) total_units_sold,
               AVG(discount_percent) avg_discount_pct,
               COUNT(DISTINCT customer_id) unique_customers
        FROM tx WHERE transaction_status='completed' GROUP BY category""")
    _assert_close("revenue_by_category", got, exp, ["category"])


def test_revenue_by_region(tx_df, oracle_con):
    got = _rows(analytics.revenue_by_region(tx_df))
    exp = _duck(oracle_con, """
        SELECT region, city, SUM(total_amount) total_revenue,
               COUNT(transaction_id) transaction_count,
               AVG(total_amount) avg_order_value,
               COUNT(DISTINCT store_id) active_stores,
               COUNT(DISTINCT customer_id) unique_customers
        FROM tx WHERE transaction_status='completed' GROUP BY region, city""")
    _assert_close("revenue_by_region", got, exp, ["region", "city"])


def test_payment_analysis(tx_df, oracle_con):
    got = _rows(analytics.payment_analysis(tx_df))
    exp = _duck(oracle_con, """
        WITH agg AS (
          SELECT payment_method, card_network,
                 COUNT(transaction_id) transaction_count,
                 SUM(total_amount) total_revenue,
                 AVG(total_amount) avg_transaction_value,
                 COUNT(DISTINCT customer_id) unique_customers
          FROM tx WHERE transaction_status='completed'
          GROUP BY payment_method, card_network)
        SELECT *, floor((total_revenue / SUM(total_revenue) OVER () * 100) * 100.0 + 0.5) / 100.0
               AS revenue_share_pct FROM agg""")
    _assert_close("payment_analysis", got, exp, ["payment_method", "card_network"])


def test_customer_segmentation(tx_df, oracle_con):
    got = _rows(analytics.customer_segmentation(tx_df))
    exp = _duck(oracle_con, """
        WITH m AS (
          SELECT customer_id, customer_tier,
                 SUM(total_amount) lifetime_value,
                 COUNT(transaction_id) total_transactions,
                 AVG(total_amount) avg_order_value,
                 MAX(event_timestamp) last_purchase_date,
                 MIN(event_timestamp) first_purchase_date,
                 COUNT(DISTINCT category) category_diversity,
                 SUM(CASE WHEN channel='mobile_app' THEN 1 ELSE 0 END) mobile_orders,
                 SUM(CASE WHEN channel='web' THEN 1 ELSE 0 END) web_orders,
                 SUM(CASE WHEN channel='pos_in_store' THEN 1 ELSE 0 END) instore_orders
          FROM tx WHERE transaction_status='completed'
          GROUP BY customer_id, customer_tier)
        SELECT *, CASE WHEN lifetime_value >= 10000 THEN 'vip'
                       WHEN lifetime_value >= 5000 THEN 'high_value'
                       WHEN lifetime_value >= 1000 THEN 'mid_value'
                       WHEN total_transactions = 1 THEN 'one_time'
                       ELSE 'low_value' END AS segment FROM m""")
    _assert_close(
        "customer_segmentation", got, exp, ["customer_id", "customer_tier"]
    )


def test_fraud_analysis(tx_df, oracle_con):
    from pyspark.sql import functions as F

    got = _rows(
        analytics.fraud_analysis(tx_df).withColumn(
            "affected_cities", F.sort_array("affected_cities")
        )
    )
    exp = _duck(oracle_con, """
        SELECT category, region, channel, payment_method,
               COUNT(transaction_id) fraud_count,
               SUM(total_amount) fraud_total_amount,
               AVG(fraud_score) avg_fraud_score,
               AVG(total_amount) avg_fraud_amount,
               COUNT(DISTINCT customer_id) affected_customers,
               list_sort(list(DISTINCT city)) affected_cities
        FROM tx WHERE is_fraudulent = true OR fraud_score > 0.7
        GROUP BY category, region, channel, payment_method""")
    _assert_close(
        "fraud_analysis", got, exp, ["category", "region", "channel", "payment_method"]
    )


def test_hourly_trends(tx_df, oracle_con):
    got = _rows(analytics.hourly_trends(tx_df))
    exp = _duck(oracle_con, """
        SELECT CAST(event_timestamp AS DATE) event_date,
               CAST(hour(event_timestamp) AS INT) event_hour,
               COUNT(transaction_id) transaction_count,
               SUM(total_amount) hourly_revenue,
               AVG(total_amount) avg_order_value,
               COUNT(DISTINCT customer_id) unique_customers,
               SUM(quantity) units_sold
        FROM tx WHERE transaction_status='completed' GROUP BY 1, 2""")
    _assert_close("hourly_trends", got, exp, ["event_date", "event_hour"])


def test_channel_performance(tx_df, oracle_con):
    got = _rows(analytics.channel_performance(tx_df))
    exp = _duck(oracle_con, """
        WITH agg AS (
          SELECT channel, COUNT(transaction_id) transaction_count,
                 SUM(total_amount) total_revenue,
                 AVG(total_amount) avg_order_value,
                 COUNT(DISTINCT customer_id) unique_customers,
                 AVG(discount_percent) avg_discount,
                 SUM(CASE WHEN is_fraudulent THEN 1 ELSE 0 END) fraud_count,
                 AVG(fraud_score) avg_fraud_score
          FROM tx WHERE transaction_status='completed' GROUP BY channel)
        SELECT *, floor((fraud_count * 1.0 / transaction_count * 100) * 10000.0 + 0.5) / 10000.0
               AS fraud_rate_pct FROM agg""")
    _assert_close("channel_performance", got, exp, ["channel"])


def test_inventory_velocity(tx_df, oracle_con):
    got = _rows(analytics.inventory_velocity(tx_df))
    exp = _duck(oracle_con, """
        WITH agg AS (
          SELECT product_id, product_name, category, sub_category, brand,
                 SUM(quantity) total_units_sold,
                 COUNT(transaction_id) order_count,
                 SUM(total_amount) total_revenue,
                 AVG(unit_price) avg_selling_price,
                 AVG(discount_percent) avg_discount,
                 COUNT(DISTINCT region) regions_sold_in,
                 COUNT(DISTINCT store_id) stores_sold_in,
                 MIN(event_timestamp) first_sale,
                 MAX(event_timestamp) last_sale
          FROM tx WHERE transaction_status='completed'
          GROUP BY product_id, product_name, category, sub_category, brand)
        SELECT *,
               CAST(datediff('day', CAST(first_sale AS DATE),
                             CAST(last_sale AS DATE)) + 1 AS INT) days_in_range,
               floor((total_units_sold * 1.0
                     / (datediff('day', CAST(first_sale AS DATE),
                                 CAST(last_sale AS DATE)) + 1)) * 100.0 + 0.5) / 100.0 daily_velocity
        FROM agg""")
    _assert_close(
        "inventory_velocity",
        got,
        exp,
        ["product_id", "product_name", "category", "sub_category", "brand"],
    )


def test_dispatcher_full_report(tx_df):
    results = analytics.run_analysis("full_report", tx_df)
    assert set(results) == set(analytics.ANALYSES)
    for df in results.values():
        assert df.count() > 0


def test_dispatcher_rejects_unknown(tx_df):
    with pytest.raises(ValueError, match="unknown analysisType"):
        analytics.run_analysis("nope", tx_df)


def test_kafka_parse_malformed_nulls_never_fails(spark):
    """S2+S3 semantics (Schemas.scala:44-48): CAST + from_json against
    the declared schema — wrong types and outright garbage become null
    fields/rows, never exceptions; the stream keeps flowing."""
    from streamandbatchprocessing_spark.schemas import parse_kafka_value

    from pyspark.sql import functions as F

    payloads = [
        ('{"transaction_id": "t1", "quantity": 3, "total_amount": 9.5}',),
        ('{"transaction_id": "t2", "quantity": "NOT_A_NUMBER"}',),
        ("not json at all {{{",),
        (None,),
    ]
    raw = spark.createDataFrame(payloads, "value string").select(
        F.col("value").cast("binary").alias("value")
    )
    parsed = parse_kafka_value(raw)
    rows = parsed.collect()
    assert len(rows) == 4  # no row is dropped, nothing throws
    by_id = {r.transaction_id: r for r in rows}
    assert by_id["t1"].quantity == 3 and by_id["t1"].total_amount == 9.5
    assert by_id["t2"].quantity is None  # type mismatch → null field
    assert None in by_id  # garbage/null → fully-null row


def test_g13_micro_mean_quantizes_exact_half_boundaries(spark):
    """g13's per-minute mean is quantized in integer micro-unit
    arithmetic, not round(double, 6): an EXACT .5 boundary mean must
    round half-away-from-zero on both engines by construction. A double
    round can quantize such a boundary differently between Spark
    (BigDecimal HALF_UP on the exact binary expansion) and DuckDB
    (scaled-double rounding) — this pins the portable behavior."""
    from decimal import Decimal

    import duckdb
    from pyspark.sql import functions as F

    from streamandbatchprocessing_spark.queries.relational_ext import (
        _MICRO_MEAN_SQL,
    )

    # (s6 micro-units, n) -> expected 6-dp mean, including exact .5
    # boundaries in both signs and a truncation case.
    cases = [
        (2000003, 2, Decimal("1.000002")),   # 1.0000015 -> half up
        (-2000003, 2, Decimal("-1.000002")),  # away from zero
        (2000001, 2, Decimal("1.000001")),   # 1.0000005 -> half up
        (7, 3, Decimal("0.000002")),         # 2.33 micro -> nearest
        (0, 5, Decimal("0.000000")),
    ]
    sdf = spark.createDataFrame(
        [(s6, n) for s6, n, _ in cases], "s6 long, n_vals long"
    ).select(F.expr(_MICRO_MEAN_SQL).alias("m"))
    got = [r["m"] for r in sdf.collect()]
    assert got == [exp for _, _, exp in cases], got

    duck_sql = _MICRO_MEAN_SQL.replace(" DIV ", " // ")
    con = duckdb.connect()
    con.sql("CREATE TABLE t (s6 BIGINT, n_vals BIGINT)")
    for s6, n, _ in cases:
        con.sql(f"INSERT INTO t VALUES ({s6}, {n})")
    duck = [r[0] for r in con.sql(f"SELECT {duck_sql} FROM t").fetchall()]
    assert duck == [exp for _, _, exp in cases], duck
