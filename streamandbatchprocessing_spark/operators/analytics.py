"""The 9 named analyses over the canonical transaction schema.

Parity target: reference ``analytics/AnalysisAggregator.scala`` — each
analysis is a pure ``DataFrame -> DataFrame`` function (AGENTS.md:772
composability contract) with the reference's exact output aliases
(AGENTS.md:797-1045), plus the dispatcher with its ``full_report``
fan-out (AnalysisAggregator.scala:14-50) and valid-name registry
(:52-62).

Scale deviations from the reference (behavior-preserving):
  * ``payment_analysis`` grand total uses a broadcast scalar-agg cross
    join instead of ``sum().over(Window.partitionBy())``
    (AnalysisAggregator.scala:112-119) — the empty-partition window
    funnels every group through ONE partition at scale.
  * ``full_report`` callers should cache/snapshot the filtered source
    before fanning out (see service/batch_job.py) instead of recomputing
    the scan per analysis (BatchJob.scala:76 recomputes it 8×).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.aggregates import pround

AnalysisFn = Callable[[DataFrame], DataFrame]

def _completed():
    # Lazy: building a Column requires an active SparkContext in PySpark 4.
    return F.col("transaction_status") == "completed"


def revenue_by_category(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:68-80."""
    return (
        df.filter(_completed())
        .groupBy("category")
        .agg(
            F.sum("total_amount").alias("total_revenue"),
            F.avg("total_amount").alias("avg_order_value"),
            F.count("transaction_id").alias("transaction_count"),
            F.sum("quantity").alias("total_units_sold"),
            F.avg("discount_percent").alias("avg_discount_pct"),
            F.countDistinct("customer_id").alias("unique_customers"),
        )
        .orderBy(F.desc("total_revenue"))
    )


def revenue_by_region(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:86-97."""
    return (
        df.filter(_completed())
        .groupBy("region", "city")
        .agg(
            F.sum("total_amount").alias("total_revenue"),
            F.count("transaction_id").alias("transaction_count"),
            F.avg("total_amount").alias("avg_order_value"),
            F.countDistinct("store_id").alias("active_stores"),
            F.countDistinct("customer_id").alias("unique_customers"),
        )
        .orderBy(F.desc("total_revenue"))
    )


def payment_analysis(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:103-121 — share-of-total via broadcast
    scalar agg rather than an empty-partition window (see module doc)."""
    agg = (
        df.filter(_completed())
        .groupBy("payment_method", "card_network")
        .agg(
            F.count("transaction_id").alias("transaction_count"),
            F.sum("total_amount").alias("total_revenue"),
            F.avg("total_amount").alias("avg_transaction_value"),
            F.countDistinct("customer_id").alias("unique_customers"),
        )
    )
    total = agg.agg(F.sum("total_revenue").alias("_grand_total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .withColumn(
            "revenue_share_pct",
            pround(F.col("total_revenue") / F.col("_grand_total") * 100, 2),
        )
        .drop("_grand_total")
        .orderBy(F.desc("transaction_count"))
    )


def customer_segmentation(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:127-155 — LTV metrics + when-chain
    segment bucketing with the reference thresholds."""
    metrics = (
        df.filter(_completed())
        .groupBy("customer_id", "customer_tier")
        .agg(
            F.sum("total_amount").alias("lifetime_value"),
            F.count("transaction_id").alias("total_transactions"),
            F.avg("total_amount").alias("avg_order_value"),
            F.max("event_timestamp").alias("last_purchase_date"),
            F.min("event_timestamp").alias("first_purchase_date"),
            F.countDistinct("category").alias("category_diversity"),
            F.sum(F.when(F.col("channel") == "mobile_app", 1).otherwise(0))
            .alias("mobile_orders"),
            F.sum(F.when(F.col("channel") == "web", 1).otherwise(0))
            .alias("web_orders"),
            F.sum(F.when(F.col("channel") == "pos_in_store", 1).otherwise(0))
            .alias("instore_orders"),
        )
    )
    segment = (
        F.when(F.col("lifetime_value") >= 10000, "vip")
        .when(F.col("lifetime_value") >= 5000, "high_value")
        .when(F.col("lifetime_value") >= 1000, "mid_value")
        .when(F.col("total_transactions") == 1, "one_time")
        .otherwise("low_value")
    )
    return metrics.withColumn("segment", segment).orderBy(F.desc("lifetime_value"))


def fraud_analysis(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:161-176 — disjunctive fraud predicate,
    4-key grid, collect_set of affected cities."""
    return (
        df.filter((F.col("is_fraudulent") == True) | (F.col("fraud_score") > 0.7))  # noqa: E712
        .groupBy("category", "region", "channel", "payment_method")
        .agg(
            F.count("transaction_id").alias("fraud_count"),
            F.sum("total_amount").alias("fraud_total_amount"),
            F.avg("fraud_score").alias("avg_fraud_score"),
            F.avg("total_amount").alias("avg_fraud_amount"),
            F.countDistinct("customer_id").alias("affected_customers"),
            F.collect_set("city").alias("affected_cities"),
        )
        .orderBy(F.desc("fraud_count"))
    )


def hourly_trends(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:182-195."""
    return (
        df.filter(_completed())
        .withColumn("event_date", F.to_date("event_timestamp"))
        .withColumn("event_hour", F.hour("event_timestamp"))
        .groupBy("event_date", "event_hour")
        .agg(
            F.count("transaction_id").alias("transaction_count"),
            F.sum("total_amount").alias("hourly_revenue"),
            F.avg("total_amount").alias("avg_order_value"),
            F.countDistinct("customer_id").alias("unique_customers"),
            F.sum("quantity").alias("units_sold"),
        )
        .orderBy("event_date", "event_hour")
    )


def channel_performance(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:201-219."""
    return (
        df.filter(_completed())
        .groupBy("channel")
        .agg(
            F.count("transaction_id").alias("transaction_count"),
            F.sum("total_amount").alias("total_revenue"),
            F.avg("total_amount").alias("avg_order_value"),
            F.countDistinct("customer_id").alias("unique_customers"),
            F.avg("discount_percent").alias("avg_discount"),
            F.sum(F.when(F.col("is_fraudulent") == True, 1).otherwise(0))  # noqa: E712
            .alias("fraud_count"),
            F.avg("fraud_score").alias("avg_fraud_score"),
        )
        .withColumn(
            "fraud_rate_pct",
            pround(F.col("fraud_count") / F.col("transaction_count") * 100, 4),
        )
        .orderBy(F.desc("total_revenue"))
    )


def realtime_dashboard(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:225-250 — streaming-only: watermark +
    sliding window; approx_count_distinct because exact distinct is
    unsupported in streaming aggregation (SURVEY.md A4/A5 split)."""
    return (
        df.filter(F.col("transaction_status").isin("completed", "pending"))
        .withWatermark("event_timestamp", "10 minutes")
        .groupBy(
            F.window("event_timestamp", "5 minutes", "1 minute"), F.col("category")
        )
        .agg(
            F.count("transaction_id").alias("txn_count"),
            F.sum("total_amount").alias("window_revenue"),
            F.avg("total_amount").alias("avg_order_value"),
            F.sum(F.when(F.col("is_fraudulent") == True, 1).otherwise(0))  # noqa: E712
            .alias("fraud_alerts"),
            F.approx_count_distinct("customer_id").alias("approx_unique_customers"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "category",
            "txn_count",
            "window_revenue",
            "avg_order_value",
            "fraud_alerts",
            "approx_unique_customers",
        )
    )


def inventory_velocity(df: DataFrame) -> DataFrame:
    """AnalysisAggregator.scala:256-285."""
    agg = (
        df.filter(_completed())
        .groupBy("product_id", "product_name", "category", "sub_category", "brand")
        .agg(
            F.sum("quantity").alias("total_units_sold"),
            F.count("transaction_id").alias("order_count"),
            F.sum("total_amount").alias("total_revenue"),
            F.avg("unit_price").alias("avg_selling_price"),
            F.avg("discount_percent").alias("avg_discount"),
            F.countDistinct("region").alias("regions_sold_in"),
            F.countDistinct("store_id").alias("stores_sold_in"),
            F.min("event_timestamp").alias("first_sale"),
            F.max("event_timestamp").alias("last_sale"),
        )
    )
    return (
        agg.withColumn(
            "days_in_range", F.datediff(F.col("last_sale"), F.col("first_sale")) + 1
        )
        .withColumn(
            "daily_velocity",
            pround(F.col("total_units_sold") / F.col("days_in_range"), 2),
        )
        .orderBy(F.desc("daily_velocity"))
    )


#: Batch analyses eligible for ``full_report`` fan-out (the streaming
#: dashboard is excluded, AnalysisAggregator.scala:36-46).
ANALYSES: dict[str, AnalysisFn] = {
    "revenue_by_category": revenue_by_category,
    "revenue_by_region": revenue_by_region,
    "payment_analysis": payment_analysis,
    "customer_segmentation": customer_segmentation,
    "fraud_analysis": fraud_analysis,
    "hourly_trends": hourly_trends,
    "channel_performance": channel_performance,
    "inventory_velocity": inventory_velocity,
}

VALID_ANALYSIS_TYPES: tuple[str, ...] = (*ANALYSES.keys(), "full_report")


def run_analysis(name: str, df: DataFrame) -> dict[str, DataFrame]:
    """Dispatcher (AnalysisAggregator.scala:14-50): one analysis by
    name, or all eight under ``full_report``. Returns name→DataFrame so
    the batch runner can persist each under ``aggregated/<name>/``."""
    if name == "full_report":
        return {key: fn(df) for key, fn in ANALYSES.items()}
    if name not in ANALYSES:
        raise ValueError(
            f"unknown analysisType {name!r}; valid: {VALID_ANALYSIS_TYPES}"
        )
    return {name: ANALYSES[name](df)}
