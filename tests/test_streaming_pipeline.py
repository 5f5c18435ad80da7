"""Streaming pipeline tests (SURVEY.md §5 layer 3): the reference's
two-query pipeline replayed deterministically from files with an
availableNow trigger — raw append sink partitioned by event_date +
complete-mode dashboard — and the StreamManager lifecycle."""

from __future__ import annotations

import os

import pytest

from streamandbatchprocessing_spark.streaming.transactions import (
    StreamManager,
    start_transaction_pipeline,
)

from .factories import transactions_df


@pytest.fixture(scope="module")
def tx_source_dir(spark, tmp_path_factory):
    """Transactions parquet directory used as the replayable stream."""
    path = str(tmp_path_factory.mktemp("tx-stream-src"))
    transactions_df(spark, 800).drop("event_date", "processing_timestamp").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _file_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_pipeline_end_to_end(spark, tx_source_dir, tmp_path):
    base = str(tmp_path / "pipeline")
    queries = start_transaction_pipeline(
        spark,
        _file_stream(spark, tx_source_dir),
        base,
        trigger_available_now=True,
    )
    for q in queries:
        q.awaitTermination()

    raw = spark.read.parquet(os.path.join(base, "stream", "transactions"))
    assert raw.count() == 800
    # event_date materialized as a partition column
    assert "event_date" in raw.columns
    parts = [
        d for d in os.listdir(os.path.join(base, "stream", "transactions"))
        if d.startswith("event_date=")
    ]
    assert len(parts) > 1

    dash = spark.table("stream_aggregations")
    assert dash.count() > 0
    cols = set(dash.columns)
    assert {
        "window_start", "window_end", "category", "txn_count",
        "window_revenue", "fraud_alerts", "approx_unique_customers",
    } <= cols
    # sliding 5m/1m windows: every event lands in 5 windows
    total = dash.groupBy().sum("txn_count").collect()[0][0]
    filtered = raw.filter(
        raw.transaction_status.isin("completed", "pending")
    ).count()
    assert total == 5 * filtered


def test_stream_manager_lifecycle(spark, tx_source_dir, tmp_path):
    manager = StreamManager(
        spark,
        source_factory=lambda topic: _file_stream(spark, tx_source_dir),
        base_dir=str(tmp_path / "mgr"),
    )
    assert not manager.is_active()
    ids = manager.start(None)
    assert len(ids) == 2
    assert manager.is_active()
    status = manager.status()
    assert {q["name"] for q in status["queries"]} == {
        "raw_transactions",
        "stream_aggregations",
    }
    manager.stop()
    assert not manager.is_active()


def test_dedup_within_watermark_bounds_state(spark, sf_dir):
    # Same key set as the unbounded dedup (single availableNow pass over
    # the fixture: nothing ages past the watermark, so results match the
    # batch distinct), but the plan must carry the watermark-evicting
    # dedup operator, not the grow-forever one.
    from streamandbatchprocessing_spark.streaming.pipeline import (
        events_stream,
        run_to_memory,
        streaming_dedup_within_watermark_plan,
    )

    stream = events_stream(spark, sf_dir).select("user_id", "event_type", "ts")
    plan = streaming_dedup_within_watermark_plan(stream)
    logical = plan._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in logical, logical
    got = run_to_memory(plan, output_mode="append", name_prefix="ddww")
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
    )
    assert got.select("user_id", "event_type").distinct().count() == batch.count()


def test_foreach_batch_upsert_idempotent(spark, sf_dir, tmp_path):
    from streamandbatchprocessing_spark.streaming.pipeline import events_stream
    from streamandbatchprocessing_spark.streaming.transactions import (
        VersionedUpsertSink,
        foreach_batch_upsert,
    )
    from pyspark.sql import functions as F

    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = VersionedUpsertSink(["event_type"])
    q = foreach_batch_upsert(
        agg, sink, str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination()

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type").count().collect()
    )
    expected = {r.event_type: r["count"] for r in batch}
    got = {k[0]: v["n"] for k, v in sink.rows.items()}
    assert got == expected

    # replaying an already-applied epoch must not change the sink
    before = dict(sink.rows)
    for epoch in list(sink.applied_epochs):
        sink.upsert(spark.createDataFrame([("zzz", 999)], "event_type string, n long"), epoch)
    assert sink.rows == before
