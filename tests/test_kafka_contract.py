"""Kafka source contract (S1/T7) without a broker.

``sources/kafka.py`` only *declares* the plan; these tests pin the
declaration to ``StreamingJob.scala:30-42``: format=kafka, bootstrap
servers, subscribe topic, startingOffsets=latest, failOnDataLoss=false,
option-override path for source tuning (T7), and the decode chain from
a Kafka-shaped relation to typed transaction rows (S2/S3).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from streamandbatchprocessing_spark.schemas import TRANSACTION_SCHEMA
from streamandbatchprocessing_spark.sources import kafka as kafka_mod

from .factories import make_transactions


class _FakeReader:
    """Stands in for spark.readStream: records the declared plan."""

    def __init__(self, load_result=None):
        self.fmt = None
        self.options = {}
        self._load_result = load_result

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, key, value):
        self.options[key] = value
        return self

    def load(self):
        return self._load_result


class _FakeSpark:
    def __init__(self, reader):
        self.readStream = reader


def test_kafka_stream_declares_reference_options():
    reader = _FakeReader()
    kafka_mod.kafka_stream(_FakeSpark(reader), "broker1:9092,broker2:9092", "tx")
    assert reader.fmt == "kafka"
    assert reader.options["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert reader.options["subscribe"] == "tx"
    assert reader.options["startingOffsets"] == "latest"
    assert reader.options["failOnDataLoss"] == "false"


def test_kafka_stream_option_overrides_for_tuning():
    # T7: maxOffsetsPerTrigger etc. must pass through and may override
    # the defaults.
    reader = _FakeReader()
    kafka_mod.kafka_stream(
        _FakeSpark(reader),
        "b:9092",
        "tx",
        options={"maxOffsetsPerTrigger": "50000", "startingOffsets": "earliest"},
    )
    assert reader.options["maxOffsetsPerTrigger"] == "50000"
    assert reader.options["startingOffsets"] == "earliest"


def _kafka_shaped_df(spark, payloads):
    """A batch DataFrame with the Kafka source's wire schema."""
    rows = [
        (None, json.dumps(p, default=str).encode(), "tx", 0, i)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )


def test_transaction_stream_decode_chain(spark):
    # The full S1→S2/S3 chain against a Kafka-shaped relation: the fake
    # reader returns a batch DF with the connector's wire schema, so
    # everything downstream of .load() — the part we CAN run without a
    # broker — is exercised for real.
    payloads = make_transactions(n=25, seed=11)
    for p in payloads:
        p["event_timestamp"] = p["event_timestamp"].isoformat()
        p.pop("processing_timestamp")
        p.pop("event_date")
    reader = _FakeReader(load_result=_kafka_shaped_df(spark, payloads))
    out = kafka_mod.transaction_stream(_FakeSpark(reader), "b:9092", "tx")
    assert reader.fmt == "kafka"
    expected = {f.name for f in TRANSACTION_SCHEMA.fields}
    assert expected <= set(out.columns)
    collected = out.collect()
    assert len(collected) == 25
    by_id = {r["transaction_id"]: r for r in collected}
    for p in payloads:
        row = by_id[p["transaction_id"]]
        assert row["category"] == p["category"]
        assert float(row["total_amount"]) == p["total_amount"]
    # malformed rows must yield nulls, never exceptions (S2 contract)
    bad = _kafka_shaped_df(spark, [])
    bad = spark.createDataFrame(
        [(None, b"{not json", "tx", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    reader_bad = _FakeReader(load_result=bad)
    out_bad = kafka_mod.transaction_stream(_FakeSpark(reader_bad), "b", "t")
    assert out_bad.filter(F.col("transaction_id").isNull()).count() == 1
