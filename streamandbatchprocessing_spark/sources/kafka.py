"""Kafka streaming source/sink builders.

Parity target: reference S1/S2/S3/S11 (``StreamingJob.scala:30-36``
Kafka source with ``startingOffsets=latest``, ``failOnDataLoss=false``;
``Schemas.scala:44-48`` value decode). The builders only *declare* the
plan — the spark-sql-kafka connector JAR must be on the classpath at
start; environments without it (this harness) use the file-replay
source (streaming/pipeline.py) which yields an identical downstream
plan, so everything after the source is exercised either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import parse_kafka_value

DEFAULT_OPTIONS = {
    "startingOffsets": "latest",
    "failOnDataLoss": "false",
}


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Raw Kafka stream (key/value binary + metadata columns)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    for key, value in {**DEFAULT_OPTIONS, **(options or {})}.items():
        reader = reader.option(key, value)
    return reader.load()


def transaction_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Kafka → typed transaction rows (source + S2/S3 decode chain)."""
    return parse_kafka_value(kafka_stream(spark, bootstrap_servers, topic))
