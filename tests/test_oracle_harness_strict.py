"""The local harness must be driver-faithful on TYPES, not just values.

Round-1 lesson: the driver hashes a typed (arrow) materialization, so a
DuckDB HUGEINT column (any uncast ``SUM(CASE…)``) fails the driver even
when every value matches. ``fetchall()`` hides that class entirely —
these tests pin the harness so it can never regress to value-only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamandbatchprocessing_spark.sources.batch import load_table

from .oracle_harness import compare


def _countif_query(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.when(F.col("value") > 300, 1).otherwise(0)).alias("n_big")
    )


def test_uncast_sum_case_oracle_fails_locally(spark, sf_dir):
    """An oracle left as bare SUM(CASE…) (DuckDB HUGEINT) must fail the
    local harness even though fetchall() values are identical — this is
    exactly the round-1 local-green/driver-red class."""
    uncast = """
        SELECT SUM(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS n_big
        FROM events
    """
    with pytest.raises(AssertionError, match="type-class mismatch"):
        compare(spark, sf_dir, "strict_uncast", _countif_query, uncast)


def test_cast_sum_case_oracle_passes(spark, sf_dir):
    cast = """
        SELECT CAST(SUM(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_big
        FROM events
    """
    compare(spark, sf_dir, "strict_cast", _countif_query, cast)


def test_exposed_decimal_fails_locally(spark, sf_dir):
    """Queries must expose doubles, not decimals: Spark DecimalType and
    DuckDB DECIMAL materialize differently at the driver (Decimal objects
    vs float64), so the harness rejects an exposed decimal on either side."""

    def decimal_query(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        return ev.agg(
            F.sum(F.col("value").cast("decimal(25,6)")).alias("total")
        )

    oracle = "SELECT CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total FROM events"
    with pytest.raises(AssertionError, match="type-class mismatch"):
        compare(spark, sf_dir, "strict_decimal", decimal_query, oracle)
