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


def test_array_output_fails_locally(spark, sf_dir):
    """A query emitting an array column must fail the local harness —
    the external driver's pandas sort_values canonicalization raises
    ``unhashable type: 'list'`` on it and records NO verdict (the
    round-5 m06_payload_dedup failure). The flat-schema gate catches
    it before the raw-value canonicalization even runs."""

    def array_query(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.groupBy("event_type")
            .agg(F.array_sort(F.collect_set("user_id")).alias("users"))
        )

    oracle = """
        SELECT event_type, list_sort(list(DISTINCT user_id)) AS users
        FROM events GROUP BY event_type
    """
    with pytest.raises(AssertionError, match="non-scalar output columns"):
        compare(spark, sf_dir, "strict_array", array_query, oracle)


def test_driver_canon_rejects_raw_lists():
    """The canonicalization replica itself (bypassing the schema gate)
    must fail on list cells exactly like the driver's pandas sort."""
    from .oracle_harness import _driver_canon

    with pytest.raises(AssertionError, match="sort_values canonicalization"):
        _driver_canon("strict_canon", "spark", ["k", "v"],
                      [(1, [1, 2]), (2, [3])])
    out = _driver_canon("strict_canon", "spark", ["k", "v"],
                        [(2, "b"), (1, "a")])
    assert list(out["k"]) == [1, 2]
