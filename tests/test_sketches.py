"""Sketch accuracy + mergeability: HLL estimates within error bounds of
exact distinct, and partial sketches union to the same answer as a
single global sketch (the property that makes them scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamandbatchprocessing_spark.queries import QUERIES
from streamandbatchprocessing_spark.sources.batch import load_table


def test_hll_estimate_within_bounds(spark, sf_dir):
    rows = QUERIES["c06_hll_user_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert err < 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_hll_partials_union_to_global(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # sketch per event_type, then union the partials
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]
        .est
    )
    # Merge-then-estimate must agree with the one-pass sketch to within
    # sketch error (DataSketches unions may promote the internal
    # representation, so bit-equality only holds at small cardinalities).
    assert abs(merged - direct) / max(direct, 1) < 0.01, (merged, direct)
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05, (merged, exact)
