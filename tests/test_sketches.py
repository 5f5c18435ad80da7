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


def test_quantile_sketch_rank_error_bound(spark, sf_dir):
    """GK percentile_approx(accuracy=10000) guarantees rank error
    ≤ n/accuracy: the true rank of each approximate quantile must sit
    within q ± 1/10000 (plus one-row discreteness slack) of its target."""
    rows = QUERIES["c11_quantile_sketch"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    for r in rows:
        vals = [
            x["value"]
            for x in ev.filter(F.col("event_type") == r["event_type"])
            .select("value")
            .collect()
            if x["value"] is not None  # sketch population excludes nulls
        ]
        vals.sort()
        n = len(vals)
        assert n == r["n"]
        for q, col in ((0.5, "approx_p50"), (0.95, "approx_p95"),
                       (0.99, "approx_p99")):
            rank = sum(1 for v in vals if v <= r[col]) / n
            slack = 1.0 / 10000 + 1.0 / n
            assert q - slack <= rank <= q + slack, (
                r["event_type"], col, rank, q)


def test_quantile_sketch_bound_holds_under_any_partitioning(spark, sf_dir):
    """The sketch's 100-TB property: partial summaries built per
    partition merge into a global estimate whose RANK-ERROR BOUND still
    holds. The merged estimate is NOT bit-identical to a single-scan
    sketch (GK compression depends on merge order — at sf0.1 the two
    differ in the decimals), so the contract to pin is the bound, under
    adversarial partitionings."""
    ev = load_table(spark, sf_dir, "events")
    vals = sorted(
        r["value"] for r in ev.select("value").collect()
        if r["value"] is not None
    )
    n = len(vals)
    slack = 1.0 / 10000 + 1.0 / n
    for parts, key in ((8, "user_id"), (32, "event_id"), (2, "event_type")):
        est = (
            ev.repartition(parts, key)
            .agg(F.expr("percentile_approx(value, 0.95D, 10000)").alias("g"))
            .first()["g"]
        )
        rank = sum(1 for v in vals if v <= est) / n
        assert 0.95 - slack <= rank <= 0.95 + slack, (parts, key, rank)


def test_quantile_oracle_bit_exact_in_exact_regime(spark):
    """c11's driver oracle contract: in the GK exact regime (per-group
    n < accuracy/2) ``percentile_approx`` retains every sample — any
    partitioning — and equals DuckDB ``quantile_disc`` bit-for-bit,
    while Spark's exact ``percentile`` (R-7 interpolation) equals
    ``quantile_cont``. Pinned at both exact-regime SFs, including the
    driver's sf0.01 gate."""
    from streamandbatchprocessing_spark.queries import ORACLES

    from .oracle_harness import compare

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        compare(
            spark, sf, "c11_quantile_sketch",
            QUERIES["c11_quantile_sketch"], ORACLES["c11_quantile_sketch"],
        )
