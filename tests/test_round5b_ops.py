"""Property tests for the mid-round-5 operator additions, beyond their
strict oracles: sketch guarantees (c12), LM-score semantics (e13),
grid/interpolation invariants (g19), SCD2 interval algebra (g20),
outer-join completeness (f12), and profile consistency (p11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamandbatchprocessing_spark.queries import QUERIES
from streamandbatchprocessing_spark.sources.batch import load_table


def test_c12_cms_never_undercounts_and_bounds_error(spark, sf_dir):
    """The count-min guarantee: est >= true for EVERY key (collisions
    only add), and the aggregate overcount is bounded by the collision
    mass total/width per depth row."""
    import pytest

    rows = QUERIES["c12_heavy_hitters_cms"](spark, sf_dir).collect()
    if not rows:
        # the driver regenerates fixtures between rounds; a much higher
        # user cardinality would leave no key above the share threshold
        # (the oracle gate stays meaningful — both engines emit 0 rows)
        pytest.skip("no key exceeds the heavy-hitter share threshold")
    total = (
        load_table(spark, sf_dir, "events").count()
    )
    from streamandbatchprocessing_spark.queries.dedup import _CMS_W

    for r in rows:
        assert r["est_n"] >= r["true_n"], r
        # Markov bound is in expectation; 8x slack makes it a hard test
        assert r["est_n"] - r["true_n"] <= 8 * total / _CMS_W, r


def test_e13_lm_scores_are_negative_and_count_bigrams(spark, sf_dir):
    """Smoothed bigram log-probs are strictly negative, and every doc
    with n >= 2 tokens contributes exactly n-1 bigrams."""
    got = {
        r["doc_id"]: r
        for r in QUERIES["e13_bigram_lm_scores"](spark, sf_dir).collect()
    }
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    for d in docs:
        if d["n"] >= 2:
            assert got[d["doc_id"]]["n_bigrams"] == d["n"] - 1
        else:
            assert d["doc_id"] not in got
    assert all(r["avg_logprob"] < 0 for r in got.values())


def test_g19_grid_is_dense_and_interpolation_bounded(spark, sf_dir):
    """The output covers every hour between each type's first and last
    observed hour (no holes, no value NULLs), gap rows carry
    interpolated values between their neighbors' range, and non-gap
    hours reproduce the actual hourly mean."""
    rows = QUERIES["g19_gap_fill_interpolate"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for t, rs in by_type.items():
        hours = [r["hour_start"] for r in rs]
        spans = (hours[-1] - hours[0]).total_seconds() / 3600
        assert len(rs) == int(spans) + 1, f"{t}: grid not dense"
        assert all(r["value"] is not None for r in rs)
        # edges are observed hours by construction
        assert not rs[0]["is_gap"] and not rs[-1]["is_gap"]
        for i, r in enumerate(rs):
            if r["is_gap"]:
                assert r["n_events"] == 0
                prev = next(
                    x for x in reversed(rs[:i]) if not x["is_gap"]
                )
                nxt = next(x for x in rs[i + 1:] if not x["is_gap"])
                lo = min(prev["value"], nxt["value"])
                hi = max(prev["value"], nxt["value"])
                assert lo - 1e-6 <= r["value"] <= hi + 1e-6, (t, i, r)


def test_g20_scd2_intervals_tile_each_customer(spark, sf_dir):
    """Versions are contiguous from 1, each interval closes exactly
    where the next opens, priorities actually CHANGE across consecutive
    versions, and exactly one open (current) version per customer."""
    rows = QUERIES["g20_scd2_priority_history"](spark, sf_dir).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    assert by_cust
    for cust, rs in by_cust.items():
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r["is_current"] for r in rs) == 1
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], (cust, a, b)
            assert a["o_orderpriority"] != b["o_orderpriority"], (cust, a)
            assert a["valid_from"] <= a["valid_to"]


def test_f12_full_outer_is_inner_plus_both_orphan_sides(spark, sf_dir):
    """Row-level completeness against the batch truth: the full-outer
    result must be exactly inner ∪ unmatched-purchases ∪ unmatched-
    clicks, all non-null pairs matching the interval condition."""
    got = QUERIES["f12_stream_full_outer_join"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    inner = {
        (r["pid"], r["cid"])
        for r in p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("cts") <= F.col("pts")),
        ).collect()
    }
    got_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in got
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    assert got_pairs == inner
    matched_p = {a for a, _ in inner}
    matched_c = {b for _, b in inner}
    all_p = {r["pid"] for r in p.collect()}
    all_c = {r["cid"] for r in c.collect()}
    assert {
        r["purchase_id"] for r in got if r["click_id"] is None
    } == all_p - matched_p
    assert {
        r["click_id"] for r in got if r["purchase_id"] is None
    } == all_c - matched_c


def test_p11_profile_matches_direct_aggregates(spark, sf_dir):
    """Spot-check the unpivoted profile against directly-computed
    statistics for one numeric and one string column."""
    prof = {
        r["column_name"]: r
        for r in QUERIES["p11_column_profile"](spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    assert set(prof) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    }
    # min <= max must compare in each column's own domain: numeric
    # renderings are NOT lexicographically ordered ('10' < '2'), only
    # timestamps (fixed-width sortable format) and plain strings are.
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    for name, r in prof.items():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 1 <= r["n_distinct"] <= n
        if name in numeric:
            assert float(r["min_s"]) <= float(r["max_s"])
        else:
            assert r["min_s"] <= r["max_s"]
    direct = orders.agg(
        F.countDistinct("o_custkey").alias("nd"),
        F.min("o_custkey").alias("mn"),
        F.max("o_custkey").alias("mx"),
    ).collect()[0]
    assert prof["o_custkey"]["n_distinct"] == direct["nd"]
    assert prof["o_custkey"]["min_s"] == str(direct["mn"])
    assert prof["o_custkey"]["max_s"] == str(direct["mx"])
    statuses = {
        r["o_orderstatus"]
        for r in orders.select("o_orderstatus").distinct().collect()
    }
    assert prof["o_orderstatus"]["n_distinct"] == len(statuses)
    assert prof["o_orderstatus"]["min_s"] == min(statuses)
    assert prof["o_orderstatus"]["max_s"] == max(statuses)


def test_d09_recall_bounds_and_consistency(spark, sf_dir):
    """Recall must be a true ratio: 0 <= n_hits <= n_truth <= k, one
    row per panel query, and every hit must actually be a brute-force
    ground-truth neighbor that the ANN side also returned."""
    rows = QUERIES["d09_ann_recall_eval"](spark, sf_dir).collect()
    from streamandbatchprocessing_spark.queries.similarity import (
        _REC_K,
        _REC_NQ,
    )

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == min(_REC_NQ, n_vecs)
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_truth"] <= _REC_K
        assert abs(r["recall"] - r["n_hits"] / r["n_truth"]) < 1e-6


def test_c13_bloom_has_no_false_negatives_and_is_nonvacuous(spark, sf_dir):
    """The Bloom guarantee: every exact duplicate MUST be a bloom hit
    (no false negatives, ever); and the fixture must actually exercise
    the hit path (a key choice that yields all-false verdicts would
    make the oracle gate vacuous)."""
    import pytest

    rows = QUERIES["c13_bloom_prefilter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["exact_dup"]:
            assert r["bloom_hit"], r
        assert r["false_positive"] == (r["bloom_hit"] and not r["exact_dup"])
    if not any(r["exact_dup"] for r in rows):
        # non-vacuity depends on the generated corpus sharing opening
        # passages across the mod-10 split (true for every fixture so
        # far); a regenerated fixture without collisions degrades to
        # the invariant checks above rather than failing the suite
        pytest.skip("fixture has no cross-split opening-passage dup")


def test_e14_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(n_distinct) (uniform maximizes entropy), H == 0
    iff the doc repeats a single token, and counts are consistent."""
    import math

    rows = QUERIES["e14_token_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert -1e-6 <= r["entropy"] <= math.log(r["n_distinct"]) + 1e-6, r
        if r["n_distinct"] == 1:
            assert abs(r["entropy"]) < 1e-6


def test_g21_zscore_matches_trailing_window_recompute(spark, sf_dir):
    """Each z-score must reproduce from the emitted series itself: the
    baseline is exactly the trailing 24 observed hours strictly before
    the scored hour, and z = (v - mean) / stddev over that baseline."""
    import math

    rows = QUERIES["g21_rolling_zscore_anomaly"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    scored = 0
    for rs in by_type.values():
        series = [
            (int(r["hour_start"].timestamp() // 3600), r["value"], r)
            for r in rs
        ]
        for i, (h, v, r) in enumerate(series):
            base = [bv for bh, bv, _ in series[:i] if h - 24 <= bh <= h - 1]
            if len(base) < 6:
                assert r["zscore"] is None and r["is_anomaly"] is None
                continue
            mean = sum(base) / len(base)
            var = sum((b - mean) ** 2 for b in base) / (len(base) - 1)
            if var <= 0:
                assert r["zscore"] is None
                continue
            z = (v - mean) / math.sqrt(var)
            assert abs(r["zscore"] - z) < 1e-4, (r, z)
            assert r["is_anomaly"] == (abs(z) > 3.0) or abs(abs(z) - 3.0) < 1e-4
            assert r["baseline_n"] == len(base)
            scored += 1
    if scored == 0:
        import pytest

        pytest.skip("fixture series too short to score any hour")
