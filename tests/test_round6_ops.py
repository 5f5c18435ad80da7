"""Round-6 operator tests: scale-mode twins and estimator accuracy."""

from __future__ import annotations

from streamandbatchprocessing_spark.queries import QUERIES


def test_p12_approx_within_tolerance(spark, sf_dir):
    """The approx profile must agree with p11's exact profile on every
    exact column (n_rows, n_null, min/max renders) and estimate each
    cardinality within 5x the configured 2% rsd (HLL++ error is
    probabilistic; 10% is far outside plausible drift for these
    cardinalities and still catches a broken estimator)."""
    exact = {
        r["column_name"]: r
        for r in QUERIES["p11_column_profile"](spark, sf_dir).collect()
    }
    approx = {
        r["column_name"]: r
        for r in QUERIES["p12_column_profile_at_scale"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        assert (a["n_rows"], a["n_null"], a["min_s"], a["max_s"]) == (
            e["n_rows"], e["n_null"], e["min_s"], e["max_s"]
        ), col
        nd, est = e["n_distinct"], a["approx_distinct"]
        assert abs(est - nd) <= max(1, 0.10 * nd), (
            f"{col}: approx {est} vs exact {nd}"
        )
