"""Every registered query must match its DuckDB oracle (driver replica).

Queries without an oracle (streaming/stateful) get a rows-run smoke
check instead.
"""

from __future__ import annotations

import pytest

from streamandbatchprocessing_spark.queries import ORACLES, QUERIES
from .oracle_harness import assert_flat_output_schema, compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    fn = QUERIES[name]
    if name in (
        "c07_dup_clusters", "c17_cluster_canonical_keep_best"
    ) and sf_dir.rstrip("/").endswith("sf0.1"):
        # The Spark side scales (26 s at sf0.1: iterative label
        # propagation); the DuckDB *oracle* does not — its recursive-CTE
        # transitive closure is quadratic in cluster size and the sf0.1
        # corpus forms near-cliques of thousands. The driver's gate runs
        # at sf0.01, where the fixpoint completes in seconds.
        pytest.skip("c07 oracle CTE is quadratic in cluster size at sf0.1")
    if name in (
        "c11_quantile_sketch", "f10_streaming_quantiles"
    ) and sf_dir.rstrip("/").endswith("sf0.1"):
        # The quantile_disc oracles are valid only in the GK sketch's
        # exact regime (per-group n < accuracy/2 = 5000). sf0.001/0.01
        # — including the driver's sf0.01 gate — are exact (n≈200/2000);
        # at sf0.1 (n≈20000) the estimate is legitimately approximate
        # and only the rank-error bound (tests/test_sketches.py) holds.
        pytest.skip("quantile oracle valid only in the GK exact regime")
    if name in ORACLES:
        compare(spark, sf_dir, name, fn, ORACLES[name])
    else:
        df = fn(spark, sf_dir)
        # Rows-only queries are still materialized by the driver: their
        # output must canonicalize too (no array/map/struct columns).
        assert_flat_output_schema(name, df)
        assert df.count() >= 0
        assert df.columns
