"""Every registered query must match its DuckDB oracle (driver replica).

Queries without an oracle (streaming/stateful) get a rows-run smoke
check instead.
"""

from __future__ import annotations

import pytest

from streamandbatchprocessing_spark.queries import ORACLES, QUERIES
from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    fn = QUERIES[name]
    if name in ORACLES:
        compare(spark, sf_dir, name, fn, ORACLES[name])
    else:
        df = fn(spark, sf_dir)
        assert df.count() >= 0
        assert df.columns
