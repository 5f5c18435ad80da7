"""Physical-layout queries (b30+): bucketing as a first-class operator.

The one shuffle every TPC-H-shaped workload pays over and over is
lineitem ⋈ orders. ``sources/bucketed.py`` moves it to write time;
b30 runs the full cycle — bucket both facts on the join key, join
WITHOUT an exchange, aggregate — and returns a result a plain SQL join
verifies, so the layout machinery is oracle-gated like every other
operator (the exchange-free plan itself is pinned by
tests/test_plans.py::test_bucketed_join_has_no_exchange).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.aggregates import dsum
from ..sources.batch import load_table
from ..sources.bucketed import colocated_fact_join
from .registry import query

_N_BUCKETS = 8

#: (applicationId, sf_dir) → staged join. A bucketed layout is a
#: write-once artifact: re-running b30 in the same session must REUSE
#: it, not write fresh fact-table copies into a new temp dir each call
#: (the DROP TABLE in write_bucketed only removes catalog metadata, so
#: un-memoized re-staging orphaned the previous data directories).
_STAGED: dict[tuple[str, str], DataFrame] = {}


def bucketed_lineitem_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located join itself (plan-testable): both facts bucketed
    into ``_N_BUCKETS`` on the order key, merge-join with no Exchange."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _STAGED.get(key)
    if cached is not None:
        return cached
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    base = tempfile.mkdtemp(prefix="sbp-bucketed-")
    joined = colocated_fact_join(
        spark,
        lineitem,
        orders,
        "l_orderkey",
        "o_orderkey",
        base,
        n_buckets=_N_BUCKETS,
        names=("sbp_bucketed_lineitem", "sbp_bucketed_orders"),
    )
    _STAGED[key] = joined
    return joined


@query(
    "b30_bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def b30_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority over the bucketed lineitem ⋈ orders
    join. Identical answer to the plain join (the oracle); the
    difference is WHERE the shuffle happens — once, at table-write time,
    instead of inside every query. At 100 TB this is the difference
    between an nightly-layout job and a per-query exabyte exchange."""
    joined = bucketed_lineitem_orders_join(spark, sf_dir)
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
        .orderBy("priority")
    )
