"""Bucketed table layout — the write-once shuffle that buys shuffle-free
joins forever.

At 100 TB the dominant cost of a fact⋈fact join (lineitem ⋈ orders) is
shuffling BOTH sides on the key for every query that joins them.
Bucketing moves that shuffle to WRITE time: both tables are hashed into
the same number of buckets on the join key, so any later equi-join on
that key is already co-partitioned — the planner drops the Exchange on
both sides (and with ``sortBy`` + one file per bucket, the Sort too).
This is Spark's native bucketing (``DataFrameWriter.bucketBy`` →
catalog-tracked layout), not Hive's.

Reference parity: the reference has no physical-layout control at all
(its Delta writes are partition-only, ``SparkManager.scala:28-37``) —
this module is part of the 100-TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
) -> DataFrame:
    """Write ``df`` as a bucketed+sorted external parquet table and
    return the catalog-backed read.

    The pre-write ``repartition(n_buckets, bucket_col)`` makes each task
    own exactly one bucket, so every bucket lands in ONE file — that is
    what lets the reader keep the per-bucket sort order (multiple files
    per bucket forces a re-Sort under SMJ) and what avoids the
    small-files problem (tasks × buckets outputs) at scale.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def colocated_fact_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    base_dir: str,
    n_buckets: int = 8,
    names: tuple[str, str] = ("sbp_bucketed_left", "sbp_bucketed_right"),
) -> DataFrame:
    """Bucket both fact inputs on their join keys and return the
    co-located equi-join.

    The ``merge`` hint pins SortMergeJoin: broadcasting a fact side only
    works at toy scale (the b02/b03 lesson), and the whole point here is
    the exchange-free SMJ that bucketing makes possible. Plan contract
    (asserted in tests/test_plans.py): SortMergeJoin with NO Exchange on
    either side.
    """
    lt = write_bucketed(left, names[0], left_key, n_buckets, f"{base_dir}/{names[0]}")
    rt = write_bucketed(right, names[1], right_key, n_buckets, f"{base_dir}/{names[1]}")
    return lt.hint("merge").join(rt, lt[left_key] == rt[right_key])
