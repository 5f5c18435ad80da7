"""Analytic candidate-stream census for the pair-producing queries
(round 11, the round-10 verdict's #1: extend the 100x probe to the
emission-bounded c18/c20 — the caps bound their OUTPUT, so the one
remaining scale unknown is the CANDIDATE STREAM itself).

Materializing the stream at sf10 is not an option on this host (the
r9 sf1.0 measurements put c20's banded stream at 782 M pairs; the
fixture's 30-token vocabulary densifies band collisions
quadratically, so sf10 projects ~100x that — ~10^10-11 rows, >1 TB
of shuffle/persist against 77 GB of free disk). The census instead
computes the EXACT candidate counts from group sizes in O(rows):

* c02/c20 banded LSH stream (2 bands x 8 rows, band-exclusive,
  canonically oriented): |cand| = S0 + S1 - S01 where S_b is
  sum-over-band-b-buckets of C(n,2) and S01 the same over full
  16-hash signatures (pairs matching BOTH bands are emitted only by
  band 0, and a<b ordering halves each bucket's n^2 exactly).
* c18 blocked fuzzy stream: sum over composite-block buckets of
  C(n,2) (the join predicate is blk-equality + a<b; the edit-distance
  filter runs ON the stream, so the stream count is the cost driver).

Validated against the materialized counts at sf0.1/sf1.0 (7.76 M /
782 M banded pairs) before being trusted at sf10.

Usage: python scripts/pair_census.py [sf_dir ...]
Prints one line per sf_dir with both counts.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Repo root, robust to relative invocation ("python scripts/..."):
# rsplit on the raw __file__ yielded "scripts" there (round-11 advisor).
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from streamandbatchprocessing_spark.queries.dedup import (  # noqa: E402
    _BANDS,
    _N_HASHES,
    _ROWS_PER_BAND,
    _sig_df,
)
from streamandbatchprocessing_spark.sources.batch import load_table  # noqa: E402


def _pairs_in_groups(df, cols) -> int:
    """Exact sum of C(n,2) over groups keyed by ``cols`` — decimal
    accumulate (an int64 sum overflows around 4e18 pair-ends)."""
    row = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.sum(
                (F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)) / 2
            ).alias("p")
        )
        .first()
    )
    return int(row["p"] or 0)


def banded_candidates(spark: SparkSession, sf_dir: str) -> int:
    assert _BANDS == 2, "census hardcodes the 2-band exclusivity algebra"
    sig = _sig_df(load_table(spark, sf_dir, "documents")).persist()
    b0 = [f"h{i}" for i in range(_ROWS_PER_BAND)]
    b1 = [f"h{i}" for i in range(_ROWS_PER_BAND, _N_HASHES)]
    s0 = _pairs_in_groups(sig, b0)
    s1 = _pairs_in_groups(sig, b1)
    s01 = _pairs_in_groups(sig, b0 + b1)
    sig.unpersist()
    return s0 + s1 - s01


def blocked_candidates(spark: SparkSession, sf_dir: str) -> int:
    part = load_table(spark, sf_dir, "part")
    toks = F.split("p_name", " ")
    p = part.select(
        F.concat(
            toks.getItem(0), F.lit("|"), F.substring(toks.getItem(1), 1, 1)
        ).alias("blk")
    )
    # A single-token p_name makes concat() NULL; c18's blk EQUI-join
    # never emits NULL-key pairs, so the NULL group must not count
    # toward the stream this census claims to measure exactly
    # (round-11 advisor: an unfiltered census OVERSTATES the join).
    return _pairs_in_groups(p.filter(F.col("blk").isNotNull()), ["blk"])


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pair-census")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for sf_dir in sf_dirs:
        t0 = time.time()
        banded = banded_candidates(spark, sf_dir)
        blocked = blocked_candidates(spark, sf_dir)
        print(
            f"{sf_dir}: banded_lsh_candidates={banded:,} "
            f"c18_block_candidates={blocked:,} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
