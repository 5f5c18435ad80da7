"""Round-11 A/B for the c20 emission cap (the round-10 verdict's #2):
the round-10 capped shape paid a full re-shuffle of the ~690 M-row
qualifying stream for its per-doc_a top-N window (measured 238 s vs
186 s uncapped at sf1.0, +28% at the noop sink). Round 11 reorders the
tokset joins (db-side first, da-side LAST) so the final join's exchange
doubles as the window's required clustering and the window plans with
no exchange of its own. This measures whether that makes the cap
net-free.

Variants (noop-write protocol, same as scale_check.py; shared
artifacts warmed once before timing so every variant reads the same
persisted candidate stream):

  A  deployed round-11 capped  — _c20_frame (db-join first, da-join
     last, window rides the join exchange).
  B  round-10 capped           — da-join first, db-join last, window
     adds its own hashpartitioning(da) exchange (re-implemented here
     verbatim for the comparison; the engine no longer ships it).
  C  uncapped                  — _c20_frame top_n=0 (the floor the cap
     must not sink below at a noop sink).

Emission equality of A and B is asserted via count + an order-free
value hash computed in-plan (never a driver-side collect of the pair
stream).

Usage: python scripts/c20_ab_capfree.py [sf_dir] [reps] [variants]

``variants`` selects and ORDERS the variants by letter (default ABC).
Reps are INTERLEAVED across the selected variants (rep 1 of each, then
rep 2 of each, ...) so ambient-load drift hits every variant equally —
the round-11 session saw 2-4x loadavg swings that contaminated a
per-variant-sequential A rep. Per-rep wall time and 1-minute loadavg
are printed so a reader can adjudicate run quietness (the bench
sidecar-marker discipline)."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from streamandbatchprocessing_spark.queries.dedup import (  # noqa: E402
    _C20_TOPN,
    _CONT_MIN,
    _c20_frame,
    shared_pairs,
    shared_toksets,
)


def variant_b_round10(spark: SparkSession, sf_dir: str, top_n: int) -> DataFrame:
    """The round-10 capped shape: da-join FIRST, so the window must add
    its own exchange of the qualifying stream."""
    from streamandbatchprocessing_spark.functions.aggregates import pround

    cand = shared_pairs(spark, sf_dir).select("da", "db")
    toksets = shared_toksets(spark, sf_dir)
    ta, tb = toksets.alias("ta"), toksets.alias("tb")
    iu = (
        cand.join(ta, F.col("da") == F.col("ta.doc_id"))
        .join(tb, F.col("db") == F.col("tb.doc_id"))
        .select(
            "da", "db",
            F.size(F.array_intersect(F.col("ta.toks"), F.col("tb.toks")))
            .alias("i"),
            F.size(F.col("ta.toks")).alias("na"),
            F.size(F.col("tb.toks")).alias("nb"),
        )
    )
    c_ab = F.col("i") * 1.0 / F.col("na")
    c_ba = F.col("i") * 1.0 / F.col("nb")
    qualifying = iu.filter(F.greatest(c_ab, c_ba) >= _CONT_MIN)
    if top_n > 0:
        w = Window.partitionBy("da").orderBy(
            F.greatest(c_ab, c_ba).desc(), "db"
        )
        qualifying = (
            qualifying.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_n)
            .drop("rn")
        )
    return qualifying.select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.col("na").cast("long").alias("size_a"),
        F.col("nb").cast("long").alias("size_b"),
        F.col("i").cast("long").alias("n_common"),
        pround(c_ab, 6).alias("containment_ab"),
        pround(c_ba, 6).alias("containment_ba"),
    )


def _fingerprint(df: DataFrame):
    """Order-free emission fingerprint, computed in-plan: row count and
    the sum of a per-row hash over every output column."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulate: an int64 sum of ~1e9 64-bit hashes
        # overflows under ANSI mode
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).first()
    return row["n"], row["h"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("c20-ab-capfree")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # Warm the session-shared artifacts once so no variant pays the
    # signature/candidate/tokset build inside its timed run.
    t0 = time.time()
    shared_pairs(spark, sf_dir).count()
    shared_toksets(spark, sf_dir).count()
    print(f"artifact warmup: {time.time() - t0:.1f}s", flush=True)

    all_variants = {
        "A": ("A_r11_capped_joinorder",
              lambda: _c20_frame(spark, sf_dir, _C20_TOPN)),
        "B": ("B_r10_capped_windowshuffle",
              lambda: variant_b_round10(spark, sf_dir, _C20_TOPN)),
        "C": ("C_uncapped", lambda: _c20_frame(spark, sf_dir, 0)),
    }
    letters = sys.argv[3] if len(sys.argv) > 3 else "ABC"
    variants = {all_variants[ch][0]: all_variants[ch][1] for ch in letters}
    best = {name: None for name in variants}
    for rep in range(1, reps + 1):
        for name, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = dt if best[name] is None else min(best[name], dt)
            print(
                f"rep {rep} {name}: {dt:.2f}s"
                f" loadavg={os.getloadavg()[0]:.2f}",
                flush=True,
            )
    fps = {}
    for name, fn in variants.items():
        fps[name] = _fingerprint(fn())
        print(
            f"{name}: best-of-{reps} {best[name]:.2f}s rows={fps[name][0]}",
            flush=True,
        )
    capped = [
        fps[n] for n in ("A_r11_capped_joinorder",
                         "B_r10_capped_windowshuffle") if n in fps
    ]
    assert all(fp == capped[0] for fp in capped), (
        "capped variants disagree", fps
    )
    if len(capped) == 2:
        print("A == B emission fingerprints match", flush=True)


if __name__ == "__main__":
    main()
