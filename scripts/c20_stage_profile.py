"""Staged-cost profile of c20_containment_pairs at a large SF
(round 13, the round-12 verdict's #4: "profile the three stages —
pair-stream build / tokset intersect / capped emission — separately at
sf1.0 and attack the largest").

Stages timed separately (each a fresh measurement boundary; artifacts
are built exactly once per session, so ordering gives attribution):

  1. sig+pairs build   — shared_sig + shared_pairs materialization
                         (the banded self-join union, checkpointed)
  2. toksets build     — shared_toksets materialization (noop-forced)
  3. intersect+filter  — _c20_frame(top_n=0) to a noop sink, MINUS the
                         artifact builds above = the two tokset joins,
                         per-pair array_intersect, containment filter
  4. capped emission   — _c20_frame(top_n=_C20_TOPN) to a noop sink on
                         the SAME warm artifacts = stage 3 + the
                         per-doc_a top-N window

Optional variants (letters, default "UC"):
  U  uncapped (stage 3)      C  capped (stage 4)
  B  capped with the toksets side EXPLICITLY broadcast in both joins
     (guide §3.1: at sf1.0 the tokset projection overflows the 64 MB
     auto-broadcast threshold, so both joins go SMJ and shuffle the
     O(pairs) stream twice — the second time carrying the ~25-element
     token arrays; broadcasting moves zero pair rows through the joins
     at the price of one narrow-row exchange for the cap window)

Reps are INTERLEAVED across variants; per-rep wall and 1-min loadavg
printed (the bench sidecar-marker discipline).

Usage: python scripts/c20_stage_profile.py [sf_dir] [reps] [variants]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from streamandbatchprocessing_spark.queries import dedup  # noqa: E402
from streamandbatchprocessing_spark.queries.dedup import (  # noqa: E402
    _C20_TOPN,
    _c20_frame,
    shared_pairs,
    shared_toksets,
)
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def _c20_broadcast_frame(spark, sf_dir: str, top_n: int):
    """_c20_frame with the toksets side explicitly broadcast (variant
    B). Join order is irrelevant under broadcast (no exchange either
    way); the cap window then pays one hashpartitioning(da) exchange
    of the NARROW qualifying rows (da, db, i, na, nb)."""
    cand = shared_pairs(spark, sf_dir).select("da", "db")
    toksets = shared_toksets(spark, sf_dir)
    ta, tb = F.broadcast(toksets.alias("ta")), F.broadcast(toksets.alias("tb"))
    iu = (
        cand.join(tb, F.col("db") == F.col("tb.doc_id"))
        .join(ta, F.col("da") == F.col("ta.doc_id"))
        .select(
            "da", "db",
            F.size(F.array_intersect(F.col("ta.toks"), F.col("tb.toks")))
            .alias("i"),
            F.size(F.col("ta.toks")).alias("na"),
            F.size(F.col("tb.toks")).alias("nb"),
        )
    )
    from pyspark.sql import Window

    c_ab = F.col("i") * 1.0 / F.col("na")
    c_ba = F.col("i") * 1.0 / F.col("nb")
    qualifying = iu.filter(F.greatest(c_ab, c_ba) >= dedup._CONT_MIN)
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
        dedup.pround(c_ab, 6).alias("containment_ab"),
        dedup.pround(c_ba, 6).alias("containment_ba"),
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.path.join(REPO, ".scale", "sf1.0")
    reps = int(args[1]) if len(args) > 1 else 2
    variants = (args[2] if len(args) > 2 else "UC").upper()
    spark = build_spark(app_name="c20-stage-profile",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    # JIT warmup at small SF (everything incl. broadcast variant)
    warm = "/root/testdata/sf0.01"
    _noop(_c20_frame(spark, warm, _C20_TOPN))
    _noop(_c20_broadcast_frame(spark, warm, _C20_TOPN))

    # ---- artifact builds, timed once (stage 1 + 2) ----
    print(f"load1={_load1():.2f}")
    t0 = time.perf_counter()
    shared_pairs(spark, sf_dir)  # eager checkpoint build (incl. sig)
    t_pairs = time.perf_counter() - t0
    t0 = time.perf_counter()
    _noop(shared_toksets(spark, sf_dir))  # noop fills the persist cache
    t_toksets = time.perf_counter() - t0
    print(f"stage1 sig+pairs build  {t_pairs:8.1f} s")
    print(f"stage2 toksets build    {t_toksets:8.1f} s  load1={_load1():.2f}")

    frames = {
        "U": lambda: _c20_frame(spark, sf_dir, 0),
        "C": lambda: _c20_frame(spark, sf_dir, _C20_TOPN),
        "B": lambda: _c20_broadcast_frame(spark, sf_dir, _C20_TOPN),
    }
    results: dict[str, list[float]] = {v: [] for v in variants}
    for r in range(reps):
        for v in variants:
            la = _load1()
            t0 = time.perf_counter()
            _noop(frames[v]())
            dt = time.perf_counter() - t0
            results[v].append(dt)
            print(f"rep{r + 1} variant {v}  {dt:8.1f} s  load1={la:.2f}",
                  flush=True)
    print("\nvariant  best    all")
    for v in variants:
        print(f"{v}        {min(results[v]):6.1f}  "
              f"{[round(x, 1) for x in results[v]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
