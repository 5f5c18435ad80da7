"""Prototype A/B for d22_nearest_centroid_confusion (round 13, the
round-12 verdict's #6 second-order profiling — executed because the
profile showed a structural lever, not just arithmetic).

Deployed shape: explode embeddings to (vec, pos, qi), join the 5.1M-row
stream to the broadcast |labels|*dim cell panel ON DIMENSION, shuffle
all 5.1M (vec,label,clabel,term) rows into a DECIMAL(38,0) groupBy,
then argmin via min(struct) — two aggregation exchanges over the
fan-out stream.

Candidate shape: aggregate the centroid cells exactly as before (tiny
map-side-combinable shuffle), COLLECT the |labels|*dim panel (bounded,
the _sq_dim_stats / PQ-codebook precedent), rebuild it as per-label
literal arrays, and compute every (vec, clabel) distance MAP-SIDE with
a zip_with/aggregate fold over the vector's own int64 micro-unit
array; argmin folds over the |labels| candidates in the same
projection. All arithmetic stays int64 (values bounded: 64 dims x
(2.4e6)^2 < 4e14 << 2^63), which equals the oracle's DECIMAL(38,0)
bit-for-bit; the NULL-label tiebreak (coalesce to int32-max) is
replicated. Zero exchanges before the |labels|^2-bounded confusion
groupBy.

Usage: python scripts/d22_mapside_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from streamandbatchprocessing_spark.functions.vectors import as_double  # noqa: E402
from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402
from streamandbatchprocessing_spark.sources.batch import load_table  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def mapside_d22(spark, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", "label",
        F.posexplode(as_double(F.col("embedding"))).alias("pos", "v"),
    ).select(
        "vec_id", "label", "pos",
        F.col("v").cast("decimal(25,6)").alias("v"),
    )
    g = (
        x.groupBy(F.col("label").alias("clabel"), "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
             F.sum("v").alias("dsum"))
        .withColumn("s6", F.expr("CAST(dsum * 1000000 AS BIGINT)"))
    )
    cells = g.select(
        "clabel", "pos",
        F.expr(
            "CASE WHEN s6 < 0"
            " THEN -((2 * (-s6) + n_vecs) DIV (2 * n_vecs))"
            " ELSE (2 * s6 + n_vecs) DIV (2 * n_vecs) END"
        ).alias("c6"),
    )
    # Bounded collect: |labels| x dim rounded centroid components (the
    # _sq_dim_stats precedent — a codebook, not data).
    panel: dict[object, dict[int, int]] = {}
    for r in cells.collect():
        panel.setdefault(r["clabel"], {})[r["pos"]] = r["c6"]
    dim = 1 + max(p for comps in panel.values() for p in comps)
    centroids = [
        (clabel, [comps[i] for i in range(dim)])
        for clabel, comps in sorted(
            panel.items(),
            key=lambda kv: (kv[0] is None, kv[0]),
        )
    ]
    # Same per-component arithmetic as the exploded q stream: double ->
    # DECIMAL(25,6) -> *1e6 -> BIGINT (exact at every step).
    qi = F.transform(
        as_double(F.col("embedding")),
        lambda x_: (x_.cast("decimal(25,6)") * 1000000).cast("bigint"),
    )
    scored = emb.select("vec_id", "label", qi.alias("qi"))
    # per-candidate exact L2 distance: int64 fold over the 64 dims
    cand_structs = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("qi"),
                    F.array(*[F.lit(c) for c in comps]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, t: acc + t,
            ).alias("dist"),
            (F.lit(2147483647) if clabel is None
             else F.lit(clabel)).cast("int").alias("tb"),
            (F.lit(None).cast(emb.schema["label"].dataType)
             if clabel is None else F.lit(clabel)).alias("clabel"),
        )
        for clabel, comps in centroids
    ]
    m = F.array_min(F.array(*cand_structs))
    return (
        scored.select("label", m.getField("clabel").alias("predicted"))
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .select(
            "label", "predicted", "n_vecs",
            (F.col("label") == F.col("predicted")).alias("is_correct"),
        )
        .orderBy("label", "predicted")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_spark(app_name="d22-mapside-ab",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    deployed = lambda: QUERIES["d22_nearest_centroid_confusion"](  # noqa: E731
        spark, sf_dir)
    cand = lambda: mapside_d22(spark, sf_dir)  # noqa: E731
    a = sorted(map(repr, deployed().collect()))
    b = sorted(map(repr, cand().collect()))
    if a != b:
        only_a = [r for r in a if r not in b][:5]
        only_b = [r for r in b if r not in a][:5]
        print(f"NOT EQUAL: {len(a)} vs {len(b)} rows")
        print("only deployed:", only_a)
        print("only mapside :", only_b)
        return 1
    print(f"bit-identical ({len(a)} rows)")
    for fn in (deployed, cand):  # warmup
        _noop(fn())
    res: dict[str, list[float]] = {"deployed": [], "mapside": []}
    for _ in range(reps):
        for tag, fn in (("deployed", deployed), ("mapside", cand)):
            t0 = time.perf_counter()
            _noop(fn())
            res[tag].append(time.perf_counter() - t0)
    for tag, times in res.items():
        print(f"{tag:9s} min={min(times):6.3f} "
              f"all={[round(x, 3) for x in times]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
