"""Microbench: higher-order-function dot product vs a static unrolled
expression chain (round 13, guide §4.1 "built-ins run inside the JVM
with codegen" — EXCEPT higher-order functions, whose lambda bodies are
interpreted per element and allocate an intermediate array per
``zip_with`` call; they participate in WholeStageCodegen only as
opaque leaf expressions).

Shapes timed, all on the d01/d16 brute-force scoring pattern (bounded
query panel broadcast against the embedding corpus, cosine per pair):

  hof     cosine = aggregate(zip_with(a, b, *), 0.0, +) twice + sqrt
          (the deployed functions/vectors.py shape)
  static  the same arithmetic unrolled over the corpus' known
          dimension: 0.0 + a[0]*b[0] + a[1]*b[1] + ... — the IDENTICAL
          left-to-right IEEE fold (seeded with 0.0 exactly like the
          aggregate), so results are bit-identical by construction;
          equality is asserted on the collected outputs.

Usage: python scripts/vector_hof_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from streamandbatchprocessing_spark.functions.vectors import (  # noqa: E402
    as_double,
    cosine,
)
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402
from streamandbatchprocessing_spark.sources.batch import load_table  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _static_dot(a, b, dim: int):
    return reduce(
        lambda acc, i: acc + F.get(a, i) * F.get(b, i),
        range(dim),
        F.lit(0.0),
    )


def _static_cosine(a, b, dim: int):
    return _static_dot(a, b, dim) / (
        F.sqrt(_static_dot(a, a, dim)) * F.sqrt(_static_dot(b, b, dim))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_spark(app_name="vector-hof-ab",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    dim = emb.select(F.size("v")).first()[0]
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )

    def scored(cos_col):
        return emb.join(
            F.broadcast(q), F.col("vec_id") != F.col("qid")
        ).select(
            "qid", F.col("vec_id").alias("nid"),
            cos_col.alias("cos_sim"),
        )

    variants = {
        "hof": lambda: scored(cosine(F.col("qv"), F.col("v"))),
        "static": lambda: scored(
            _static_cosine(F.col("qv"), F.col("v"), dim)
        ),
    }
    # bit-identity check (order-insensitive multiset of reprs)
    rows = {
        tag: sorted(map(repr, fn().collect()))
        for tag, fn in variants.items()
    }
    assert rows["hof"] == rows["static"], "NOT bit-identical"
    print(f"bit-identical on {len(rows['hof'])} rows, dim={dim}")
    for tag, fn in variants.items():  # JIT warmup
        _noop(fn())
    results: dict[str, list[float]] = {t: [] for t in variants}
    for _ in range(reps):
        for tag, fn in variants.items():
            t0 = time.perf_counter()
            _noop(fn())
            results[tag].append(time.perf_counter() - t0)
    for tag, times in results.items():
        print(f"{tag:8s} min={min(times):6.3f}  "
              f"all={[round(x, 3) for x in times]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
