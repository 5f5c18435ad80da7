"""Round-10 A/B for p06's heaviest-at-100x regime (the round-9 verdict's
next-round #5): can a c13-style Bloom pre-screen of train grams against
the broadcast eval-gram set beat the deployed shapes?

Variants measured (count() protocol, same as scale_check.py):

  A  deployed literal-intersect  — array_intersect(gs, lit_panel)
     before any explode (what p06 actually runs when the distinct
     panel-gram set fits _MAX_PANEL_LITERAL_GRAMS).
  B  A minus the train-side array_distinct — array_intersect dedupes
     its output anyway, so distinct-ing the gram array first is pure
     waste on the corpus side (the panel side still needs it for
     n_grams).
  C  fallback explode + broadcast-hash-join (what p06 runs above the
     literal cap) — the baseline the Bloom variant tries to beat.
  D  Bloom pre-screen INSIDE the gram array before the explode:
     F.filter(gs, g -> bit test on a literal int64 bitmap keyed by
     xxhash64) then explode only probable hits into the BHJ. The
     round-8 lesson predicts the interpreted per-element hashing in
     the HOF lambda loses more than the avoided explode wins — this
     measures it rather than asserting it.

Usage: python scripts/p06_ab_bloom.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from streamandbatchprocessing_spark.queries.pipeline import (  # noqa: E402
    _CONTAM_N,
    _EVAL_N,
    _P06_BLOOM_K,
    _P06_BLOOM_M,
    _p06_bloom_screen_expr,
)
from streamandbatchprocessing_spark.sources.batch import load_table  # noqa: E402

# Geometry + filter expression IMPORTED from the deployed fast path
# (round-11, the advisor's finding: a re-implementation here could
# drift from what p06 actually ships, making variant D measure a
# different expression than production runs).
_BLOOM_M = _P06_BLOOM_M
_BLOOM_WORDS = _BLOOM_M // 64
_BLOOM_K = _P06_BLOOM_K


def _grams_col(distinct: bool) -> F.Column:
    base = F.expr(
        f"CASE WHEN size(toks) < {_CONTAM_N} THEN array() "
        f"ELSE transform(sequence(0, size(toks) - {_CONTAM_N}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {_CONTAM_N}))) "
        "END"
    )
    return F.array_distinct(base) if distinct else base


def _sides(spark: SparkSession, sf_dir: str, train_distinct: bool):
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("doc_id", F.split("text", " ").alias("toks"))
    ev = g.select(
        "doc_id", _grams_col(True).alias("gs")
    ).filter(F.col("doc_id") < _EVAL_N)
    ev_g = ev.select(
        F.col("doc_id").alias("eval_doc"), F.explode("gs").alias("g")
    ).persist()
    tr = g.select(
        "doc_id", _grams_col(train_distinct).alias("gs")
    ).filter(F.col("doc_id") >= _EVAL_N).select(
        F.col("doc_id").alias("train_doc"), "gs"
    )
    return ev_g, tr


def _agg(hits_src: DataFrame) -> DataFrame:
    return hits_src.groupBy("eval_doc").agg(
        F.countDistinct("g").alias("n_hit_grams"),
        F.countDistinct("train_doc").alias("n_train_docs"),
    )


def variant_literal(spark, sf_dir, train_distinct=True) -> DataFrame:
    ev_g, tr = _sides(spark, sf_dir, train_distinct)
    panel = [r.g for r in ev_g.select("g").distinct().collect()]
    lit_panel = F.array(*[F.lit(x) for x in panel])
    tr_hits = tr.select(
        "train_doc", F.explode(F.array_intersect("gs", lit_panel)).alias("g")
    )
    return _agg(tr_hits.join(F.broadcast(ev_g), "g"))


def variant_explode_bhj(spark, sf_dir) -> DataFrame:
    ev_g, tr = _sides(spark, sf_dir, True)
    tr_g = tr.select("train_doc", F.explode("gs").alias("g"))
    return _agg(tr_g.join(F.broadcast(ev_g), "g"))


def variant_bloom_prescreen(spark, sf_dir) -> DataFrame:
    ev_g, tr = _sides(spark, sf_dir, True)
    words = [0] * _BLOOM_WORDS
    # hash panel grams Spark-side in ONE pass (portable xxhash64)
    pos_rows = (
        ev_g.select("g").distinct()
        .select(
            *[
                F.pmod(F.xxhash64(F.col("g"), F.lit(s)), F.lit(_BLOOM_M))
                .alias(f"p{s}")
                for s in range(_BLOOM_K)
            ]
        )
        .collect()
    )
    for r in pos_rows:
        for s in range(_BLOOM_K):
            p = r[f"p{s}"]
            words[p // 64] |= 1 << (p % 64)
    tr_maybe = tr.select(
        "train_doc",
        F.explode(F.expr(_p06_bloom_screen_expr(words))).alias("g"),
    )
    return _agg(tr_maybe.join(F.broadcast(ev_g), "g"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    all_variants = {
        "A": ("A_literal_distinct",
              lambda: variant_literal(spark, sf_dir, True)),
        "B": ("B_literal_nodistinct",
              lambda: variant_literal(spark, sf_dir, False)),
        "C": ("C_explode_bhj", lambda: variant_explode_bhj(spark, sf_dir)),
        "D": ("D_bloom_prescreen",
              lambda: variant_bloom_prescreen(spark, sf_dir)),
    }
    # Variants are selected/ordered by argv[3] (default ABCD) and reps
    # are INTERLEAVED across them so ambient drift hits every variant
    # equally; per-rep wall + 1-min loadavg are printed (the bench
    # sidecar-marker discipline).
    letters = sys.argv[3] if len(sys.argv) > 3 else "ABCD"
    variants = {all_variants[ch][0]: all_variants[ch][1] for ch in letters}
    best: dict[str, float | None] = {name: None for name in variants}
    outputs: dict[str, dict] = {}
    for rep in range(1, reps + 1):
        for name, fn in variants.items():
            t0 = time.time()
            got = {
                (r["eval_doc"]): (r["n_hit_grams"], r["n_train_docs"])
                for r in fn().collect()
            }
            dt = time.time() - t0
            best[name] = dt if best[name] is None else min(best[name], dt)
            outputs[name] = got
            print(
                f"rep {rep} {name}: {dt:.2f}s"
                f" loadavg={os.getloadavg()[0]:.2f}",
                flush=True,
            )
    base_name = next(iter(variants))
    base = outputs[base_name]
    for name in variants:
        same = outputs[name] == base
        print(
            f"{name}: best-of-{reps} {best[name]:.2f}s "
            f"rows={len(outputs[name])} matches_{base_name[0]}={same}",
            flush=True,
        )
        assert same, f"{name} output differs from variant {base_name}"


if __name__ == "__main__":
    main()
