"""Empirical 10x scale check: run the 17 headline queries plus the
slowest / most scale-sensitive extras at sf0.1 and at the staged sf1.0
fixture (scripts/gen_scale_fixture.py), and report per-query scaling
ratios.

Row-count context for reading the ratios: lineitem/orders/events/
customer/part/supplier/documents scale 10x; embeddings scale 4x (the
fixture's own 500 -> 2000 -> 8000 curve), so a d-family ratio of ~4 is
LINEAR in its input. The sf1.0 files also have ~122k-row row groups
(DuckDB writer) where the driver's sf0.1 lineitem is a single row
group, so scan-bound queries can legitimately scale BETTER than 10x
(more parallelism at the source).

Usage: python scripts/scale_check.py [reps] [full]
  reps: best-of-N per SF (default 2)
  full: also sweep EVERY tracked bench extra (breadth pass — use
        reps=1 and deep-measure anything it flags)
Prints a markdown table; exit 1 if any query ERRORS at either SF.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1.0")
WARM = "/root/testdata/sf0.001"

from bench import EXTRA, HEADLINE  # noqa: E402
from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402

#: The slowest quiet extras of round 8 plus the derived-knob queries the
#: round-8 verdict called out as the ones a 10x corpus would stress
#: (c18 blocking keys, d10 bucket bits, p21 shard count). Round 10
#: adds the queries whose scale behavior changed that round: the
#: emission-capped c18/c20 already here, the Bloom-screened p06
#: already here, plus e24 (top-K vocabulary grid) and the two
#: candidate-sample sweeps riding the derived modulus (c26, c27).
SLOW_EXTRAS = [
    "c09_semantic_dedup",
    "c10_incremental_neardup",
    "c14_minhash_calibration",
    "c18_blocked_fuzzy_match",
    "c20_containment_pairs",
    "c21_candidate_degree_profile",
    "c26_lsh_band_plan_curve",
    "c27_dedup_threshold_sweep",
    "d10_mutual_knn_graph",
    "d16_retrieval_margin_profile",
    "d22_nearest_centroid_confusion",
    "e24_source_vocab_jsd",
    "g33_brand_basket_lift",
    "p06_contamination_check",
    "p21_shard_manifest",
]


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    full = len(sys.argv) > 2 and sys.argv[2] == "full"
    if not os.path.isdir(SF1):
        print(f"staged fixture missing at {SF1}; run gen_scale_fixture.py")
        return 1
    spark = build_spark(
        app_name="scale-check",
        enable_fair_scheduler=False,
        extra_conf={"spark.ui.enabled": "false"},
    )
    pool = HEADLINE + SLOW_EXTRAS + (
        [n for n in EXTRA if n not in SLOW_EXTRAS] if full else []
    )
    seen: set[str] = set()
    names = [
        n for n in pool
        if n in QUERIES and not (n in seen or seen.add(n))
    ]
    for n in names:  # JIT/codegen warmup
        try:
            run_once(spark, n, WARM)
        except Exception:
            pass
    rows, errors = [], []
    for n in names:
        rec = {"name": n}
        for label, d in (("sf0.1", SF01), ("sf1.0", SF1)):
            try:
                rec[label] = min(run_once(spark, n, d) for _ in range(reps))
            except Exception as exc:  # noqa: BLE001
                rec[label] = None
                errors.append((n, label, repr(exc)[:200]))
        rows.append(rec)
        a, b = rec.get("sf0.1"), rec.get("sf1.0")
        ratio = f"{b / a:.2f}x" if a and b else "ERR"
        print(
            f"{n}: sf0.1 {a if a is None else round(a, 2)}s -> "
            f"sf1.0 {b if b is None else round(b, 2)}s ({ratio})",
            flush=True,
        )
    spark.stop()

    print("\n| query | sf0.1 s | sf1.0 s | ratio |")
    print("|---|---|---|---|")
    for r in rows:
        a, b = r["sf0.1"], r["sf1.0"]
        ratio = f"{b / a:.2f}" if a and b else "ERR"
        print(
            f"| {r['name']} | {a and round(a, 2)} | {b and round(b, 2)} "
            f"| {ratio} |"
        )
    if errors:
        print("\nERRORS:")
        for e in errors:
            print(" ", e)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
