"""Full-registry physical-plan perturbation sweep.

Runs EVERY registered query twice — default plan, then with broadcasts
disabled (forcing SMJ/shuffle joins) and ``spark.sql.shuffle.partitions``
dropped to a prime 3 (different partition boundaries and merge orders) —
and diffs the sorted row sets. Zero tolerance: a single differing repr
fails the sweep. This is the round-checklist proof that the decimal-
accumulate / integer-time / portable-hash / explicit-tie-break
discipline holds across the WHOLE registry, not just the pytest slice
in tests/test_plan_perturbation.py.

Usage: python scripts/perturb_sweep.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402

_PERTURB = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "3",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_spark(
        app_name="perturb-sweep",
        enable_fair_scheduler=False,
        extra_conf={"spark.ui.enabled": "false"},
    )
    failures: list[str] = []
    t_start = time.perf_counter()
    for i, name in enumerate(QUERIES, 1):
        t0 = time.perf_counter()
        try:
            baseline = sorted(
                map(repr, QUERIES[name](spark, sf_dir).collect())
            )
            saved = {k: spark.conf.get(k) for k in _PERTURB}
            try:
                for k, v in _PERTURB.items():
                    spark.conf.set(k, v)
                perturbed = sorted(
                    map(repr, QUERIES[name](spark, sf_dir).collect())
                )
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)
            status = "ok" if baseline == perturbed else "DIVERGED"
        except Exception:
            status = "ERROR"
            traceback.print_exc(limit=3)
        if status != "ok":
            failures.append(name)
        print(
            f"[{i:3d}/{len(QUERIES)}] {name}: {status} "
            f"({time.perf_counter() - t0:.2f}s)",
            flush=True,
        )
    spark.stop()
    mins = (time.perf_counter() - t_start) / 60
    if failures:
        print(f"SWEEP FAILED ({mins:.1f} min): {failures}")
        return 1
    print(
        f"perturb-sweep: all {len(QUERIES)} registered queries reproduce "
        f"bit-for-bit under forced-SMJ + 3-partition plans at {sf_dir} "
        f"({mins:.1f} min)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
