"""Round-12 wall-time decomposition for bench queries (guide §1).

For each named query this measures, at sf_dir:
  build_s  — Python DataFrame construction (plan assembly + analysis
             triggered lazily later; this is the registry callable)
  cold_s   — first noop-sink write (optimize + codegen + execute)
  warm_s   — second noop-sink write (steady-state execute; codegen and
             session artifacts warm)

cold_s - warm_s approximates per-query compile/JIT overhead at this SF;
warm_s is the number actual data movement can still improve.

Usage:
  python scripts/profile_queries.py [sf_dir] q1 q2 ...
  python scripts/profile_queries.py [sf_dir] @headline | @extra | @all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names: list[str] = []
    for a in args:
        if a == "@headline":
            names += bench.HEADLINE
        elif a == "@extra":
            names += bench.EXTRA
        elif a == "@all":
            names += list(QUERIES)
        else:
            names.append(a)
    spark = build_spark(app_name="profile-queries",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    # tiny-SF warmup identical to bench.py so JIT state is comparable
    for name in names:
        try:
            _noop(QUERIES[name](spark, bench.WARMUP_DIR))
        except Exception:  # noqa: BLE001
            pass
    print(f"{'query':42s} {'build':>7s} {'cold':>7s} {'warm':>7s} {'compile~':>8s}")
    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        _noop(df)
        t2 = time.perf_counter()
        # rebuild: registry queries release prior tracked caches; keep
        # semantics identical to a fresh bench invocation
        df2 = QUERIES[name](spark, sf_dir)
        t3 = time.perf_counter()
        _noop(df2)
        t4 = time.perf_counter()
        build, cold, warm = t1 - t0, t2 - t1, t4 - t3
        rows.append((name, build, cold, warm))
        print(f"{name:42s} {build:7.3f} {cold:7.3f} {warm:7.3f} {cold-warm:8.3f}",
              flush=True)
    total_b = sum(r[1] for r in rows)
    total_c = sum(r[2] for r in rows)
    total_w = sum(r[3] for r in rows)
    print(f"{'TOTAL':42s} {total_b:7.3f} {total_c:7.3f} {total_w:7.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
