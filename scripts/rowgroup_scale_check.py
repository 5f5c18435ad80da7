"""Multi-row-group fixture variant for the core-scaling check
(round 13, the round-12 verdict's #8).

The driver's sf0.1 fixtures are SINGLE-row-group parquet files, so the
b-family scans are one task regardless of core count (documented since
round 5; bench.py HEADLINE comment) and the driver's 8-vs-32-core
scaling ratios for scan-bound queries measure a single-task floor, not
the plan's parallelism. This script stages a byte-identical-content
variant of sf0.1 whose big tables are rewritten with ~50k-row row
groups (the shape DuckDB writes at sf1.0 and any production layout
has), then times scan-bound queries at two core counts on BOTH
fixtures and prints the speedup ratios. Expected: ratios ≈ 1 on the
single-row-group fixture (the known floor) and ratios well above 1 on
the variant — demonstrating the queries scale with cores when the
LAYOUT allows, i.e. the flat driver ratios are a fixture artifact, not
a plan property.

The variant is staged under .scale/ (ephemeral, regenerable); the
driver's own fixture files are never touched.

Usage: python scripts/rowgroup_scale_check.py [cpus_hi] [cpus_lo] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scale", "sf0.1-mrg")
ROW_GROUP = 50_000
#: Tables the scan-bound queries read; the rest are hardlink/copied.
REWRITE = ("lineitem", "orders", "events", "customer", "part")
QUERIES_TO_TIME = [
    "b01_pricing_summary", "b04_brand_volume", "b21_large_volume_orders",
    "b02_top_unshipped_orders", "a01_revenue_by_category",
]


def stage() -> None:
    os.makedirs(DST, exist_ok=True)
    for fn in os.listdir(SRC):
        src = os.path.join(SRC, fn)
        dst = os.path.join(DST, fn)
        if os.path.exists(dst):
            continue
        table = fn.rsplit(".", 1)[0]
        if table in REWRITE:
            t = pq.read_table(src)
            pq.write_table(t, dst, row_group_size=ROW_GROUP)
        else:
            shutil.copyfile(src, dst)
    for table in REWRITE:
        f = pq.ParquetFile(os.path.join(DST, f"{table}.parquet"))
        print(f"{table}: {f.metadata.num_rows} rows in "
              f"{f.metadata.num_row_groups} row groups")


def time_fixture(cpus: int, reps: int) -> dict[tuple[str, str], float]:
    from streamandbatchprocessing_spark.queries import QUERIES
    from streamandbatchprocessing_spark.session import build_spark

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = build_spark(app_name=f"rowgroup-scale-{cpus}",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for n in QUERIES_TO_TIME:  # JIT warmup
        _noop(QUERIES[n](spark, "/root/testdata/sf0.001"))
    out: dict[tuple[str, str], float] = {}
    for _ in range(reps):
        for tag, d in (("1rg", SRC), ("mrg", DST)):
            for n in QUERIES_TO_TIME:
                t0 = time.perf_counter()
                _noop(QUERIES[n](spark, d))
                dt = time.perf_counter() - t0
                key = (n, tag)
                out[key] = min(out.get(key, dt), dt)
    spark.stop()
    return out


def main() -> int:
    cpus_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cpus_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    stage()
    hi = time_fixture(cpus_hi, reps)
    lo = time_fixture(cpus_lo, reps)
    print(f"\n| query | fixture | {cpus_lo}c s | {cpus_hi}c s | "
          f"ratio (lo/hi) |")
    print("|---|---|---|---|---|")
    for n in QUERIES_TO_TIME:
        for tag in ("1rg", "mrg"):
            a, b = lo[(n, tag)], hi[(n, tag)]
            print(f"| {n} | {tag} | {a:.3f} | {b:.3f} | {a / b:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
