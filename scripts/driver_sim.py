"""Simulate the external driver's correctness protocol end-to-end.

A VANILLA SparkSession (never the repo's build_spark — the driver won't
use it), __spark_entry__ imported the way the driver imports it, each
scoring-window query run at sf0.01 and strictly compared to its DuckDB
oracle with the harness's driver-replica compare. Run before every
round handoff:

    python scripts/driver_sim.py [sf_dir] [n_queries]

Exit 0 = every window query green (rows-only queries smoke-checked).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # second arg: how many registry entries to run — a number, or
    # "all" for every registered query (never goes stale as the
    # registry grows; a hardcoded count silently skipped the tail once)
    n_arg = sys.argv[2] if len(sys.argv) > 2 else "50"
    n_queries = sys.maxsize if n_arg == "all" else int(n_arg)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod
    from oracle_harness import assert_flat_output_schema, compare

    edf = entrymod.entry(spark)
    rows = edf.collect()
    print(f"entry(): {len(rows)} rows, schema {edf.columns}")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    window = list(queries)[:n_queries]
    failures = []
    for i, name in enumerate(window, 1):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                compare(spark, sf_dir, name, queries[name], oracles[name])
                status = "ok"
            else:
                df = queries[name](spark, sf_dir)
                # Falsifiable smoke: fixtures are non-empty, so a
                # correct rows-only query must produce rows and at
                # least one named output column — and the output must
                # survive the driver's pandas canonicalization (flat
                # scalar columns only; round-5 m06 failure mode).
                assert_flat_output_schema(name, df)
                n = df.count()
                assert n > 0, f"{name}: rows-only query returned 0 rows"
                assert df.columns, f"{name}: empty schema"
                status = f"rows-only ok ({n} rows)"
        except Exception:
            status = "FAIL"
            failures.append(name)
            traceback.print_exc(limit=3)
        print(f"[{i:2d}/{len(window)}] {name}: {status} "
              f"({time.perf_counter() - t0:.2f}s)", flush=True)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print(f"driver-sim: all {len(window)} window queries green at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
