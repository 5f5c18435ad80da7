"""A/B the streaming state store provider for the f-family drains
(round 13, the round-12 verdict's #3 — the round-12 builder's own open
item after the tmpfs staging win left per-row state machinery as the
drains' dominant cost).

Arms, interleaved per rep on ONE session (provider is a per-query conf
read at stream start, so it can alternate between drains):

  hdfs     org.apache...state.HDFSBackedStateStoreProvider (deployed
           default: in-memory HashMap + checkpoint-file delta writes)
  rocksdb  org.apache...state.RocksDBStateStoreProvider (native
           LSM store: wins at LARGE per-partition state where the
           HashMap's JVM heap residency and full-snapshot costs bite;
           expected to LOSE at fixture-sized state where its native
           column-family setup/commit overhead per micro-batch
           dominates — this script exists to measure, not assume)

Per-rep wall + 1-min loadavg printed (bench marker discipline).

Usage: python scripts/stream_statestore_ab.py [--sf-dir D] [--reps N]
           [q1 q2 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402

_PKG = "org.apache.spark.sql.execution.streaming.state"
ARMS = [
    ("hdfs", f"{_PKG}.HDFSBackedStateStoreProvider"),
    ("rocksdb", f"{_PKG}.RocksDBStateStoreProvider"),
]
_CONF = "spark.sql.streaming.stateStore.providerClass"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or [
        "f01_streaming_dashboard", "f04_stateful_user_totals",
        "f12_stream_full_outer_join", "f13_streaming_heavy_hitters",
        "f14_stream_semi_join", "f15_streaming_latest_state",
    ]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        ap.error(f"unknown queries: {unknown}")
    spark = build_spark(app_name="statestore-ab",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    saved = spark.conf.get(_CONF)
    # warmup BOTH providers at tiny SF (native lib load, codegen)
    for tag, cls in ARMS:
        spark.conf.set(_CONF, cls)
        for n in names:
            _noop(QUERIES[n](spark, "/root/testdata/sf0.001"))
    results: dict[tuple[str, str], list[float]] = {}
    rows_seen: dict[tuple[str, str], int] = {}
    for r in range(args.reps):
        for tag, cls in ARMS:
            spark.conf.set(_CONF, cls)
            for n in names:
                la = _load1()
                t0 = time.perf_counter()
                df = QUERIES[n](spark, args.sf_dir)
                _noop(df)
                dt = time.perf_counter() - t0
                results.setdefault((n, tag), []).append(dt)
                rows_seen[(n, tag)] = df.count()
                print(f"rep{r + 1} {tag:8s} {n:34s} {dt:7.2f} s "
                      f"load1={la:.2f}", flush=True)
    spark.conf.set(_CONF, saved)
    print(f"\n{'query':34s} {'hdfs(min)':>10s} {'rocksdb(min)':>13s}  rows=")
    for n in names:
        h = results[(n, "hdfs")]
        k = results[(n, "rocksdb")]
        eq = rows_seen[(n, "hdfs")] == rows_seen[(n, "rocksdb")]
        print(f"{n:34s} {min(h):10.2f} {min(k):13.2f}  "
              f"rows_equal={eq} h={[round(x, 2) for x in h]} "
              f"k={[round(x, 2) for x in k]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
