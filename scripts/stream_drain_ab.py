"""A/B the streaming drains' checkpoint/staging filesystem (round 12).

The f-family's bench cost is nearly scale-independent (f12 4.8 s at
sf0.001 vs 5.2 s at sf0.1), i.e. fixed per-drain machinery, and the
HDFS-backed state store + offset/commit logs write hundreds of tiny
files (plus CRC twins and renames) per drain under ``staging_dir`` —
on ext4 by default in this sandbox. This script times N interleaved
drains of the named queries with the staging root on the default tmp
vs an alternate dir (e.g. /dev/shm), same session, to decide whether
FS placement of the EPHEMERAL streaming scaffolding is worth a
default change in sources/staging.py.

Usage: python scripts/stream_drain_ab.py [sf_dir] [reps] [alt_dir] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402
from streamandbatchprocessing_spark.sources import staging  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args.pop(0)) if args and args[0].isdigit() else 3
    alt = args.pop(0) if args and os.path.isdir(args[0]) else "/dev/shm"
    names = args or [
        "f01_streaming_dashboard", "f12_stream_full_outer_join",
        "f13_streaming_heavy_hitters", "f14_stream_semi_join",
    ]
    spark = build_spark(app_name="stream-drain-ab",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    # warmup at tiny SF, default staging
    for n in names:
        _noop(QUERIES[n](spark, "/root/testdata/sf0.001"))
    results: dict[tuple[str, str], list[float]] = {}
    variants = [("default", None), ("alt", alt)]
    for r in range(reps):
        for tag, root in variants:
            staging.set_staging_root(root)
            for n in names:
                t0 = time.perf_counter()
                _noop(QUERIES[n](spark, sf_dir))
                results.setdefault((n, tag), []).append(
                    time.perf_counter() - t0)
    staging.set_staging_root(None)
    print(f"{'query':34s} {'default(min)':>12s} {'alt(min)':>9s}  all reps")
    for n in names:
        d = results[(n, "default")]
        a = results[(n, "alt")]
        print(f"{n:34s} {min(d):12.3f} {min(a):9.3f}  "
              f"d={[round(x, 2) for x in d]} a={[round(x, 2) for x in a]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
