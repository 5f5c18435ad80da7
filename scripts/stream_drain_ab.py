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

Usage: python scripts/stream_drain_ab.py [--sf-dir D] [--reps N]
           [--base DIR] [--alt DIR] [q1 q2 ...]

The ``base`` arm pins the DISK-BACKED system temp root explicitly
(round-13 advisor fix: since staging.py defaults ``kind="state"``
staging to tmpfs, a ``set_staging_root(None)`` arm would measure the
same placement as the tmpfs alt and the A/B could no longer reproduce
the numbers cited in sources/staging.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402
from streamandbatchprocessing_spark.sources import staging  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--base", default=tempfile.gettempdir(),
        help="staging root for the base arm (default: disk-backed "
             "system temp root, pinned explicitly so the comparison "
             "stays disk-vs-alt whatever the per-kind defaults are)",
    )
    ap.add_argument("--alt", default="/dev/shm")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    for d in (args.sf_dir, args.base, args.alt):
        if not os.path.isdir(d):
            ap.error(f"not a directory: {d}")
    names = args.queries or [
        "f01_streaming_dashboard", "f12_stream_full_outer_join",
        "f13_streaming_heavy_hitters", "f14_stream_semi_join",
    ]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        ap.error(f"unknown queries: {unknown}")
    spark = build_spark(app_name="stream-drain-ab",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    # warmup at tiny SF, default staging
    for n in names:
        _noop(QUERIES[n](spark, "/root/testdata/sf0.001"))
    results: dict[tuple[str, str], list[float]] = {}
    variants = [("base", args.base), ("alt", args.alt)]
    for r in range(args.reps):
        for tag, root in variants:
            staging.set_staging_root(root)
            for n in names:
                t0 = time.perf_counter()
                _noop(QUERIES[n](spark, sf_dir=args.sf_dir))
                results.setdefault((n, tag), []).append(
                    time.perf_counter() - t0)
    staging.set_staging_root(None)
    print(f"{'query':34s} {'base(min)':>12s} {'alt(min)':>9s}  all reps")
    for n in names:
        d = results[(n, "base")]
        a = results[(n, "alt")]
        print(f"{n:34s} {min(d):12.3f} {min(a):9.3f}  "
              f"d={[round(x, 2) for x in d]} a={[round(x, 2) for x in a]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
