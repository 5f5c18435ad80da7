"""Restart-interleaved A/B of ``spark.local.dir`` placement (round 13,
the round-12 verdict's #7 — round 12 REJECTED this comparison as
unmeasurable because back-to-back same-variant runs swung 9.45→16.46 s
on ambient noise, and a JVM-start conf cannot be interleaved within
one session).

Protocol: N alternating FRESH-JVM child runs per variant (disk temp vs
tmpfs), each child warms up at sf0.001 then times a shuffle-heavy
query set at the target SF; the parent compares per-query minima
across each variant's children. Interleaving at the JVM level spreads
ambient-load drift across both arms; minima discard the contaminated
runs (the bench's own best-of-N argument).

``spark.local.dir`` holds shuffle files and spilled blocks — the same
small-file-latency class as the round-12 checkpoint-staging win, but
shuffle files are corpus-scaled, so tmpfs placement trades executor
RAM for latency and is NOT a safe default (see staging.py's byte-cap
rationale); this script only decides whether the effect is even
measurable here.

Usage: python scripts/localdir_ab.py [--sf-dir D] [--rounds N]
           [--alt DIR] [q1 q2 ...]
       (child mode, internal: --child TAG DIR)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "b12_salted_segment_stats", "a04_user_segmentation",
    "c02_minhash_lsh_pairs", "b08_top_orders_per_customer",
    "e01_token_stats",
]


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def child(tag: str, local_dir: str, sf_dir: str, names: list[str]) -> int:
    from streamandbatchprocessing_spark.queries import QUERIES
    from streamandbatchprocessing_spark.session import build_spark

    spark = build_spark(
        app_name=f"localdir-ab-{tag}", enable_fair_scheduler=False,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.local.dir": local_dir},
    )

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for n in names:  # JIT warmup
        _noop(QUERIES[n](spark, "/root/testdata/sf0.001"))
    out: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        _noop(QUERIES[n](spark, sf_dir))
        out[n] = round(time.perf_counter() - t0, 3)
    print("CHILD_RESULT " + json.dumps({"tag": tag, "load1": _load1(),
                                        "times": out}))
    spark.stop()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4,
                    help="fresh-JVM runs PER VARIANT")
    ap.add_argument("--alt", default="/dev/shm")
    ap.add_argument("--child", nargs=2, metavar=("TAG", "DIR"),
                    help=argparse.SUPPRESS)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES
    if args.child:
        return child(args.child[0], args.child[1], args.sf_dir, names)
    variants = [("disk", tempfile.gettempdir()), ("tmpfs", args.alt)]
    results: dict[tuple[str, str], list[float]] = {}
    loads: list[float] = []
    for r in range(args.rounds):
        for tag, d in variants:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--sf-dir", args.sf_dir, "--child", tag, d, *names],
                capture_output=True, text=True, cwd=REPO, timeout=1200,
            )
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("CHILD_RESULT ")]
            if proc.returncode != 0 or not line:
                print(f"round {r + 1} {tag}: CHILD FAILED\n"
                      + proc.stderr[-1500:])
                return 1
            rec = json.loads(line[0].split(" ", 1)[1])
            loads.append(rec["load1"])
            for n, secs in rec["times"].items():
                results.setdefault((n, tag), []).append(secs)
            print(f"round {r + 1} {tag:6s} total="
                  f"{sum(rec['times'].values()):7.2f} s "
                  f"load1={rec['load1']:.2f}", flush=True)
    print(f"\n{'query':34s} {'disk(min)':>10s} {'tmpfs(min)':>11s}  all")
    for n in names:
        d = results[(n, "disk")]
        t = results[(n, "tmpfs")]
        print(f"{n:34s} {min(d):10.3f} {min(t):11.3f}  "
              f"d={d} t={t}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
