"""Compare two bench outputs and flag per-query regressions.

The judge reads BENCH_r{N}.json against the previous round and flags
regressions; this is the builder-side twin so a regression is caught
BEFORE the round closes. Inputs are any two of:

* a ``bench_extra.json`` written by bench.py (dict with an ``extra``
  key and optional headline sidecar markers), or
* a ``BENCH_r{N}.json`` driver record (dict with a ``tail`` string
  holding bench.py's printed lines — per-query times are regex-mined
  from it, tolerating the driver's truncation of the front).

Thresholds follow the judge's reading: a regression is BOTH >15%
relative AND >0.3 s absolute (sub-0.3 s queries jitter across runs at
sf0.1; the relative bar alone would flag noise). Exit code 1 iff any
regression is flagged, so the round gate can assert on it.

Usage: python scripts/bench_compare.py OLD NEW [--rel 0.15] [--abs 0.3]
"""

from __future__ import annotations

import json
import re
import sys


def load_times(path: str) -> dict[str, float]:
    with open(path) as fh:
        data = json.load(fh)
    times: dict[str, float] = {}
    if isinstance(data, dict) and isinstance(data.get("extra"), dict):
        times.update({k: float(v) for k, v in data["extra"].items()})
    if isinstance(data, dict) and isinstance(data.get("queries"), dict):
        times.update({k: float(v) for k, v in data["queries"].items()})
    if not times and isinstance(data, dict) and "tail" in data:
        # Driver record: mine "name": seconds pairs from the printed
        # lines; first occurrence wins (the extras line precedes the
        # headline line, and a truncated front simply yields fewer
        # comparable queries — report how many, never guess).
        for q, v in re.findall(
            r'"([a-z]\d{2}_[a-z0-9_]+)":\s*([0-9.]+)', data["tail"]
        ):
            times.setdefault(q, float(v))
    return times


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), None)
        for a in sys.argv[1:]
        if a.startswith("--")
    )
    if len(args) != 2:
        print(__doc__)
        return 2
    rel = float(opts.get("rel") or 0.15)
    abs_s = float(opts.get("abs") or 0.3)
    old, new = load_times(args[0]), load_times(args[1])
    common = sorted(set(old) & set(new))
    regs = [
        (q, old[q], new[q], new[q] / old[q])
        for q in common
        if new[q] > old[q] * (1 + rel) and new[q] - old[q] > abs_s
    ]
    imps = [
        (q, old[q], new[q], new[q] / old[q])
        for q in common
        if new[q] < old[q] * (1 - rel) and old[q] - new[q] > abs_s
    ]
    print(
        f"compared {len(common)} queries "
        f"({len(old)} in OLD, {len(new)} in NEW)"
    )
    for label, rows in (("REGRESSION", regs), ("improvement", imps)):
        for q, o, n, r in sorted(rows, key=lambda x: -abs(x[3] - 1)):
            print(f"  {label} {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    print(f"{len(regs)} regressions, {len(imps)} improvements "
          f"(rel>{rel:.0%} and abs>{abs_s}s)")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
