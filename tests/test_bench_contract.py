"""The driver parses bench.py stdout as ONE JSON line with a fixed
shape — guard that contract (a malformed line would void the round's
BENCH record)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_valid_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",  # keep the guard fast
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_query_wall_time_total"
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert payload["queries"] and all(v >= 0 for v in payload["queries"].values())
    assert payload["sf"] == 0.001
