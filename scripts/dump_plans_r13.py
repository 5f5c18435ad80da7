"""Dump .explain('formatted') output for named queries to
plans/r13/<query>_<tag>.txt — the round-12 optimization evidence files.

Usage: python scripts/dump_plans_r13.py <before|after> q1 q2 ...
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark(app_name="dump-plans-r13",
                        enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
