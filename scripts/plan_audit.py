"""Round-12 optimization census: one row of plan-shape counters per
registered query, so the operator-by-operator audit (guide §1/§2/§7.2)
is systematic instead of anecdotal.

For every registry entry at the given sf_dir this builds the DataFrame
(no execution), reads the STATIC physical plan, and counts the nodes
that matter at 100 TB: shuffle exchanges, join strategies, Python
boundary nodes, duplicate file scans, Expand, global sorts. Output is a
TSV sorted by (shuffle count, scan duplication) so the outliers surface.

Usage: python scripts/plan_audit.py [sf_dir] [out_tsv]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamandbatchprocessing_spark.queries import QUERIES  # noqa: E402
from streamandbatchprocessing_spark.plans.explain import static_plan  # noqa: E402
from streamandbatchprocessing_spark.session import build_spark  # noqa: E402

COUNTERS = {
    "xchg": r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning|\bExchange SinglePartition",
    "bcast": r"\bBroadcastExchange\b",
    "smj": r"\bSortMergeJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "bhj": r"\bBroadcastHashJoin\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "cart": r"\bCartesianProduct\b",
    "py": r"\bBatchEvalPython\b|\bArrowEvalPython\b",
    "pymap": r"\bMapInPandas\b|\bPythonMapInArrow\b|\bFlatMapGroupsInPandas\b|\bMapInArrow\b",
    "expand": r"\bExpand\b",
    "sort": r"^\s*[+:\-\s]*\*?\(?\d*\)?\s*Sort\b",
    "window": r"\bWindow\b|\bRunningWindowFunction\b",
    "scan": r"\bFileScan parquet\b|\bScan parquet\b",
    "inmem": r"\bInMemoryTableScan\b",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r12_plan_audit.tsv"
    spark = build_spark(app_name="plan-audit", enable_fair_scheduler=False,
                        extra_conf={"spark.ui.enabled": "false"})
    rows = []
    names = list(QUERIES)
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = static_plan(df)
        except Exception as exc:  # noqa: BLE001
            rows.append((name, {"error": str(exc)[:120]}, 0.0))
            continue
        counts = {
            key: len(re.findall(pat, plan, flags=re.MULTILINE))
            for key, pat in COUNTERS.items()
        }
        # duplicate scans of the same fixture table inside one plan
        tables = re.findall(r"(\w+)\.parquet", plan)
        dup = sum(tables.count(t) - 1 for t in set(tables))
        counts["dupscan"] = dup
        rows.append((name, counts, time.perf_counter() - t0))
        print(f"[{i}/{len(names)}] {name}: {counts}", flush=True)
    keys = list(COUNTERS) + ["dupscan"]
    with open(out_path, "w") as fh:
        fh.write("query\tbuild_s\t" + "\t".join(keys) + "\n")
        for name, counts, secs in rows:
            if "error" in counts:
                fh.write(f"{name}\t{secs:.2f}\tERROR {counts['error']}\n")
                continue
            fh.write(
                f"{name}\t{secs:.2f}\t"
                + "\t".join(str(counts.get(k, 0)) for k in keys) + "\n"
            )
    print(f"wrote {out_path} ({len(rows)} queries)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
