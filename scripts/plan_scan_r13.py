#!/usr/bin/env python
"""Registry-wide physical-plan shape scan for the r13 optimization pass.

For every registered query, plans (never executes) the DataFrame at
$SPARK_GRAFT_SF_DIR and counts the plan-shape signals the optimization
guide says to look for (§1.1/§7.2): parquet scans, Exchange nodes,
Python-boundary nodes, join strategies, and duplicated-subtree smells
(scan count >> distinct tables touched).  Writes JSON for the
OPTIMIZATION_r13.md checklist.

Usage: python scripts/plan_scan_r13.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PATTERNS = {
    "scans": r"Scan parquet",
    "exchanges": r"\bExchange\b",
    "reused_exchange": r"ReusedExchange",
    "sort_merge_join": r"SortMergeJoin",
    "broadcast_hash_join": r"BroadcastHashJoin",
    "shuffled_hash_join": r"ShuffledHashJoin",
    "bnl_join": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "batch_eval_python": r"BatchEvalPython",
    "arrow_eval_python": r"ArrowEvalPython",
    "map_in_pandas": r"MapInPandas|MapInArrow|FlatMapGroupsInPandas",
    "existing_rdd": r"Scan ExistingRDD",
    "window": r"\bWindow\b",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_scan_r13.json"
    from etl_for_ecol_fusion_database_spark import registry
    from etl_for_ecol_fusion_database_spark.session import get_spark

    spark = get_spark("plan-scan-r13")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name, fn in registry.QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
            row = {k: len(re.findall(p, txt)) for k, p in PATTERNS.items()}
            row["plan_lines"] = txt.count("\n")
            results[name] = row
        except Exception as e:  # noqa: BLE001 — scan must cover the rest
            results[name] = {"error": str(e)[:200]}
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    bad = sorted(
        (
            (r.get("scans", 0), n)
            for n, r in results.items()
            if "error" not in r
        ),
        reverse=True,
    )
    for s, n in bad[:25]:
        r = results[n]
        print(
            f"{n:32s} scans={s:3d} exch={r['exchanges']:3d} "
            f"smj={r['sort_merge_join']} py={r['batch_eval_python']}"
            f"/{r['arrow_eval_python']}/{r['map_in_pandas']} "
            f"lines={r['plan_lines']}"
        )
    errs = [n for n, r in results.items() if "error" in r]
    if errs:
        print("ERRORS:", errs)
    print(f"wrote {out_path} ({len(results)} queries)")


if __name__ == "__main__":
    main()
