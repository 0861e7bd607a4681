#!/usr/bin/env python
"""Dump .explain('formatted') for the round-14 optimization targets.

Usage: python scripts/dump_plans_r14.py <suffix> [query ...]
Writes plans/r14/<query>_<suffix>.txt for each query (default: the
round-14 optimization target list).  sf dir from $SPARK_GRAFT_SF_DIR
(default sf0.1 — the bench scale, so plan shapes match the bench)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "x1_duplicated_spans",
    "x1_span_scrub",
    "x1_cdc_chunks",
    "x3_ngram_lm_score",
    "x9_curation_v4",
    "x9_curation_v3",
    "x1_minhash_accuracy",
    "x1_minhash_portable",
    "x1_minhash_near_dup",
    "x3_profile_sketch",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)

    from etl_for_ecol_fusion_database_spark import registry
    from etl_for_ecol_fusion_database_spark.session import get_spark

    spark = get_spark("plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
