#!/usr/bin/env python
"""Alternating fresh-session A/B probe (the r13 span-family instrument,
committed as a script for round 14): runs ONE query in its own Spark
session per sample, alternating variant A and variant B sessions in time
so slow host modes land on both sides evenly.  Variants are selected via
an env var the query code reads (or via two git worktrees — pass the repo
dir as the variant).

Usage:
  python scripts/ab_probe.py <query> <n_pairs> <envvar> <valA> <valB> [out.json]

Each session: smoke warm-up at sf0.001, N_WARM warm-ups at $SPARK_GRAFT_SF_DIR,
then median of N_RUNS noop-sink timed runs (bench.py protocol).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, os.environ["AB_REPO"])
from etl_for_ecol_fusion_database_spark import registry
from etl_for_ecol_fusion_database_spark.session import get_spark

name = os.environ["AB_QUERY"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_warm = int(os.environ.get("AB_WARM", "3"))
n_runs = int(os.environ.get("AB_RUNS", "3"))
spark = get_spark("ab-probe")
spark.sparkContext.setLogLevel("ERROR")
fn = registry.QUERIES[name]

def mat(df):
    df.write.format("noop").mode("overwrite").save()

warm_dir = "/root/testdata/sf0.001"
if os.path.isdir(warm_dir) and warm_dir != sf_dir:
    mat(fn(spark, warm_dir))
for _ in range(n_warm):
    mat(fn(spark, sf_dir))
runs = []
for _ in range(n_runs):
    t0 = time.perf_counter()
    mat(fn(spark, sf_dir))
    runs.append(round(time.perf_counter() - t0, 3))
spark.stop()
print("AB_RESULT " + json.dumps(runs))
"""


def run_side(query: str, env_extra: dict) -> list[float]:
    env = dict(os.environ)
    env.update(env_extra)
    env["AB_REPO"] = REPO
    env["AB_QUERY"] = query
    out = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True, env=env
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(f"A/B child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    query = sys.argv[1]
    n_pairs = int(sys.argv[2])
    envvar = sys.argv[3]
    val_a, val_b = sys.argv[4], sys.argv[5]
    out_path = sys.argv[6] if len(sys.argv) > 6 else "/tmp/ab_probe.json"
    a_meds, b_meds, a_all, b_all = [], [], [], []
    for i in range(n_pairs):
        ra = run_side(query, {envvar: val_a})
        rb = run_side(query, {envvar: val_b})
        a_all.append(ra)
        b_all.append(rb)
        a_meds.append(statistics.median(ra))
        b_meds.append(statistics.median(rb))
        print(
            f"pair {i}: A({val_a}) med={a_meds[-1]:.3f} {ra}   "
            f"B({val_b}) med={b_meds[-1]:.3f} {rb}",
            flush=True,
        )
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    result = {
        "query": query,
        "envvar": envvar,
        "A": {"value": val_a, "session_medians": a_meds, "all_runs": a_all,
              "median": statistics.median(a_meds)},
        "B": {"value": val_b, "session_medians": b_meds, "all_runs": b_all,
              "median": statistics.median(b_meds)},
        "loadavg_end": load,
        "git": subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
        ).stdout.strip(),
        "git_dirty": bool(subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True
        ).stdout.strip()),
    }
    print(
        f"A({val_a}) median-of-medians {result['A']['median']:.3f}  "
        f"B({val_b}) {result['B']['median']:.3f}"
    )
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
