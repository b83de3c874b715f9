#!/usr/bin/env python
"""Isolated per-query measurement for optimization work (guide §1).

Times the named registered queries into the noop sink (median+min of
N runs, same methodology as bench.py) and optionally dumps
``explain("formatted")`` to a plans directory, so before/after evidence
for OPTIMIZATION_r*.md comes from one tool.

    python tools/measure_queries.py [--sf-dir D] [--runs N]
        [--plans-dir plans/r15 --suffix before] name [name ...]

Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_kafka_project_spark.registry import all_queries  # noqa: E402
from cdc_kafka_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--no-warm", action="store_true",
        help="skip the untimed warmup action per query",
    )
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1 (med/min need at least one run)")

    spark = get_spark("measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # one untimed warmup to absorb JVM/codegen/parquet-footer startup
    queries["q1_pricing_summary"](spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"measure: {name}")
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = queries[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        runs = []
        n_runs = args.runs + (0 if args.no_warm else 1)
        for i in range(n_runs):
            t0 = time.time()
            queries[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            if args.no_warm or i > 0:
                runs.append(dt)
        spark.catalog.clearCache()
        gc.collect()
        med = sorted(runs)[len(runs) // 2]
        out[name] = {"median": round(med, 3), "min": round(min(runs), 3),
                     "runs": [round(r, 3) for r in runs]}
        print(f"{name:36s} med={med:7.3f} min={min(runs):7.3f} "
              f"runs={[round(r, 2) for r in runs]}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
