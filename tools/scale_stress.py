#!/usr/bin/env python
"""Scale-stress run (round-7 verdict item 4): time the most expensive
registered queries at a replica sf_dir ABOVE the driver's sf0.1 and
compare each query's physical-plan shape against sf0.1 — the cheapest
way to catch a scaling cliff (a broadcast flipping to sort-merge on
the dim side, a quadratic tier exploding, an OOM) that the
sf0.1 -> 100 TB extrapolation would paper over.

    python tools/scale_stress.py BIG_SF_DIR [BASE_SF_DIR] [--out FILE]
        [--only QUERY ...]

Protocol mirrors bench.py: materialized-index builds are an untimed
warmup pass (first run discarded), then each query is timed
median-of-3 on count().
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

#: the 10 most expensive BENCH_r07 queries + the adversarial-skew
#: fixture (verdict item 4's exact target set)
STRESS_QUERIES = [
    "similarity_semdedup_keep",
    "denormalized_order_lines",
    "dedup_levenshtein_verify",
    "similarity_ann_recall",
    "pagerank_brand_copurchase",
    "curation_pipeline",
    "bloom_semi_join_revenue",
    "price_qty_regression",
    "q5_region_revenue",
    "media_phash_dup_pairs",
    "skewed_salted_segment_revenue",
]


def _time_one(fn, spark, sf_dir, runs=3):
    times, rows = [], None
    for _ in range(runs):
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2], times[0], rows


def main() -> int:
    if len(sys.argv) < 2 or not os.path.isdir(sys.argv[1]):
        print(
            "usage: python tools/scale_stress.py BIG_SF_DIR [BASE_SF_DIR]"
            " [--out FILE] [--only QUERY ...]"
        )
        return 2
    big = sys.argv[1]
    base = (
        sys.argv[2]
        if len(sys.argv) > 2 and not sys.argv[2].startswith("--")
        else "/root/testdata/sf0.1"
    )
    out_path = None
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            print("error: --out requires a file argument")
            return 2
        out_path = sys.argv[i + 1]
    stress_queries = STRESS_QUERIES
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        names = [a for a in sys.argv[i + 1 :] if not a.startswith("--")]
        if not names:
            print("error: --only requires at least one query name")
            return 2
        stress_queries = names

    from cdc_kafka_project_spark.plans import plan_summary
    from cdc_kafka_project_spark.registry import all_queries
    from cdc_kafka_project_spark.session import get_spark

    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in stress_queries if n not in queries]
    if unknown:
        print(f"error: unknown query name(s): {', '.join(unknown)}")
        return 2

    lines = [
        "| query | base_s | big_med_s | big_min_s | ratio | rows(big) |"
        " plan shape base -> big |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in stress_queries:
        fn = queries[name]
        # untimed warmup on BOTH sides (symmetric protocol): builds
        # materialized indexes/models (bench.py's cold-build exclusion)
        # and warms the page cache, so the ratio compares steady states
        t0 = time.time()
        fn(spark, big).count()
        warm = time.time() - t0
        fn(spark, base).count()
        med_b, mn_b, rows_b = _time_one(fn, spark, big)
        med_s, mn_s, _ = _time_one(fn, spark, base)
        ps = plan_summary(fn(spark, base))
        pb = plan_summary(fn(spark, big))

        def shape(p):
            return (
                f"bhj={p['broadcast_joins']} smj={p['sort_merge_joins']}"
                f" exch={p['exchanges']} cart={'Y' if p['cartesian'] else 'n'}"
            )

        same = (
            ps["broadcast_joins"] == pb["broadcast_joins"]
            and ps["sort_merge_joins"] == pb["sort_merge_joins"]
            and ps["cartesian"] == pb["cartesian"]
        )
        mark = "SAME" if same else "CHANGED"
        ratio = med_b / med_s if med_s > 0 else float("inf")
        lines.append(
            f"| {name} | {med_s:.2f} | {med_b:.2f} | {mn_b:.2f} |"
            f" {ratio:.1f}x | {rows_b} | {mark}: {shape(ps)} ->"
            f" {shape(pb)} |"
        )
        print(
            f"{name}: base {med_s:.2f}s  big {med_b:.2f}s (min {mn_b:.2f},"
            f" warmup {warm:.1f})  x{ratio:.1f}  plans {mark}",
            flush=True,
        )

    md = "\n".join(lines)
    if out_path:
        with open(out_path, "w") as f:
            f.write(md + "\n")
    else:
        print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
