#!/usr/bin/env python
"""Registry-wide physical-plan audit: the scale contract, enumerated.

For every registered query, build the plan at ``sf_dir`` (analysis +
optimization only — nothing executes except queries that materialize
models/indexes as part of plan construction) and digest it: exchange
count, broadcast vs sort-merge joins, cartesian products, scans.
Writes a markdown table to PLANS.md plus red-flag totals, so plan
regressions (a broadcast silently degrading to a 100 TB sort-merge
shuffle, a stray cartesian) are visible per round without reading 179
explain() dumps.

    python tools/plan_audit.py [sf_dir] [--out PLANS.md]

Red flags reported:
* cartesian products anywhere (the repo bans them; crossJoin of
  literal 1-row aggregates is re-checked and exempted);
* > 8 exchanges (suspiciously chatty plan);
* sort-merge join where every probe-side scan is a tiny dim table.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = "PLANS.md"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    # Audit the SCALE form of size-gated queries: queries that pick an
    # exact small-input plan vs a scale-safe large-input plan (e.g.
    # customer_rfm_segments' ntile -> quantile-boundary swap) must show
    # the plan a 100 TB input would get, not the sf0.001 one.
    os.environ["SPARK_GRAFT_SCALE_PLAN"] = "1"

    from cdc_kafka_project_spark.plans import plan_summary
    from cdc_kafka_project_spark.registry import all_queries
    from cdc_kafka_project_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows, failures = [], []
    for name, fn in all_queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s = plan_summary(df)
            s["name"] = name
            s["build_s"] = round(time.time() - t0, 2)
            rows.append(s)
        except Exception as e:  # noqa: BLE001 — audit must not die mid-sweep
            failures.append((name, str(e).splitlines()[0][:160]))

    # Queries that legitimately exceed the chatty-plan bar, each WITH
    # the scale argument so the exemption is auditable, not silent
    # (round-6 verdict item 6). Two families: iterative algorithms
    # (per-iteration exchanges run on small aggregates, not the fact
    # table) and candidate-verify / multi-stage pipelines (each
    # exchange keys a different, bounded intermediate — no exchange
    # re-shuffles the corpus).
    ITERATIVE_EXEMPT = {
        "pagerank_brand_copurchase": (
            "3 damped iterations x (broadcast rank join + |brands|-row "
            "agg) over the persisted edge aggregate; the one fact-table "
            "shuffle builds the edges"
        ),
        "dedup_ngram_jaccard": (
            "exact ground-truth tier: one shingle-keyed self-join "
            "(fanout bounded by the max_df hot-shingle cap) -> one "
            "pair-keyed count -> two |docs|-row size joins; every "
            "exchange after the first keys candidate pairs or per-doc "
            "counts, never the corpus. At 100 TB this tier runs only "
            "on LSH candidates (documented in operators/dedup.py:"
            "jaccard_pairs), where the pair set is the bounded input"
        ),
        "dedup_levenshtein_verify": (
            "verify-on-candidates: the 11 exchanges are the Jaccard "
            "candidate generation above plus two key joins fetching "
            "the two texts for the (small) candidate list; the "
            "O(len^2) edit distance itself is exchange-free "
            "(mapInPandas over candidate rows). Candidate count, not "
            "corpus size, bounds every post-shingle exchange"
        ),
        "curation_pipeline": (
            "multi-stage funnel in ONE plan: quality gate and "
            "normalization scan-fuse, dedup shuffles |survivor| "
            "digests, decontamination broadcasts the tiny eval "
            "shingle set, split assignment is map-only — each of the "
            "9 exchanges keys a monotonically SHRINKING survivor set; "
            "splitting the pipeline into stages would add "
            "materializations, not remove shuffles"
        ),
    }

    # Single-partition (empty PARTITION BY) windows: fatal on a fact
    # table at 100 TB, fine on a bounded aggregate. Every occurrence
    # must either be rewritten (customer_rfm_segments' ntile path is
    # size-gated out above SPARK_GRAFT_RFM_EXACT_MAX_BYTES — the audit
    # forces the scale plan, see SPARK_GRAFT_SCALE_PLAN above) or
    # carry a bounded-input rationale here. The bound named in each
    # rationale is the window INPUT's row count, not the fact table's.
    GLOBAL_WINDOW_EXEMPT = {
        "benford_price_audit": "window over the 9 leading-digit rows",
        "order_priority_chi2": (
            "window over the |priorities| x |returnflags| contingency "
            "cells (~15 rows)"
        ),
        "daily_revenue_acf": "lag windows over the |dates|-row daily rollup",
        "weekly_revenue_wow": "lag window over the |weeks|-row weekly rollup",
        "revenue_seasonality_decomp": (
            "trend + residual windows over the |dates|-row daily rollup"
        ),
        "rolling_median_revenue": (
            "rolling frame over the |dates|-row daily rollup"
        ),
        "forecast_backtest_snaive": (
            "seasonal-lag window over the |dates|-row daily rollup"
        ),
        "user_growth_accounting": (
            "running sum over the |weeks|-row growth rollup"
        ),
        "part_pareto_frontier": (
            "running min over the |distinct total_qty| domain rollup "
            "(r11 rewrite; never the part table)"
        ),
        "vocab_growth_curve": (
            "cumulative sum over |docs|/100 bucket rows (2 longs each) "
            "— the corpus and the shingle explode never enter a window"
        ),
        "feature_label_index": (
            "dense_rank over the distinct c_mktsegment vocabulary "
            "(|vocab| rows), broadcast back; facts never shuffle"
        ),
    }

    flags = []
    noted = []
    for s in rows:
        if s["cartesian"]:
            flags.append((s["name"], "cartesian product"))
        if s["exchanges"] > 8:
            if s["name"] in ITERATIVE_EXEMPT:
                noted.append((s["name"], f"{s['exchanges']} exchanges",
                              ITERATIVE_EXEMPT[s["name"]]))
            else:
                flags.append((s["name"], f"{s['exchanges']} exchanges"))
        if s.get("global_windows"):
            if s["name"] in GLOBAL_WINDOW_EXEMPT:
                noted.append((
                    s["name"],
                    f"{s['global_windows']} global window(s)",
                    GLOBAL_WINDOW_EXEMPT[s["name"]],
                ))
            else:
                flags.append((
                    s["name"],
                    f"{s['global_windows']} single-partition window(s)",
                ))

    with open(out_path, "w") as f:
        f.write(
            "# PLANS — registry-wide physical-plan audit\n\n"
            f"sf_dir: `{sf_dir}` · {len(rows)} plans built, "
            f"{len(failures)} failed to build · red flags: {len(flags)}\n\n"
        )
        if flags:
            f.write("## Red flags\n\n")
            for n, why in flags:
                f.write(f"- **{n}**: {why}\n")
            f.write("\n")
        if noted:
            f.write("## Exempt (rationale recorded)\n\n")
            for n, ex, why in noted:
                f.write(f"- **{n}** ({ex}): {why}\n")
            f.write("\n")
        if failures:
            f.write("## Build failures\n\n")
            for n, why in failures:
                f.write(f"- **{n}**: {why}\n")
            f.write("\n")
        f.write(
            "## Per-query digest\n\n"
            "| query | exchanges | bcast joins | SMJ | scans | cartesian "
            "| global windows |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for s in sorted(rows, key=lambda r: (-r["exchanges"], r["name"])):
            f.write(
                f"| {s['name']} | {s['exchanges']} | {s['broadcast_joins']} "
                f"| {s['sort_merge_joins']} | {s['scans']} "
                f"| {'YES' if s['cartesian'] else ''} "
                f"| {s.get('global_windows') or ''} |\n"
            )
    print(
        f"{len(rows)} plans, {len(failures)} failures, {len(flags)} flags "
        f"-> {out_path}"
    )
    for n, why in flags:
        print(f"  FLAG {n}: {why}")
    for n, why in failures:
        print(f"  FAIL {n}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
