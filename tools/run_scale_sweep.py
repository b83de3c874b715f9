#!/usr/bin/env python
"""One-command full-registry replica-scale sweep (round-11 verdict
item 4: the r10/r11 sweeps lived as ad-hoc shell pipelines logged in
/tmp — this makes the three-phase composition reproducible and the log
a committable artifact).

    python tools/run_scale_sweep.py SF_DIR [--log PATH] [--chunk N]
        [--probe default|a,b,...]

``--probe`` (r13) restricts the sweep to a heavy-family name list for
decade-up probes (the 1000x sf100 replica): every non-staged probe
name runs in the digest tier, staged names through the staged
checker. ``--probe default`` = HEAVY_PROBE_NAMES.

Phases (the composition the r11 sweep validated):

1. chunked FULL-HASH sweep over every oracle-backed name that is not
   digest-tiered, staged, or scale-excluded
   (``check_correctness.py --chunk N --skip ...``);
2. ``--digest`` sweep (exact rowcount + top-2000 ORDER-BY-prefix) for
   the output-heavy names whose full output would kill the chunk JVM
   at replica scale (DIGEST_NAMES — the 44-name list validated
   digest-green at sf0.01 in round 11);
3. ``check_staged_oracles.py`` for the four disk-bound twins whose
   single-statement DuckDB oracle out-spills the sandbox at 30x/100x.

Exclusions are a RECORDED, cap-checked surface (EXCLUDE_AT_FACTOR),
pinned in tests/test_registry_gate.py so they cannot silently widen:
only ``similarity_pairs_above`` — the exact all-pairs baseline tier,
O(n^2) COMPUTE on both engines by definition ("quadratic by
construction: at scale run it only on LSH candidates" — its own
docstring; the scale paths are the LSH/IVF/SemDeDup tiers, all
100x-verified). It stays IN the sweep through 10x (139 s green in
r11) and is excluded only at factor >= 30, where the oracle's
hundreds-of-billions-pair unnest exhausts DuckDB temp disk.

Replica factor convention (tools/make_scale_replica.py): replicas live
at spark-warehouse/scale/sf{F} and represent F/0.1 x the sf0.1 base —
sf1.0 = 10x, sf3.0 = 30x, sf10.0 = 100x.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

sys.path.insert(0, ".")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: output-heavy names verified digest-green at sf0.01 (r11 §4): full
#: toPandas() of their replica-scale output (millions of rows) OOMs
#: the chunk JVM, so they are compared by exact count + ordered prefix.
DIGEST_NAMES: tuple[str, ...] = (
    "asof_join_cogrouped", "asof_join_next_purchase", "asof_join_purchases",
    "asof_last_purchase", "cdc_incremental_scan", "cdc_json_decode",
    "cdc_json_encode", "cdc_scd2_history", "cdc_validate_valid",
    "cohort_ltv_curve", "customer_rfm_quantile_scores",
    "customer_rfm_segments", "date_exprs", "denormalized_order_lines",
    "doc_sliding_chunks", "doc_winnow_fingerprints", "event_props_extract",
    "event_props_typed", "feature_label_index", "feature_quantile_buckets",
    "gapfill_daily_revenue", "gapfill_linear_interp", "group_minmax_norm",
    "hopping_event_counts", "in_list_filter",
    # time-COMPRESSED replicas pack Kx incidents into the same 30-day
    # range, so the overlap OUTPUT is quadratic in the factor (118.8M
    # pairs at 100x — a fixture artifact; real 100x data spans ~100x
    # the time at constant density). Full-hash collect trips
    # spark.driver.maxResultSize; r11 verified it digest (41.6 s).
    "interval_incident_overlap_pairs",
    "ivm_join_delta_revenue",
    "lateral_topk_per_customer", "part_pareto_frontier",
    "purchase_click_attribution", "revenue_seasonality_decomp",
    "rolling_7d_user_spend", "rolling_median_revenue", "scalar_exprs",
    "semi_join_big_spenders", "session_stats", "session_window_native",
    "sessionize", "set_union_active_keys", "string_funcs",
    "text_tfidf_top_terms", "tumbling_hourly_agg",
    "unpivot_lineitem_measures", "window_running_sum",
    "window_topn_per_group",
)

#: names verified by tools/check_staged_oracles.py (single-statement
#: DuckDB oracle out-spills the sandbox disk at replica scale; the
#: staged twin is still DuckDB-computed from base parquet).
STAGED_NAMES: tuple[str, ...] = (
    "pagerank_brand_copurchase", "brand_copurchase_lift",
    "dedup_components", "dedup_near_keep",
    # r15: the exact-Jaccard names gained sharded staged oracles
    # (shingle-hash-range INSERTs bound DuckDB's live spill) so the
    # >=300x wall can be re-probed with the staged tier.
    "dedup_ngram_jaccard", "dedup_levenshtein_verify",
)

#: queries excluded from the sweep at or above a replica factor, with
#: the recorded rationale. This dict is the WHOLE exclusion surface —
#: pinned in tests/test_registry_gate.py so it cannot grow silently.
EXCLUDE_AT_FACTOR: dict[str, dict] = {
    "similarity_pairs_above": {
        "min_factor": 30,
        "rationale": (
            "exact all-pairs cosine baseline — O(n^2) compute on both "
            "engines by definition; verified full-hash at sf0.01/sf0.1 "
            "and green at the 10x replica (139 s, r11); at >=30x the "
            "oracle's pair unnest (250B rows at 100x) exhausts DuckDB "
            "temp disk. The scale paths for this semantics are the "
            "LSH/IVF/SemDeDup candidate tiers, all 100x-verified."
        ),
    },
    # r14: exact word-3-gram ground-truth family. The candidate-pair
    # intermediate (every doc pair sharing >=1 shingle) is an
    # irreducible rare-shingle long tail — measured at base: 1.13M
    # pair states / 2.79M join-fanout rows per 5k docs with max
    # shingle df 25 (no hot-shingle skew to cap). Linear in replica
    # count, but at 300x the ORACLE's string-shingle self-join
    # exceeded a 50GB DuckDB temp cap (46.5 GiB OOM, SWEEP_r14_300x)
    # even after the engine JVM was stopped to free the disk, and at
    # 1000x the ENGINE side also out-spills the sandbox (~55GB+,
    # twice, fresh JVMs, SWEEP_r14_1000x{,_b}). Verified tier: 100x
    # (SWEEP_r12_100x, both engines green). On a cluster this is
    # ~30GB of int64-pair shuffle — trivial across executors; the
    # sandbox-scale paths are dedup_minhash_lsh / dedup_simhash_pairs
    # (both 1000x digest-green).
    "dedup_ngram_jaccard": {
        "min_factor": 300,
        "rationale": (
            "exact shingle-pair ground-truth tier: the oracle's "
            "string-shingle self-join out-spills a 50GB temp cap at "
            ">=300x and the engine's candidate-pair aggregation "
            "out-spills the sandbox disk at 1000x (measured, r14); "
            "100x verified (SWEEP_r12_100x); scale path = "
            "dedup_minhash_lsh / dedup_simhash_pairs, 1000x-verified"
        ),
    },
    "dedup_levenshtein_verify": {
        "min_factor": 300,
        "rationale": (
            "edit-distance verify over the exact shingle-pair "
            "candidates — inherits dedup_ngram_jaccard's candidate "
            "generation on both engines (same measured walls, r14); "
            "100x verified (SWEEP_r12_100x)"
        ),
    },
    "dedup_components": {
        "min_factor": 300,
        "rationale": (
            "connected components over the exact shingle-pair graph — "
            "engine and recursive-CTE oracle both consume the "
            "dedup_ngram_jaccard pair computation (measured walls, "
            "r14); 100x verified (staged, SWEEP_r12_100x)"
        ),
    },
    "dedup_near_keep": {
        "min_factor": 300,
        "rationale": (
            "near-dedup keep policy over the exact shingle-pair graph "
            "— same candidate generation as dedup_components on both "
            "sides; 100x verified (staged, SWEEP_r12_100x)"
        ),
    },
    "pagerank_brand_copurchase": {
        "min_factor": 1000,
        "rationale": (
            "ENGINE side digest-complete at 1000x (600M-row lineitem "
            "pair graph, r14); the staged oracle's distinct "
            "(order, brand) temp table OOMed DuckDB's temp cap "
            "(37.2 GiB, SWEEP_r14_1000x_b); 100x verified (staged, "
            "SWEEP_r12_100x)"
        ),
    },
    "brand_copurchase_lift": {
        "min_factor": 1000,
        "rationale": (
            "ENGINE side digest-complete at 1000x; the staged "
            "oracle's basket self-join spilled the sandbox disk "
            "(SWEEP_r14_1000x_b); 100x verified (staged, "
            "SWEEP_r12_100x)"
        ),
    },
}

#: Names that move to the CONSTANT-DENSITY events fixture at factor >=
#: CD_MIN_FACTOR (r14, retiring the two r13 interval exclusions): the
#: standard replica time-COMPRESSES events (K-fold rows, same ~30-day
#: range), which inflates interval-join fan-out quadratically in K — a
#: fixture artifact, not an engine property (real Kx data spans ~Kx
#: the time at constant density). Below the threshold the compressed
#: fixture is the harsher and still-tractable test and these names run
#: in the normal tiers; at >= CD_MIN_FACTOR they run digest-tier
#: against the sibling `<sf_dir>_cd` fixture
#: (tools/make_cd_events_fixture.py — events time-disjoint per
#: replica, every other table symlinked). A missing CD fixture FAILS
#: the phase rather than silently skipping the names.
CD_FIXTURE_NAMES: tuple[str, ...] = (
    "interval_incident_event_stats", "interval_incident_overlap_pairs",
)
CD_MIN_FACTOR = 1000


#: The r13 1000x-probe composition (r12 verdict item 3): the ~20
#: heaviest names by family — dedup/simhash/semdedup, intervals,
#: graph, curation, plus the heaviest joins/text passes and the ANN
#: probe contracts. At 1000x EVERYTHING non-staged runs --digest
#: (exact count + top-2000 ORDER-BY prefix): several of these have
#: multi-million-row outputs at 100x already, and the digest tier is
#: what the verdict scoped for the decade-up probe.
HEAVY_PROBE_NAMES: tuple[str, ...] = (
    # dedup family
    "dedup_minhash_lsh", "dedup_simhash_pairs", "dedup_ngram_jaccard",
    "dedup_exact_groups", "dedup_levenshtein_verify", "doc_span_dedup",
    "dedup_incremental_new_docs",
    # staged graph/components tier
    "dedup_near_keep", "dedup_components",
    "pagerank_brand_copurchase", "brand_copurchase_lift",
    # semantic/similarity
    "similarity_semdedup_keep", "similarity_ann_lsh",
    "similarity_ann_ivf", "similarity_ann_pq", "similarity_ann_recall",
    # intervals (at >= CD_MIN_FACTOR both run on the constant-density
    # fixture — phase 4)
    "interval_incident_event_stats", "interval_incident_overlap_pairs",
    # graph recursion
    "recursive_brand_reachability",
    # curation / decontamination
    "curation_pipeline", "doc_decontaminate",
    # heavy text passes
    "bpe_merge_ranks", "text_tfidf_top_terms", "doc_winnow_fingerprints",
    # heavy joins / sessionization
    "denormalized_order_lines", "sessionize",
)


def replica_factor(sf_dir: str) -> float:
    """F/0.1 for a scale/sf{F} replica path; testdata sf paths map the
    same way (sf0.1 -> 1x base, sf0.01 -> 0.1x)."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) / 0.1 if m else 1.0


def scale_env(factor: float) -> dict[str, str]:
    """Environment for replica-scale children (r13, from the 1000x
    probe's denormalize diagnosis): at factor >= 300,

    * shuffle spill moves OFF /dev/shm — the tmpfs (50% RAM) fills
      under a 600M-row sort-merge shuffle and Spark dies on vanished
      shuffle files; node-local disk is the correct home for spill at
      this scale (exactly what SPARK_LOCAL_DIRS would be on a cluster);
    * shuffle partitions widen to 256 — 32 partitions put ~19M rows in
      one task's sort (heap OOM); AQE coalesces the excess at small SF;
    * driver heap grows to 28g — the single local JVM IS the cluster
      here; on a real deployment this is executor count, not heap.
    """
    env = dict(os.environ)
    if factor >= 300:
        env.setdefault(
            "SPARK_GRAFT_LOCAL_DIR",
            os.path.join(ROOT, "spark-warehouse", "spark_tmp"),
        )
        env.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")
        # r14: Spark retains every finished query's shuffle files
        # until the session stops, so at chunk 1 the checkers stop
        # the JVM once engine rows are collected — the DuckDB oracle
        # then gets the whole scratch disk instead of sharing it
        # with ~tens of GB of dead shuffle spill.
        env.setdefault("SWEEP_STOP_SPARK_BEFORE_ORACLE", "1")
    return env


def _run_cd_phase(
    names: list[str], cd_dir: str, chunk: str, log, env, py: str
) -> int:
    """Phase 4: the constant-density interval names against the
    sibling `<sf_dir>_cd` fixture (CD_FIXTURE_NAMES doc). Empty name
    list = factor below threshold or probe without them = clean skip;
    a MISSING fixture dir with names due is a phase FAILURE — never a
    silent skip."""
    if not names:
        return 0
    if not os.path.isdir(cd_dir):
        msg = (
            f"# PHASE4 FAIL: constant-density fixture missing at "
            f"{cd_dir} — build it with\n"
            f"#   python tools/make_cd_events_fixture.py "
            f"/root/testdata/sf0.1 <base_replica> {cd_dir} <K>\n"
        )
        print(msg, end="")
        log.write(msg)
        return 1
    return _run(
        [py, "tools/check_correctness.py", cd_dir, *names,
         "--chunk", chunk, "--digest"],
        log, env,
    )


def _run(cmd: list[str], log, env: dict[str, str] | None = None) -> int:
    print(f"\n$ {' '.join(cmd)}", flush=True)
    log.write(f"\n$ {' '.join(cmd)}\n")
    log.flush()
    p = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=ROOT, env=env,
    )
    assert p.stdout is not None
    for line in p.stdout:
        if re.match(r"^\[Stage|WARN", line.strip()):
            continue
        sys.stdout.write(line)
        log.write(line)
    p.wait()
    log.write(f"[exit {p.returncode}]\n")
    log.flush()
    return p.returncode


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    sf_dir = sys.argv[1]
    args = sys.argv[2:]
    chunk = "40"
    if "--chunk" in args:
        chunk = args[args.index("--chunk") + 1]
    probe: list[str] | None = None
    if "--probe" in args:
        # heavy-family probe mode (r13, the 1000x decade-up): restrict
        # the sweep to the given names (default HEAVY_PROBE_NAMES),
        # run every non-staged name in the digest tier, staged names
        # through the staged checker. '--probe default' uses the list.
        val = args[args.index("--probe") + 1]
        probe = list(HEAVY_PROBE_NAMES) if val == "default" else [
            n for n in val.split(",") if n
        ]
    factor = replica_factor(sf_dir)
    excluded = sorted(
        n for n, spec in EXCLUDE_AT_FACTOR.items()
        if factor >= spec["min_factor"]
    )
    cd_active = factor >= CD_MIN_FACTOR
    cd_dir = sf_dir.rstrip("/") + "_cd"
    tag = os.path.basename(sf_dir.rstrip("/"))
    log_path = os.path.join(ROOT, f"SWEEP_{tag}.log")
    if "--log" in args:
        log_path = args[args.index("--log") + 1]

    py = sys.executable
    with open(log_path, "w") as log:
        hdr = (
            f"# scale sweep @ {sf_dir} (factor {factor:g}x), "
            f"{time.strftime('%Y-%m-%d %H:%M:%S')}\n"
        )
        if probe is not None:
            pr_staged = [n for n in probe
                         if n in STAGED_NAMES and n not in excluded]
            pr_cd = [n for n in probe if n in CD_FIXTURE_NAMES] \
                if cd_active else []
            pr_digest = [n for n in probe
                         if n not in STAGED_NAMES and n not in excluded
                         and n not in pr_cd]
            pr_excluded = [n for n in probe if n in excluded]
            hdr += (
                f"# PROBE mode: {len(probe)} heavy-family names "
                f"({len(pr_digest)} digest + {len(pr_staged)} staged "
                f"+ {len(pr_cd)} constant-density @ {cd_dir}); "
                f"excluded at this factor: {pr_excluded or 'none'}\n"
            )
            # record factor-wide exclusions even when the name was
            # left out of the probe list — the WHY must be in the log
            for n in sorted(set(pr_excluded) | set(excluded)):
                hdr += f"#   {n}: {EXCLUDE_AT_FACTOR[n]['rationale']}\n"
            print(hdr, end="")
            log.write(hdr)
            env = scale_env(factor)
            rc1 = 0
            rc2 = 0
            if pr_digest:
                rc2 = _run(
                    [py, "tools/check_correctness.py", sf_dir, *pr_digest,
                     "--chunk", chunk, "--digest"],
                    log, env,
                )
            # r13 advisor (low): with an empty staged subset the staged
            # checker must be SKIPPED — invoking it with no name args
            # would fall back to running ALL staged oracles (the
            # heaviest queries), the opposite of a restricted probe.
            rc3 = 0
            if pr_staged:
                rc3 = _run(
                    [py, "tools/check_staged_oracles.py", sf_dir,
                     *pr_staged],
                    log, env,
                )
            rc4 = _run_cd_phase(pr_cd, cd_dir, chunk, log, env, py)
        else:
            hdr += (
                f"# digest tier: {len(DIGEST_NAMES)} names; staged: "
                f"{len(STAGED_NAMES)}; excluded at this factor: "
                f"{excluded or 'none'}\n"
            )
            for n in excluded:
                hdr += f"#   {n}: {EXCLUDE_AT_FACTOR[n]['rationale']}\n"
            print(hdr, end="")
            log.write(hdr)

            env = scale_env(factor)
            cd_names = list(CD_FIXTURE_NAMES) if cd_active else []
            skip = ",".join(
                sorted(DIGEST_NAMES + STAGED_NAMES) + excluded + cd_names
            )
            rc1 = _run(
                [py, "tools/check_correctness.py", sf_dir,
                 "--chunk", chunk, "--skip", skip],
                log, env,
            )
            digest_names = [n for n in DIGEST_NAMES
                            if n not in excluded and n not in cd_names]
            rc2 = _run(
                [py, "tools/check_correctness.py", sf_dir, *digest_names,
                 "--chunk", "20", "--digest"],
                log, env,
            )
            rc3 = _run([py, "tools/check_staged_oracles.py", sf_dir], log, env)
            rc4 = _run_cd_phase(cd_names, cd_dir, chunk, log, env, py)

        summary = (
            f"\n# PHASE1_RC={rc1} PHASE2_RC={rc2} PHASE3_RC={rc3} "
            f"PHASE4_CD_RC={rc4} excluded={excluded or 'none'}\n"
        )
        print(summary, end="")
        log.write(summary)
    print(f"# log: {log_path}")
    return 0 if rc1 == rc2 == rc3 == rc4 == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
